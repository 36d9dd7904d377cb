"""Deterministic synthetic data generators (seed-driven, Spark-native).

Everything is pure column math over ``spark.range`` — no driver-side
loops, no ``rand()`` (xxhash64-derived uniforms instead), so the same
generator is reproducible at any parallelism level and any SF, and at
bench scale generation itself is distributed.

Shapes mirror FIXTURES.md:
- rasters: one row per doc; axis-aligned affine, width/height ≤ 4096
  (reference window cap, georip/geoprocessing/utils.py:431), tile_size
  ∈ {320, 640} (default_config.yaml:70 + notebook CHIP_SIZE).
- regions: per-doc truth polygons incl. Treatment/Background classes,
  out-of-set class names, sparse slivers, empty and invalid (bowtie)
  geometries, and MultiPolygons.
- skew: region ids are drawn with a power-law so one region owns a
  large share of docs, and each region's rasters overlap spatially —
  dense cells exist by construction (north_rule salting/AQE must
  actually matter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from georip_spark import functions as GF

SEED = 42
_BIG = 1 << 30


def _fanout_partitions(spark: SparkSession, n_docs: int) -> int:
    """Partition count for the generator fan-out: ≥1 wave of tasks,
    up to 4 waves when the input is big enough that each slice still
    holds ≥~500 docs (a few seconds of downstream explode+clip work).
    Explicit (user) repartitions are exempt from AQE coalescing, which
    otherwise funnels these few-MB pre-fan-out shuffles into one task."""
    par = spark.sparkContext.defaultParallelism
    return max(par, min(4 * par, (n_docs + 499) // 500))


def _u(col, tag: int):
    """Deterministic uniform [0,1) from a column + tag."""
    return (F.pmod(F.xxhash64(col, F.lit(SEED), F.lit(tag)), F.lit(_BIG)) / F.lit(_BIG))


def synth_rasters(
    spark: SparkSession,
    n_docs: int,
    n_regions: int | None = None,
    zipf_s: float = 3.0,
) -> DataFrame:
    """One raster-metadata row per doc. Region assignment is
    power-law-skewed (u^zipf_s → mass near region 0 = the dense
    region); rasters of a region share a spatial neighborhood so their
    tiles collide in grid cells."""
    if n_regions is None:
        n_regions = max(4, n_docs // 8)
    df = spark.range(n_docs)
    rid = F.floor(_u(F.col("id"), 1) ** zipf_s * n_regions).cast("int")
    df = df.withColumn("region_id", rid)
    df = df.withColumn("region", F.concat(F.lit("Region"), F.col("region_id").cast("string")))

    # within-region ordinal → unique (region, years) per doc: the
    # reference's one-raster-per-(region, year-pair) law. One shuffle
    # at generation time only.
    from pyspark.sql.window import Window

    # Pre-partition the window exchange explicitly: left to AQE, this
    # few-MB shuffle coalesces to ONE partition and the window (plus
    # everything Catalyst collapses into its stage) runs as a 2-3s
    # single-task stage on the critical path of EVERY action over the
    # generated table — a fixed serial term that caps N→4N scaling. A
    # user repartition is exempt from AQE coalescing and already
    # satisfies the window's hashpartitioning(region_id) requirement,
    # so no second exchange is added.
    df = df.repartition(_fanout_partitions(spark, n_docs), "region_id")
    w = Window.partitionBy("region_id").orderBy("id")
    df = df.withColumn("ord", F.row_number().over(w))
    df = df.withColumn("start_year", (F.lit(2019) + F.col("ord") - 1).cast("int"))
    df = df.withColumn("end_year", (F.col("start_year") + 1).cast("int"))

    # ~10% Expanded naming variant (region ending in 'E',
    # georip/geoprocessing/utils.py:88-90)
    df = df.withColumn(
        "region",
        F.when(_u(F.col("id"), 2) < 0.1, F.concat(F.col("region"), F.lit("E"))).otherwise(
            F.col("region")
        ),
    )
    df = df.withColumn(
        "doc_id", GF.build_doc_id(F.col("region"), F.col("start_year"), F.col("end_year"))
    )

    # raster geometry: sizes in [1280, 4096], tiles 320/640, stride
    # full or half (overlapping-tile variant)
    df = df.withColumn("width", (F.lit(1280) + F.floor(_u(F.col("id"), 3) * 12) * 256).cast("int"))
    df = df.withColumn("height", (F.lit(1280) + F.floor(_u(F.col("id"), 4) * 12) * 256).cast("int"))
    df = df.withColumn("tile_size", F.when(_u(F.col("id"), 5) < 0.5, 320).otherwise(640))
    df = df.withColumn(
        "stride",
        F.when(_u(F.col("id"), 6) < 0.2, (F.col("tile_size") / 2).cast("int")).otherwise(
            F.col("tile_size")
        ),
    )

    # axis-aligned north-up affine; pixel size 1 or 10; origins cluster
    # per region (dense region ⇒ overlapping extents ⇒ hot cells)
    px = F.when(_u(F.col("id"), 7) < 0.8, F.lit(1.0)).otherwise(F.lit(10.0))
    base_x = (F.col("region_id") % 64).cast("double") * 50000.0
    base_y = F.floor(F.col("region_id") / 64).cast("double") * 50000.0
    jitter_x = _u(F.col("id"), 8) * 8000.0
    jitter_y = _u(F.col("id"), 9) * 8000.0
    df = df.withColumn("px_size", px)
    df = df.withColumn(
        "transform",
        F.struct(
            F.col("px_size").alias("a"),
            F.lit(0.0).alias("b"),
            (base_x + jitter_x).alias("c"),
            F.lit(0.0).alias("d"),
            (-F.col("px_size")).alias("e"),
            (base_y + jitter_y).alias("f"),
        ),
    )
    df = df.withColumn(
        "crs", F.when(_u(F.col("id"), 10) < 0.5, "EPSG:32610").otherwise("EPSG:32611")
    )
    df = df.withColumn("nodata", F.lit(-9999.0))
    out = df.select(
        "doc_id", "region", "region_id", "start_year", "end_year",
        "width", "height", "tile_size", "stride", "transform", "crs", "nodata",
    )
    # Explicit fan-out after the tiny window shuffle: AQE coalesces a
    # few-MB shuffle down to ONE partition, and every downstream
    # explode (tiles ×100, covers ×4) then runs single-threaded —
    # observed as a 15s serial stage dominating the pipeline's
    # critical path. A user repartition is exempt from AQE coalescing.
    # Up to 4× cores: the downstream tile/cover explode + clip stage
    # runs ~1-3s per 500-doc slice, so 4 waves of finer tasks pack the
    # cores far better than one wave of huge ones (measured 78% → ~95%
    # stage utilization at local[16]) — but capped by input size so a
    # small run doesn't shatter into sub-batch tasks whose Arrow
    # round-trip overhead dominates (128 partitions of 31 docs tripled
    # the SF=0.1 pipeline time).
    return out.repartition(_fanout_partitions(spark, n_docs), "doc_id")


def synth_regions(
    spark: SparkSession,
    rasters: DataFrame,
    polys_per_doc: int = 3,
) -> DataFrame:
    """Truth polygons per (region, years): rectangles, triangles,
    MultiPolygons, slivers, empties and invalid bowties placed inside
    (and slightly beyond) the raster extent. WKT built with
    format_string — JVM-side."""
    r = rasters.withColumn(
        "poly_i", F.explode(F.sequence(F.lit(0), F.lit(polys_per_doc - 1)))
    )
    key = F.xxhash64("doc_id", F.lit(SEED), "poly_i")
    u = lambda tag: (F.pmod(F.xxhash64(key, F.lit(tag)), F.lit(_BIG)) / F.lit(_BIG))  # noqa: E731

    t = F.col("transform")
    ext_w = F.col("width").cast("double") * t["a"]
    ext_h = F.col("height").cast("double") * (-t["e"])
    # extent: x ∈ [c, c+w·a], y ∈ [f−h·|e|, f]
    x0 = t["c"] + u(1) * ext_w * 0.9
    y0 = (t["f"] - ext_h) + u(2) * ext_h * 0.9
    w = (u(3) * 0.25 + 0.02) * ext_w
    h = (u(4) * 0.25 + 0.02) * ext_h
    x1, y1 = x0 + w, y0 + h

    shape_u = u(5)
    n = lambda c: F.format_string("%.6f", c)  # noqa: E731
    rect = F.format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        n(x0), n(y0), n(x1), n(y0), n(x1), n(y1), n(x0), n(y1), n(x0), n(y0),
    )
    tri = F.format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s))",
        n(x0), n(y0), n(x1), n(y0), n(x0), n(y1), n(x0), n(y0),
    )
    multi = F.format_string(
        "MULTIPOLYGON (((%s %s, %s %s, %s %s, %s %s, %s %s)), ((%s %s, %s %s, %s %s, %s %s)))",
        n(x0), n(y0), n(x1), n(y0), n(x1), n(y1), n(x0), n(y1), n(x0), n(y0),
        n(x1 + w * 0.2), n(y1 + h * 0.2), n(x1 + w * 0.6), n(y1 + h * 0.2),
        n(x1 + w * 0.2), n(y1 + h * 0.6), n(x1 + w * 0.2), n(y1 + h * 0.2),
    )
    sliver = F.format_string(  # aspect ≫ 10 → sparse (P3)
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        n(x0), n(y0), n(x1), n(y0), n(x1), n(y0 + h * 0.001),
        n(x0), n(y0 + h * 0.001), n(x0), n(y0),
    )
    bowtie = F.format_string(  # self-intersecting → invalid
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        n(x0), n(y0), n(x1), n(y1), n(x1), n(y0), n(x0), n(y1), n(x0), n(y0),
    )
    geometry = (
        F.when(shape_u < 0.02, F.lit("POLYGON EMPTY"))
        .when(shape_u < 0.05, bowtie)
        .when(shape_u < 0.10, sliver)
        .when(shape_u < 0.20, multi)
        .when(shape_u < 0.55, rect)
        .otherwise(tri)
    )

    cls_u = u(6)
    class_name = (
        F.when(cls_u < 0.65, F.lit("Treatment"))
        .when(cls_u < 0.80, F.lit("Background"))
        .when(cls_u < 0.90, F.lit("Water"))       # out-of-set → class filter P4
        .otherwise(F.lit("Urban"))
    )

    # ~10% year-mismatched rows that match no raster (anti-join food)
    start = F.when(u(7) < 0.1, F.lit(1999)).otherwise(F.col("start_year"))
    end = F.when(u(7) < 0.1, F.lit(2000)).otherwise(F.col("end_year"))

    return r.select(
        F.col("region"),
        start.cast("int").alias("start_year"),
        end.cast("int").alias("end_year"),
        class_name.alias("class_name"),
        geometry.alias("geometry"),
    )


def synth_docs(spark: SparkSession, rasters: DataFrame) -> DataFrame:
    """Input docs: media spans only — one span per tile in the
    reference loop order, offset = row-major ordinal. (The engine's
    output docs add the computed text spans; see pipeline.py.)"""
    from georip_spark.operators.tiling import tile_grid

    tiles = tile_grid(rasters, with_footprint=False)
    spans = tiles.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ordinal").alias("offset"),
                    F.col("media_ref"),
                )
            )
        ).alias("_s")
    )
    return spans.select(
        "doc_id",
        F.transform(
            "_s",
            lambda s: F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
