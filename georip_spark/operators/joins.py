"""Cell-indexed spatial joins (SURVEY.md J2/J3/J4) and kNN (J12).

The reference's spatial matching is an O(tiles × regions) nested loop
of shapely calls (georip/geoprocessing/mapping.py:209-271,
georip/geoprocessing/utils.py:190-262). This engine replaces it with
the standard scale pattern:

    1. cover both sides with grid cells (pure column math / tiny UDF)
    2. equi-join on (cell [, year keys])      ← Spark plans this:
       broadcast when the dim side is small, sort-merge + AQE skew
       split otherwise
    3. de-duplicate candidate pairs WITHOUT a shuffle via the
       reference-point trick: a pair is kept only in the single cell
       containing the top-left corner of the two bboxes' overlap
    4. exact refinement with the numpy kernels in one Arrow batch UDF

Explicit salting for pathologically hot cells is available
(``salt=k``): the geometry side replicates k×, the tile side picks a
deterministic salt from xxhash64 — turning one hot cell into k evenly
sized join keys. Default leaves skew to AQE; salting is for the
dense-region workloads the north_rule calls out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from georip_spark.geo import cells
from georip_spark.operators import geom_udfs

DEFAULT_RES = 10  # cell ≈ 1024 CRS units — a couple of 640px/1.0-res tiles


def prepare_regions(regions: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Attach a stable row id, geometry stats, and the covering-cell
    array to a geometry table. Invalid/empty geometries keep
    is_valid=false so class encoding can Background them; they simply
    cover no cells. One pandas-UDF pass over the (small) dim side.
    """
    with_id = regions.withColumn(
        "geom_id",
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in regions.columns]),
    )
    stats = geom_udfs.geometry_stats(with_id, "geometry")
    covered = stats.withColumn(
        "cover",
        F.when(
            F.col("is_empty") | F.col("minx").isNull(),
            F.array().cast("array<long>"),
        ).otherwise(
            cells.cover_bbox_expr(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res
            )
        ),
    )
    return covered


def spatial_join_tiles_regions(
    tiles: DataFrame,
    regions_prepared: DataFrame,
    res: int = DEFAULT_RES,
    how: str = "inner",
    on_years: bool = True,
    clip: bool = True,
    salt: int | None = None,
    broadcast_regions: bool | None = None,
) -> DataFrame:
    """Join tile footprints (bbox columns minx/miny/maxx/maxy +
    region/start_year/end_year keys) against prepared region geometries.

    how:
      'inner'      matched (tile, region) pairs + exact intersection
      'left'       additionally keep unmatched tiles with
                   geometry='POLYGON EMPTY' (reference left-outer row,
                   georip/geoprocessing/mapping.py:263-265)
      'left_semi'  tiles that intersect ≥1 region (J4 keep-filter)
      'left_anti'  tiles that intersect none
    on_years: also equi-join on (region, start_year, end_year) — the
      J1/J3 year-span matching law.
    """
    g = regions_prepared.withColumnRenamed("minx", "g_minx") \
        .withColumnRenamed("miny", "g_miny") \
        .withColumnRenamed("maxx", "g_maxx") \
        .withColumnRenamed("maxy", "g_maxy")

    keys = ["region", "start_year", "end_year"] if on_years else []

    build = g.select(
        *keys, "geom_id", "class_name", "geometry",
        "g_minx", "g_miny", "g_maxx", "g_maxy", "is_valid", "area",
        F.explode("cover").alias("cell"),
    )

    probe = tiles.withColumn(
        "cell",
        F.explode(
            cells.cover_bbox_expr(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res
            )
        ),
    )

    join_keys = keys + ["cell"]
    if salt and salt > 1:
        build = build.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        probe = probe.withColumn(
            "_salt", F.pmod(F.xxhash64("media_ref"), F.lit(salt)).cast("int")
        )
        join_keys = join_keys + ["_salt"]

    if broadcast_regions:
        build = F.broadcast(build)

    cand = probe.join(build, on=join_keys, how="inner")

    # Reference-point dedup: keep the pair only in the cell that holds
    # the top-left corner of the bbox intersection → exactly-once per
    # pair with zero shuffle (vs dropDuplicates, which would shuffle
    # every candidate row).
    rp_x = F.greatest(F.col("minx"), F.col("g_minx"))
    rp_y = F.greatest(F.col("miny"), F.col("g_miny"))
    cand = cand.filter(F.col("cell") == cells.cell_expr(rp_x, rp_y, res))

    # Exact refinement — one Arrow batch over surviving candidates.
    cand = cand.filter(
        geom_udfs.rect_intersects(
            F.col("geometry"), F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
        )
    )

    tile_cols = [c for c in tiles.columns]

    if how == "left_semi":
        # distinct tile keys that matched (media_ref is the tile pk)
        matched = cand.select("media_ref").distinct()
        return tiles.join(matched, "media_ref", "left_semi")
    if how == "left_anti":
        matched = cand.select("media_ref").distinct()
        return tiles.join(matched, "media_ref", "left_anti")

    out = cand.select(
        *tile_cols, "geom_id", "class_name", "geometry", "is_valid", "area"
    )
    if clip:
        out = out.withColumn(
            "clipped",
            geom_udfs.clip_to_rect(
                F.col("geometry"), F.col("minx"), F.col("miny"),
                F.col("maxx"), F.col("maxy"),
            ),
        )
    if how == "left":
        unmatched = tiles.join(
            cand.select("media_ref").distinct(), "media_ref", "left_anti"
        )
        for c, t in (("geom_id", "long"), ("class_name", "string"),
                     ("geometry", "string"), ("is_valid", "boolean"),
                     ("area", "double")):
            unmatched = unmatched.withColumn(c, F.lit(None).cast(t))
        unmatched = unmatched.withColumn("geometry", F.lit("POLYGON EMPTY"))
        if clip:
            unmatched = unmatched.withColumn("clipped", F.lit("POLYGON EMPTY"))
        out = out.unionByName(unmatched)
    return out


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    res: int = DEFAULT_RES,
    ring: int = 1,
    left_xy: tuple[str, str] = ("cx", "cy"),
    right_xy: tuple[str, str] = ("fx", "fy"),
    left_key: str = "media_ref",
    right_key: str = "geom_id",
) -> DataFrame:
    """k nearest right-rows for every left-row (SURVEY.md J12 — the
    north_rule's kNN between tile centroids and labeled features).

    Candidate generation: the left point's cell plus its grid_disk of
    radius ``ring`` (column-math sequence×sequence, no UDF), equi-join
    on cell, exact Euclidean distance, ``row_number() ≤ k`` per left
    key. Left rows whose neighborhood came up short of k fall back to
    a brute-force pass against the whole right side — correct always,
    cheap when the fallback set is tiny (ring chosen so that it is).

    Correct-by-construction caveat handled: a neighbor within
    ``ring·cell_size`` of the point is always inside the disk, so the
    top-k is exact whenever the k-th true neighbor is within that
    distance; the fallback covers the rest.
    """
    lx, ly = (F.col(c) for c in left_xy)
    rx, ry = (F.col(c) for c in right_xy)

    r_cells = right.withColumn("cell", cells.cell_expr(rx, ry, res))

    dx = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dx")
    probe = left.select("*", dx)
    dy = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dy")
    probe = probe.select("*", dy)
    s = float(cells.cell_size(res))
    probe = probe.withColumn(
        "cell",
        cells.cell_expr(lx + F.col("dx") * F.lit(s), ly + F.col("dy") * F.lit(s), res),
    ).drop("dx", "dy")

    cand = probe.join(r_cells.drop(*[c for c in left.columns if c in r_cells.columns]),
                      "cell", "inner").drop("cell")

    dist = F.sqrt((lx - rx) * (lx - rx) + (ly - ry) * (ly - ry))
    cand = cand.withColumn("dist", dist)

    from pyspark.sql.window import Window

    # deterministic tie-break on the right key so reruns and different
    # parallelism levels pick identical neighbors (W1 ordering law)
    order = [F.col("dist").asc(), F.col(right_key).asc()]
    w = Window.partitionBy(left_key).orderBy(*order)
    ranked = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)

    # fallback: left rows whose disk produced < k candidates get a
    # brute-force pass (small by construction — choose `ring` so the
    # typical neighborhood holds ≥ k features)
    counts = ranked.groupBy(left_key).agg(F.count("*").alias("_n"))
    sated = counts.filter(F.col("_n") >= k).select(left_key)
    short = left.join(sated, left_key, "left_anti")
    full = short.crossJoin(
        F.broadcast(right.drop(*[c for c in left.columns if c in right.columns]))
    )
    full = full.withColumn("dist", dist)
    fw = Window.partitionBy(left_key).orderBy(*order)
    full_ranked = full.withColumn("rn", F.row_number().over(fw)).filter(F.col("rn") <= k)

    keep = ranked.join(sated, left_key, "left_semi")
    return keep.unionByName(full_ranked, allowMissingColumns=True)
