"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship geospatial pipeline on
sf0.001. ``queries()`` exposes one callable per implemented operator
family (SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each. Geospatial inputs are derived *deterministically* from
the driver's parquet tables with arithmetic both engines compute
identically (integer %, floor, IEEE doubles), so the DuckDB oracle
can verify the engine's spatial operators with plain SQL.

Column-name/type parity: every computed column is aliased identically
on both sides; integral outputs are cast to long/BIGINT, money sums
go through DECIMAL(18,6) before rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_DEFAULT = "/root/testdata/sf0.001"

# cell-index constants (georip_spark.geo.cells): id = res*2^58 + (ix+OFF)*2^29 + (iy+OFF)
_OFF = 268435456          # 2^28
_SH29 = 536870912         # 2^29
_SH58 = 288230376151711744  # 2^58


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------
# deterministic geospatial derivations (mirrored in the oracle SQL)
# ---------------------------------------------------------------------

def _rasters_from_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part rows → raster metadata (doc_id naming law, axis-aligned
    affine). All arithmetic is integer %, floor and double mults that
    DuckDB reproduces bit-for-bit."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.concat(F.lit("Part"), F.col("p_partkey").cast("string"),
                 F.lit("_2019to2020_NDVI_Difference")).alias("doc_id"),
        (F.lit(256) + (F.col("p_partkey") % 8) * 128).cast("int").alias("width"),
        (F.lit(256) + (F.col("p_size") % 8) * 128).cast("int").alias("height"),
        F.lit(128).cast("int").alias("tile_size"),
        F.when(F.col("p_partkey") % 5 == 0, 64).otherwise(128).cast("int").alias("stride"),
        F.struct(
            F.lit(1.0).alias("a"), F.lit(0.0).alias("b"),
            ((F.col("p_partkey") % 64) * 5000.0).alias("c"),
            F.lit(0.0).alias("d"), F.lit(-1.0).alias("e"),
            (F.floor(F.col("p_partkey") / 64) * 5000.0).alias("f"),
        ).alias("transform"),
    )


_RASTERS_SQL = """
    SELECT 'Part' || p_partkey || '_2019to2020_NDVI_Difference' AS doc_id,
           CAST(256 + (p_partkey % 8) * 128 AS BIGINT)  AS width,
           CAST(256 + (p_size % 8) * 128 AS BIGINT)     AS height,
           CAST(128 AS BIGINT)                          AS tile_size,
           CAST(CASE WHEN p_partkey % 5 = 0 THEN 64 ELSE 128 END AS BIGINT) AS stride,
           (p_partkey % 64) * 5000.0                    AS tc,
           CAST(FLOOR(p_partkey / 64) AS BIGINT) * 5000.0 AS tf
    FROM part
"""


def _points_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ((F.col("event_id") * 37) % 5000).cast("double").alias("ex"),
        ((F.col("user_id") * 53) % 5000).cast("double").alias("ey"),
    )


_POINTS_SQL = """
    SELECT event_id,
           CAST((event_id * 37) % 5000 AS DOUBLE) AS ex,
           CAST((user_id * 53) % 5000 AS DOUBLE)  AS ey
    FROM events
"""


def _rects_from_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 577) % 4000).cast("double").alias("rminx"),
        ((F.col("s_suppkey") * 991) % 4000).cast("double").alias("rminy"),
        (((F.col("s_suppkey") * 577) % 4000) + 300 + (F.col("s_suppkey") % 7) * 150)
        .cast("double").alias("rmaxx"),
        (((F.col("s_suppkey") * 991) % 4000) + 300 + (F.col("s_suppkey") % 5) * 150)
        .cast("double").alias("rmaxy"),
    )


_RECTS_SQL = """
    SELECT s_suppkey,
           CAST((s_suppkey * 577) % 4000 AS DOUBLE) AS rminx,
           CAST((s_suppkey * 991) % 4000 AS DOUBLE) AS rminy,
           CAST((s_suppkey * 577) % 4000 + 300 + (s_suppkey % 7) * 150 AS DOUBLE) AS rmaxx,
           CAST((s_suppkey * 991) % 4000 + 300 + (s_suppkey % 5) * 150 AS DOUBLE) AS rmaxy
    FROM supplier
"""


def _supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 577) % 4000).cast("double").alias("sx"),
        ((F.col("s_suppkey") * 991) % 4000).cast("double").alias("sy"),
    )


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4-family hash aggregation with partial+final combine (TPC-H
    Q1 shape). Money math in DECIMAL for cross-engine exactness."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - dec("l_discount")))
                      .cast("decimal(18,6)")), 2
            ).cast("double").alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return g


_Q01_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
                (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J7-family multi-way equi-join with broadcast dims (P1 filter
    pushdown). nation/region are broadcast by Catalyst (< threshold)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("o_orderstatus") != "F")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum(dec), 2).cast("double").alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


_Q02_SQL = """
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus <> 'F'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
"""


def q03_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: count + countDistinct + min/max per group."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4).cast("double").alias("sum_value"),
            F.round(F.min("value"), 6).cast("double").alias("min_value"),
            F.round(F.max("value"), 6).cast("double").alias("max_value"),
        )
        .orderBy("event_type")
    )


_Q03_SQL = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value,
           CAST(ROUND(MIN(value), 6) AS DOUBLE) AS min_value,
           CAST(ROUND(MAX(value), 6) AS DOUBLE) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


def q04_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: dropDuplicates on a column subset (exact dedup)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderstatus")
        .dropDuplicates()
        .groupBy("o_orderstatus")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("o_orderstatus")
    )


_Q04_SQL = """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q05_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: first-match-wins consumption via deterministic row_number
    (the reference drops matched rows from its pool,
    georip/geoprocessing/mapping.py:143-188)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


_Q05_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
    WHERE rn = 1 ORDER BY o_custkey
"""


def q06_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3 + W5: top-3 per group with deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
    )


_Q06_SQL = """
    SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank, o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank FROM orders)
    WHERE rank <= 3 ORDER BY o_orderpriority, rank
"""


def q07_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5: union + intersect + except (symmetric difference of
    high-value and urgent orders)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    ur = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    both = hi.intersect(ur)
    return hi.union(ur).distinct().exceptAll(both).orderBy("o_orderkey")


_Q07_SQL = """
    WITH hi AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000),
         ur AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT o_orderkey FROM (SELECT * FROM hi UNION SELECT * FROM ur)
    EXCEPT ALL
    SELECT o_orderkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM ur)
    ORDER BY o_orderkey
"""


def q08_class_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6/F13: distinct class names → contiguous ids (the class-map
    builder, get_mapped_classes semantics minus the Background=-1
    special which q-pipeline tests cover)."""
    e = _t(spark, sf_dir, "events")
    w = Window.orderBy("event_type")
    return (
        e.select("event_type").distinct()
        .withColumn("class_id", (F.row_number().over(w) - 1).cast("long"))
        .orderBy("event_type")
    )


_Q08_SQL = """
    SELECT event_type,
           CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS class_id
    FROM (SELECT DISTINCT event_type FROM events) ORDER BY event_type
"""


def q09_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: the tiling operator — reference loop semantics (stride
    steps, clamped edge tiles, row-major ordinals, pixel-offset tile
    ids) as explode(sequence) column math.

    CONTRACT: result rows are UNORDERED; row identity and row-major
    order are carried by the `ordinal` column. Consumers must compare
    order-insensitively (the driver's sorted-hash does;
    tests/run_oracle_check.py sorts)."""
    from georip_spark.operators.tiling import tile_grid

    rasters = _rasters_from_part(spark, sf_dir)
    return tile_grid(rasters).select(
        "doc_id", "media_ref",
        F.col("tile_row").cast("long").alias("tile_row"),
        F.col("tile_col").cast("long").alias("tile_col"),
        F.col("tile_w").cast("long").alias("tile_w"),
        F.col("tile_h").cast("long").alias("tile_h"),
        F.col("ordinal").cast("long").alias("ordinal"),
        "minx", "miny", "maxx", "maxy",
        # UNSORTED output: row-major order is CARRIED by `ordinal`,
        # and a global sort of a pure enumeration is the plan you'd
        # never run at 10^12 tiles — its range-partitioner sampling
        # re-executes the whole fan-out stage (measured 2.34s → 0.315s
        # at sf0.1 dropping it, round 5). Round 6 drops the
        # partition-local sort too: it added a full comparison pass
        # over every fan-out row for presentation only. The driver
        # compare is order-insensitive (sorted-hash).
    )


_Q09_SQL = f"""
    WITH r AS ({_RASTERS_SQL}),
    g1 AS (SELECT *, unnest(generate_series(0, height - 1, stride)) AS tile_row FROM r),
    g2 AS (SELECT *, unnest(generate_series(0, width - 1, stride)) AS tile_col FROM g1)
    SELECT doc_id,
           doc_id || '_tile_' || tile_row || '_' || tile_col AS media_ref,
           tile_row, tile_col,
           CASE WHEN tile_size < width - tile_col THEN tile_size ELSE width - tile_col END AS tile_w,
           CASE WHEN tile_size < height - tile_row THEN tile_size ELSE height - tile_row END AS tile_h,
           (tile_row // stride) * ((width + stride - 1) // stride) + (tile_col // stride) AS ordinal,
           tc + tile_col * 1.0 AS minx,
           tf - (tile_row + (CASE WHEN tile_size < height - tile_row THEN tile_size ELSE height - tile_row END)) * 1.0 AS miny,
           tc + (tile_col + (CASE WHEN tile_size < width - tile_col THEN tile_size ELSE width - tile_col END)) * 1.0 AS maxx,
           tf - tile_row * 1.0 AS maxy
    FROM g2 ORDER BY doc_id, ordinal
"""


def q10_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J5: the cell-indexed point-in-polygon join — event points vs
    supplier rectangles through the real spatial-join operator
    (cover cells → equi-join → reference-point dedup → exact numpy
    refinement). Oracle is a plain range-predicate join.

    CONTRACT: result rows are UNORDERED; pair identity is the
    (event_id, s_suppkey) columns themselves. Consumers must compare
    order-insensitively."""
    from georip_spark.operators.joins import prepare_regions, spatial_join_tiles_regions

    pts = _points_from_events(spark, sf_dir).select(
        F.col("event_id").cast("string").alias("media_ref"),
        F.col("ex").alias("minx"), F.col("ey").alias("miny"),
        F.col("ex").alias("maxx"), F.col("ey").alias("maxy"),
    )
    rects = _rects_from_supplier(spark, sf_dir).select(
        "s_suppkey",
        F.format_string(
            "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
            "rminx", "rminy", "rmaxx", "rminy", "rmaxx", "rmaxy",
            "rminx", "rmaxy", "rminx", "rminy",
        ).alias("geometry"),
    )
    # res=12 (cell 256): candidates/probe scale as density·(rect+cell)²,
    # and the sf1.0 A/B read res11 5.1s / res12 4.1s / res13 4.1s /
    # res14 4.9s (OPTIMIZATION_r06.md) — res only changes candidate
    # generation, never the joined row set (row count verified equal)
    prepared = prepare_regions(rects, res=12)
    joined = spatial_join_tiles_regions(
        pts, prepared, res=12, how="inner", on_years=False, clip=False,
        broadcast_regions=True,
        # the regions are axis-aligned rects, so the JVM bbox
        # prefilter IS the exact intersects test — skip the Arrow
        # refinement stage entirely (caller knowledge, same rows)
        refine=False,
    )
    return joined.select(
        F.col("media_ref").cast("long").alias("event_id"), "s_suppkey"
        # UNSORTED, same rationale as q09: pair identity is the
        # (event_id, s_suppkey) columns; the round-5 partition-local
        # sort was a full extra pass over ~180M pairs at sf1.0 for
        # presentation only (measured ~4.1s → 3.2s dropping it)
    )


_Q10_SQL = f"""
    WITH p AS ({_POINTS_SQL}), r AS ({_RECTS_SQL})
    SELECT event_id, s_suppkey
    FROM p JOIN r ON ex BETWEEN rminx AND rmaxx AND ey BETWEEN rminy AND rmaxy
    ORDER BY event_id, s_suppkey
"""


def q11_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: kNN via grid-disk candidate rings + windowed top-k with
    brute-force fallback. k=3 nearest supplier points per event.

    CONTRACT: result rows are UNORDERED across partitions; neighbor
    order is carried by the `rank` column (1..k per event_id).
    Consumers must compare order-insensitively."""
    from georip_spark.operators.joins import knn_join

    # deterministic 1/5 sample keeps the candidate+fallback volume sane
    # at every SF while exercising the full operator (oracle mirrors it)
    left = _points_from_events(spark, sf_dir).filter(F.col("event_id") % 5 == 0)
    right = _supplier_points(spark, sf_dir)
    res = knn_join(
        left, right, k=3, res=12, ring=1,
        left_xy=("ex", "ey"), right_xy=("sx", "sy"),
        left_key="event_id", right_key="s_suppkey",
    )
    return res.select(
        "event_id", "s_suppkey",
        F.round("dist", 6).alias("dist"),
        F.col("rn").cast("long").alias("rank"),
        # per-partition sort, same rationale as q09: neighbor order is
        # CARRIED by `rank`; a global sort re-executes the kNN's last
        # stage for range sampling
    ).sortWithinPartitions("event_id", "rank")


_Q11_SQL = f"""
    WITH p0 AS ({_POINTS_SQL}),
    p AS (SELECT * FROM p0 WHERE event_id % 5 = 0),
    s AS (SELECT s_suppkey,
                 CAST((s_suppkey * 577) % 4000 AS DOUBLE) AS sx,
                 CAST((s_suppkey * 991) % 4000 AS DOUBLE) AS sy
          FROM supplier),
    d AS (SELECT event_id, s_suppkey,
                 sqrt((ex - sx) * (ex - sx) + (ey - sy) * (ey - sy)) AS dist
          FROM p, s),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                 ORDER BY dist, s_suppkey) AS rn FROM d)
    SELECT event_id, s_suppkey, ROUND(dist, 6) AS dist, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 3 ORDER BY event_id, rank
"""


def q12_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-index assignment (the H3-like packing) as pure column
    math, aggregated per cell — the skew-visibility query."""
    from georip_spark.geo.cells import cell_expr

    pts = _points_from_events(spark, sf_dir)
    return (
        pts.select(cell_expr(F.col("ex"), F.col("ey"), 10))
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("cell")
    )


_Q12_SQL = f"""
    WITH p AS ({_POINTS_SQL})
    SELECT CAST(10 * {_SH58} + (CAST(FLOOR(ex / 1024.0) AS BIGINT) + {_OFF}) * {_SH29}
                + CAST(FLOOR(ey / 1024.0) AS BIGINT) + {_OFF} AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY 1 ORDER BY cell
"""


def q13_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5 fingerprint groups over documents."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("fingerprint"))
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .orderBy("fingerprint")
    )


_Q13_SQL = """
    SELECT md5(text) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM documents GROUP BY 1 ORDER BY fingerprint
"""


def q14_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: length / token count / punctuation
    density per document (training-data pipeline op)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), "[^.,!?;:]", "")).cast("long").alias("n_punct"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", ""))).cast("long").alias("n_spaces"),
    ).orderBy("doc_id")


_Q14_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
           CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) AS BIGINT) AS n_spaces
    FROM documents ORDER BY doc_id
"""


def q15_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search over the embeddings
    table (ANN baseline). Query vector = embedding of vec_id 0.
    Scores rounded to 4 before ranking so float32-accumulation noise
    can't flip ranks between engines; ties broken by vec_id."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(dot, 4).alias("score"))
    )
    # pre-shrink BEFORE the rank window (round 6): orderBy().limit(20)
    # plans as TakeOrderedAndProject — each partition keeps its local
    # top-20 and only those reach the driver-side merge — where the
    # old global row_number() window funneled EVERY scored row through
    # one partition. (score desc, vec_id) is a total order (vec_id
    # unique), so the kept rows and their ranks are identical.
    top = scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(20)
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "score")
        .orderBy("rank")
    )


_Q15_SQL = """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT vec_id,
               ROUND(list_sum(list_transform(list_zip(embedding, qv),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 4) AS score
        FROM embeddings, q WHERE vec_id <> 0
    )
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, score FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, vec_id ASC) AS rank FROM scored
    ) WHERE rank <= 20 ORDER BY rank
"""


# ---------------------------------------------------------------------
# q16-q25: splits, dedup, text, similarity operators
# ---------------------------------------------------------------------

def q16_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/W5: per-class ratio split with seeded-hash ordering."""
    from georip_spark.operators.splits import stratified_split

    o = _t(spark, sf_dir, "orders")
    split = stratified_split(o, "o_orderpriority", "o_orderkey", 0.7, 0.15)
    return (
        split.groupBy("o_orderpriority", "type")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("o_orderpriority", "type")
    )


_Q16_SQL = """
    WITH s AS (
        SELECT o_orderpriority,
               CASE WHEN rn * 1.0 / cnt <= 0.7 THEN 'train'
                    WHEN rn * 1.0 / cnt <= 0.85 THEN 'val'
                    ELSE 'test' END AS type
        FROM (SELECT o_orderpriority,
                     row_number() OVER (PARTITION BY o_orderpriority
                         ORDER BY md5(o_orderkey || '#42'), o_orderkey) AS rn,
                     count(*) OVER (PARTITION BY o_orderpriority) AS cnt
              FROM orders)
    )
    SELECT o_orderpriority, type, CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def q17_alternating_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: cross-split duplicate resolution with alternating sides."""
    from georip_spark.operators.splits import alternating_dedup_pairs

    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    return alternating_dedup_pairs(a, b, "o_custkey").orderBy("o_custkey")


_Q17_SQL = """
    WITH dup AS (
        SELECT o_custkey FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0)
        INTERSECT
        SELECT o_custkey FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1)
    )
    SELECT o_custkey,
           CASE WHEN row_number() OVER (ORDER BY o_custkey) % 2 = 1 THEN 'a' ELSE 'b' END AS removed_from
    FROM dup ORDER BY o_custkey
"""


def q18_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/O3: n = min(|background|, ratio*|truth|) seeded sample
    (background = BUILDING segment, ratio = 0.5)."""
    from georip_spark.operators.splits import shuffle_key

    c = _t(spark, sf_dir, "customer")
    bg = c.filter(F.col("c_mktsegment") == "BUILDING")
    counts = c.agg(
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("n_bg"),
        F.sum(F.when(F.col("c_mktsegment") != "BUILDING", 1).otherwise(0)).alias("n_truth"),
    )
    from pyspark.sql.window import Window as W

    ranked = bg.withColumn(
        "rn", F.row_number().over(
            W.orderBy(shuffle_key(F.col("c_custkey")), "c_custkey")
        )
    )
    return (
        ranked.crossJoin(F.broadcast(counts))
        .filter(F.col("rn") <= F.least(F.col("n_bg"), F.floor(0.5 * F.col("n_truth"))))
        .select("c_custkey")
        .orderBy("c_custkey")
    )


_Q18_SQL = """
    WITH lims AS (
        SELECT SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS n_bg,
               SUM(CASE WHEN c_mktsegment <> 'BUILDING' THEN 1 ELSE 0 END) AS n_truth
        FROM customer),
    ranked AS (
        SELECT c_custkey, row_number() OVER (ORDER BY md5(c_custkey || '#42'), c_custkey) AS rn
        FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT c_custkey FROM ranked, lims
    WHERE rn <= LEAST(n_bg, FLOOR(0.5 * n_truth)) ORDER BY c_custkey
"""


def q19_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle → minhash → band →
    bucket self-join). Pure column math; oracle recomputes the same
    portable polynomial hashes in SQL."""
    from georip_spark.operators.dedup import minhash_candidate_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_candidate_pairs(d, "doc_id", "text")
        .select(F.col("id_a").cast("long").alias("id_a"),
                F.col("id_b").cast("long").alias("id_b"))
        .orderBy("id_a", "id_b")
    )


_Q19_SQL = "\n    WITH codes AS (SELECT doc_id, list_transform(generate_series(0, greatest(length(text) - 8, 0), 4), i -> (CAST(unicode(substr(substr(text, i + 1, 8), 1, 1)) AS BIGINT) * 1 + CAST(unicode(substr(substr(text, i + 1, 8), 2, 1)) AS BIGINT) * 31 + CAST(unicode(substr(substr(text, i + 1, 8), 3, 1)) AS BIGINT) * 961 + CAST(unicode(substr(substr(text, i + 1, 8), 4, 1)) AS BIGINT) * 29791 + CAST(unicode(substr(substr(text, i + 1, 8), 5, 1)) AS BIGINT) * 923521 + CAST(unicode(substr(substr(text, i + 1, 8), 6, 1)) AS BIGINT) * 28629151 + CAST(unicode(substr(substr(text, i + 1, 8), 7, 1)) AS BIGINT) * 887503681 + CAST(unicode(substr(substr(text, i + 1, 8), 8, 1)) AS BIGINT) * 27512614111) % 2147483647) AS cs FROM documents),\n    sigs AS (SELECT doc_id, [list_min(list_transform(cs, c -> (c * 3 + 1) % 2147483647)), list_min(list_transform(cs, c -> (c * 5 + 6) % 2147483647)), list_min(list_transform(cs, c -> (c * 7 + 11) % 2147483647)), list_min(list_transform(cs, c -> (c * 9 + 16) % 2147483647)), list_min(list_transform(cs, c -> (c * 11 + 21) % 2147483647)), list_min(list_transform(cs, c -> (c * 13 + 26) % 2147483647)), list_min(list_transform(cs, c -> (c * 15 + 31) % 2147483647)), list_min(list_transform(cs, c -> (c * 17 + 36) % 2147483647)), list_min(list_transform(cs, c -> (c * 19 + 41) % 2147483647)), list_min(list_transform(cs, c -> (c * 21 + 46) % 2147483647)), list_min(list_transform(cs, c -> (c * 23 + 51) % 2147483647)), list_min(list_transform(cs, c -> (c * 25 + 56) % 2147483647)), list_min(list_transform(cs, c -> (c * 27 + 61) % 2147483647)), list_min(list_transform(cs, c -> (c * 29 + 66) % 2147483647)), list_min(list_transform(cs, c -> (c * 31 + 71) % 2147483647)), list_min(list_transform(cs, c -> (c * 33 + 76) % 2147483647))] AS sig FROM codes),\n    bands AS (SELECT doc_id, unnest(['0' || '_' || sig[1] || '_' || sig[2] || '_' || sig[3] || '_' || sig[4], '1' || '_' || sig[5] || '_' || sig[6] || '_' || sig[7] || '_' || sig[8], '2' || '_' || sig[9] || '_' || sig[10] || '_' || sig[11] || '_' || sig[12], '3' || '_' || sig[13] || '_' || sig[14] || '_' || sig[15] || '_' || sig[16]]) AS band FROM sigs)\n    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b\n    FROM bands a JOIN bands b USING (band)\n    WHERE a.doc_id < b.doc_id\n    GROUP BY 1, 2 ORDER BY 1, 2\n"


def q20_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard for consecutive doc pairs."""
    from georip_spark.operators.dedup import jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(
        F.col("doc_id").cast("long").alias("id_a"),
        (F.col("doc_id") + 1).cast("long").alias("id_b"),
    ).join(
        d.select(F.col("doc_id").cast("long").alias("id_b")), "id_b", "left_semi"
    )
    return (
        jaccard_pairs(d.withColumn("doc_id", F.col("doc_id").cast("long")),
                      "doc_id", "text", pairs)
        .orderBy("id_a")
    )


_Q20_SQL = '\n    WITH codes AS (SELECT doc_id, list_distinct(list_transform(generate_series(0, greatest(length(text) - 8, 0), 4), i -> (CAST(unicode(substr(substr(text, i + 1, 8), 1, 1)) AS BIGINT) * 1 + CAST(unicode(substr(substr(text, i + 1, 8), 2, 1)) AS BIGINT) * 31 + CAST(unicode(substr(substr(text, i + 1, 8), 3, 1)) AS BIGINT) * 961 + CAST(unicode(substr(substr(text, i + 1, 8), 4, 1)) AS BIGINT) * 29791 + CAST(unicode(substr(substr(text, i + 1, 8), 5, 1)) AS BIGINT) * 923521 + CAST(unicode(substr(substr(text, i + 1, 8), 6, 1)) AS BIGINT) * 28629151 + CAST(unicode(substr(substr(text, i + 1, 8), 7, 1)) AS BIGINT) * 887503681 + CAST(unicode(substr(substr(text, i + 1, 8), 8, 1)) AS BIGINT) * 27512614111) % 2147483647)) AS cs FROM documents)\n    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,\n           ROUND(len(list_intersect(a.cs, b.cs)) * 1.0 /\n                 len(list_distinct(list_concat(a.cs, b.cs))), 6) AS jaccard\n    FROM codes a JOIN codes b ON b.doc_id = a.doc_id + 1\n    ORDER BY id_a\n'


def q21_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (token bit votes)."""
    from georip_spark.operators.dedup import simhash_df

    d = _t(spark, sf_dir, "documents")
    return (
        simhash_df(d, "doc_id", "text", bits=16)
        .select(F.col("_id").cast("long").alias("doc_id"), "simhash")
        .orderBy("doc_id")
    )


_Q21_SQL = "\n    WITH toks AS (SELECT doc_id,\n            list_transform(list_filter(string_split(text, ' '), t -> length(t) > 0),\n                           t -> ((CASE WHEN length(t) > 0 THEN CAST(unicode(substr(t, 1, 1)) AS BIGINT) ELSE 0 END) * 1 + (CASE WHEN length(t) > 1 THEN CAST(unicode(substr(t, 2, 1)) AS BIGINT) ELSE 0 END) * 31 + (CASE WHEN length(t) > 2 THEN CAST(unicode(substr(t, 3, 1)) AS BIGINT) ELSE 0 END) * 961 + (CASE WHEN length(t) > 3 THEN CAST(unicode(substr(t, 4, 1)) AS BIGINT) ELSE 0 END) * 29791 + (CASE WHEN length(t) > 4 THEN CAST(unicode(substr(t, 5, 1)) AS BIGINT) ELSE 0 END) * 923521 + (CASE WHEN length(t) > 5 THEN CAST(unicode(substr(t, 6, 1)) AS BIGINT) ELSE 0 END) * 28629151 + (CASE WHEN length(t) > 6 THEN CAST(unicode(substr(t, 7, 1)) AS BIGINT) ELSE 0 END) * 887503681 + (CASE WHEN length(t) > 7 THEN CAST(unicode(substr(t, 8, 1)) AS BIGINT) ELSE 0 END) * 27512614111) % 2147483647) AS tcs\n        FROM documents)\n    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST((CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 1) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 2) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 2 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 4) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 4 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 8) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 8 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 16) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 16 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 32) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 32 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 64) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 64 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 128) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 128 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 256) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 256 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 512) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 512 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 1024) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1024 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 2048) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 2048 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 4096) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 4096 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 8192) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 8192 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 16384) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 16384 ELSE 0 END) + (CASE WHEN list_sum(list_transform(tcs, c -> CASE WHEN (c // 32768) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 32768 ELSE 0 END) AS BIGINT) AS simhash\n    FROM toks ORDER BY doc_id\n"


def q22_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker hit argmax."""
    from georip_spark.operators.text import predict_lang

    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        predict_lang(F.col("text")).alias("predicted"),
    ).orderBy("doc_id")


_Q22_SQL = "\n    WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),\n    sc AS (SELECT doc_id, lang, (length(p) - length(replace(p, ' der ', ''))) // 5 + (length(p) - length(replace(p, ' und ', ''))) // 5 + (length(p) - length(replace(p, ' die ', ''))) // 5 + (length(p) - length(replace(p, ' ist ', ''))) // 5 AS s_de, (length(p) - length(replace(p, ' the ', ''))) // 5 + (length(p) - length(replace(p, ' and ', ''))) // 5 + (length(p) - length(replace(p, ' of ', ''))) // 4 + (length(p) - length(replace(p, ' is ', ''))) // 4 AS s_en, (length(p) - length(replace(p, ' el ', ''))) // 4 + (length(p) - length(replace(p, ' de ', ''))) // 4 + (length(p) - length(replace(p, ' que ', ''))) // 5 + (length(p) - length(replace(p, ' es ', ''))) // 4 AS s_es, (length(p) - length(replace(p, ' le ', ''))) // 4 + (length(p) - length(replace(p, ' la ', ''))) // 4 + (length(p) - length(replace(p, ' et ', ''))) // 4 + (length(p) - length(replace(p, ' est ', ''))) // 5 AS s_fr, (length(p) - length(replace(p, '的', ''))) // 1 + (length(p) - length(replace(p, '是', ''))) // 1 + (length(p) - length(replace(p, '了', ''))) // 1 + (length(p) - length(replace(p, '在', ''))) // 1 AS s_zh FROM p)\n    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CASE WHEN s_zh > GREATEST(GREATEST(GREATEST(GREATEST(0, s_de), s_en), s_es), s_fr) THEN 'zh' ELSE CASE WHEN s_fr > GREATEST(GREATEST(GREATEST(0, s_de), s_en), s_es) THEN 'fr' ELSE CASE WHEN s_es > GREATEST(GREATEST(0, s_de), s_en) THEN 'es' ELSE CASE WHEN s_en > GREATEST(0, s_de) THEN 'en' ELSE CASE WHEN s_de > 0 THEN 'de' ELSE 'und' END END END END END AS predicted\n    FROM sc ORDER BY doc_id\n"


def q23_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/alpha/punctuation heuristic in [0,1]."""
    from georip_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


_Q23_SQL = "\n    SELECT CAST(doc_id AS BIGINT) AS doc_id,\n           ROUND(LEAST(length(text) / 200.0, 1.0)\n                 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / GREATEST(length(text), 1))\n                 * (1.0 - LEAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0\n                                / GREATEST(length(text), 1) * 10.0, 1.0) * 0.5), 6) AS quality\n    FROM documents ORDER BY doc_id\n"


def q24_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: 8-plane LSH bucket join + exact
    verification within buckets. All math on integer-quantized
    components (floor(v·10⁴+0.5)), and the output carries the EXACT
    long columns (dot_q, na2_q, nb2_q) rather than a derived double
    cosine — round-2's last red hash cell was Spark's BigDecimal vs
    DuckDB's float ROUND differing in the final ULP on boundary
    values; integers hash bit-identically everywhere. cosine =
    dot_q/√(na2_q·nb2_q) is recoverable by any consumer."""
    from georip_spark.operators.similarity import lsh_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return (
        lsh_neardup_pairs(
            e, "vec_id", "embedding", threshold=-1.0, n_planes=8, exact_cols=True
        )
        .orderBy("id_a", "id_b")
    )


def _q24_sql() -> str:
    # mirrors similarity.quantize / hyperplane_signature / int_dot:
    # sig bit p = sign of Σ q_i·h_p[i], h_p[i] = ±1 from two Lehmer
    # steps of seed (p·1009 + i·9176 + p·i·31 + 1) mod 65521 (the
    # round-5 plane family — see hyperplane_signature docstring);
    # hot-bucket sub-split on vec_id % ceil(bucket_count/1000)
    planes = " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(qe, generate_series(0, 63)), "
        f"x -> CAST(x[1] AS BIGINT) * (CASE WHEN (((({p * 1009} + x[2] * 9176 + x[2] * {31 * p} + 1) % 65521) * 48271) % 2147483647 * 48271) % 2147483647 < 1073741824 THEN 1 ELSE -1 END))) > 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(8)
    )
    return f"""
    WITH q AS (SELECT vec_id,
            list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qe
        FROM embeddings),
    sigs AS (SELECT vec_id, qe, CAST({planes} AS BIGINT) AS sig FROM q),
    sigs2 AS (SELECT *, COUNT(*) OVER (PARTITION BY sig) AS bc FROM sigs),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                         x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS BIGINT) AS dot_q,
               CAST(list_sum(list_transform(a.qe, v -> v * v)) AS BIGINT) AS na2_q,
               CAST(list_sum(list_transform(b.qe, v -> v * v)) AS BIGINT) AS nb2_q
        FROM sigs2 a JOIN sigs2 b ON a.sig = b.sig
             AND a.vec_id % GREATEST(1, CAST(CEIL(a.bc / 1000.0) AS BIGINT))
               = b.vec_id % GREATEST(1, CAST(CEIL(a.bc / 1000.0) AS BIGINT))
        WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, dot_q, na2_q, nb2_q FROM pairs ORDER BY id_a, id_b
"""


_Q24_SQL = _q24_sql()


def q25_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprint."""
    from georip_spark.operators.text import rolling_fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        rolling_fingerprint(F.col("text")).alias("fingerprint"),
    ).orderBy("doc_id")


_Q25_SQL = '\n    SELECT CAST(doc_id AS BIGINT) AS doc_id,\n           list_min(list_transform(generate_series(0, greatest(length(text) - 16, 0), 8),\n               i -> (CAST(unicode(substr(text, i + 1 + 0, 1)) AS BIGINT) * 1 + CAST(unicode(substr(text, i + 1 + 2, 1)) AS BIGINT) * 31 + CAST(unicode(substr(text, i + 1 + 4, 1)) AS BIGINT) * 961 + CAST(unicode(substr(text, i + 1 + 6, 1)) AS BIGINT) * 29791 + CAST(unicode(substr(text, i + 1 + 8, 1)) AS BIGINT) * 923521 + CAST(unicode(substr(text, i + 1 + 10, 1)) AS BIGINT) * 28629151 + CAST(unicode(substr(text, i + 1 + 12, 1)) AS BIGINT) * 887503681 + CAST(unicode(substr(text, i + 1 + 14, 1)) AS BIGINT) * 27512614111) % 2147483647)) AS fingerprint\n    FROM documents ORDER BY doc_id\n'


def q26_payload_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/A8/F12: min-max payload normalization with nodata handling —
    per-doc stats of the normalized synthetic payload. Payload values
    are pure arithmetic on (doc key, pixel index) so the oracle
    regenerates them in SQL."""
    from georip_spark.operators.rastervec import normalize_payload_pandas

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    p2 = p.select(
        "p_partkey",
        F.expr(
            "transform(sequence(0, 255), i -> CASE WHEN pmod(p_partkey * 7 + i * 13, 97) < 5 "
            "THEN CAST(-9999.0 AS DOUBLE) "
            "ELSE CAST(pmod(p_partkey * 2654435761 + i * 40503, 1048576) / 1048576.0 * 2.0 - 1.0 AS DOUBLE) END)"
        ).alias("payload"),
    )
    normed = p2.select(
        "p_partkey",
        normalize_payload_pandas(F.col("payload"), F.lit(-9999.0)).alias("norm"),
    )
    return normed.select(
        "p_partkey",
        F.round(F.array_min(F.filter("norm", lambda v: v.isNotNull())), 6).alias("norm_min"),
        F.round(F.array_max(F.filter("norm", lambda v: v.isNotNull())), 6).alias("norm_max"),
        F.round(
            F.aggregate(
                F.filter("norm", lambda v: v.isNotNull()),
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double"),
            ), 4
        ).alias("norm_sum"),
        F.size(F.filter("norm", lambda v: v.isNull())).cast("long").alias("n_nodata"),
    ).orderBy("p_partkey")


_Q26_SQL = """
    WITH p AS (SELECT p_partkey FROM part WHERE p_partkey % 20 = 0),
    pay AS (SELECT p_partkey,
            list_transform(generate_series(0, 255), i ->
                CASE WHEN (p_partkey * 7 + i * 13) % 97 < 5 THEN CAST(-9999.0 AS DOUBLE)
                     ELSE CAST((p_partkey * 2654435761 + i * 40503) % 1048576 / 1048576.0 * 2.0 - 1.0 AS DOUBLE) END
            ) AS payload FROM p),
    st AS (SELECT p_partkey, payload,
                  list_min(list_filter(payload, v -> v <> -9999.0)) AS lo,
                  list_max(list_filter(payload, v -> v <> -9999.0)) AS hi
           FROM pay),
    nm AS (SELECT p_partkey,
                  list_transform(list_filter(payload, v -> v <> -9999.0),
                                 v -> CASE WHEN hi = lo THEN 0.0 ELSE (v - lo) / (hi - lo) END) AS norm,
                  len(list_filter(payload, v -> v = -9999.0)) AS n_nodata
           FROM st)
    SELECT p_partkey,
           ROUND(list_min(norm), 6) AS norm_min,
           ROUND(list_max(norm), 6) AS norm_max,
           ROUND(list_sum(norm), 4) AS norm_sum,
           CAST(n_nodata AS BIGINT) AS n_nodata
    FROM nm ORDER BY p_partkey
"""


def q27_vectorize_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R2 vectorize: above-threshold region polygons per payload.
    The tracing itself (connected components + boundary walk) is
    non-SQL, but its AREA is checkable: exact rectilinear rings on
    pixel boundaries ⇒ polygon area (shells − holes) == count of
    above-threshold pixels, which DuckDB recomputes from the same
    deterministic payload — so the oracle catches any ring-tracing,
    hole-handling or area-kernel bug that changes covered pixels."""
    from georip_spark.operators.rastervec import vectorize_payload
    from georip_spark.operators import geom_udfs

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    p2 = p.select(
        "p_partkey",
        F.expr(
            "transform(sequence(0, 255), i -> "
            "CAST(pmod(p_partkey * 2654435761 + i * 40503, 1048576) / 1048576.0 AS FLOAT))"
        ).alias("payload"),
    )
    vec = p2.select(
        "p_partkey",
        vectorize_payload(F.col("payload"), F.lit(16), F.lit(0.5)).alias("geometry"),
    )
    stats = geom_udfs.geometry_stats(vec, "geometry")
    return stats.select(
        "p_partkey",
        F.round("area", 2).alias("area"),
        F.col("is_empty"),
    ).orderBy("p_partkey")


_Q27_SQL = """
    WITH p AS (SELECT p_partkey FROM part WHERE p_partkey % 50 = 0),
    c AS (SELECT p_partkey,
            list_sum(list_transform(generate_series(0, 255), i ->
                CASE WHEN (p_partkey * 2654435761 + i * 40503) % 1048576 / 1048576.0 > 0.5
                     THEN 1 ELSE 0 END)) AS cnt
          FROM p)
    SELECT p_partkey, ROUND(CAST(cnt AS DOUBLE), 2) AS area, cnt = 0 AS is_empty
    FROM c ORDER BY p_partkey
"""


def q28_dissolve_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/A7: merge-overlapping-geometries — cell-indexed overlap
    self-join + iterative connected components. Oracle recomputes the
    components with a recursive CTE over the pair graph."""
    from georip_spark.operators.dissolve import connected_components, overlap_pairs
    from georip_spark.operators.joins import prepare_regions

    rects = _rects_from_supplier(spark, sf_dir).select(
        "s_suppkey",
        F.format_string(
            "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
            "rminx", "rminy", "rmaxx", "rminy", "rmaxx", "rmaxy",
            "rminx", "rmaxy", "rminx", "rminy",
        ).alias("geometry"),
    )
    prepared = prepare_regions(rects, res=11)
    pairs = overlap_pairs(prepared, buffer=0.0, res=11)
    comps = connected_components(pairs, prepared.select("geom_id"))
    member = prepared.select("geom_id", "s_suppkey", "geometry").join(comps, "geom_id")

    # per-component boolean-union area (A7 unary_union parity): exact
    # slab-decomposition union over the member rectangles; the oracle
    # recomputes it with SQL coordinate compression — integer coords ⇒
    # exact doubles on both engines
    import pandas as pd

    from georip_spark.geo import boolean
    from georip_spark.geo import wkt as W

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        mps = []
        for g in pdf["geometry"]:
            try:
                mp = W.parse_wkt(g)
            except (ValueError, IndexError):
                mp = []
            if mp:
                mps.append(mp)
        return pd.DataFrame(
            [
                {
                    "component_key": int(pdf["s_suppkey"].min()),
                    "n_members": len(pdf),
                    "union_area": boolean.union_area(mps),
                }
            ]
        )

    out = member.groupBy("component").applyInPandas(
        agg, "component_key long, n_members long, union_area double"
    )
    return out.select(
        "component_key", "n_members", F.round("union_area", 2).alias("union_area")
    ).orderBy("component_key")


_Q28_SQL = f"""
    WITH RECURSIVE r AS ({_RECTS_SQL}),
    e AS (
        SELECT a.s_suppkey AS src, b.s_suppkey AS dst
        FROM r a JOIN r b
        ON a.rminx <= b.rmaxx AND a.rmaxx >= b.rminx
       AND a.rminy <= b.rmaxy AND a.rmaxy >= b.rminy
    ),
    reach(id, comp) AS (
        SELECT s_suppkey, s_suppkey FROM r
        UNION
        SELECT e.dst, reach.comp FROM reach JOIN e ON e.src = reach.id
    ),
    lab AS (SELECT id, MIN(comp) AS component_key FROM reach GROUP BY id),
    -- boolean-union area per component via coordinate compression:
    -- member rect edges cut the component into grid cells; a cell is
    -- covered iff some member spans it; union area = Σ covered cells.
    -- Integer coords ⇒ every double is exact on both engines.
    m AS (SELECT lab.component_key, r.* FROM r JOIN lab ON r.s_suppkey = lab.id),
    xs0 AS (SELECT component_key, rminx AS x FROM m
            UNION SELECT component_key, rmaxx FROM m),
    xs AS (SELECT component_key, x AS x0,
                  LEAD(x) OVER (PARTITION BY component_key ORDER BY x) AS x1
           FROM xs0),
    ys0 AS (SELECT component_key, rminy AS y FROM m
            UNION SELECT component_key, rmaxy FROM m),
    ys AS (SELECT component_key, y AS y0,
                  LEAD(y) OVER (PARTITION BY component_key ORDER BY y) AS y1
           FROM ys0),
    cells AS (SELECT xs.component_key, x0, x1, y0, y1
              FROM xs JOIN ys USING (component_key)
              WHERE x1 IS NOT NULL AND y1 IS NOT NULL),
    covered AS (SELECT DISTINCT c.component_key, c.x0, c.x1, c.y0, c.y1
                FROM cells c JOIN m ON m.component_key = c.component_key
                 AND m.rminx <= c.x0 AND m.rmaxx >= c.x1
                 AND m.rminy <= c.y0 AND m.rmaxy >= c.y1),
    ua AS (SELECT component_key,
                  SUM((x1 - x0) * (y1 - y0)) AS union_area
           FROM covered GROUP BY component_key)
    SELECT lab.component_key, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(ANY_VALUE(ua.union_area), 2) AS union_area
    FROM lab JOIN ua ON ua.component_key = lab.component_key
    GROUP BY lab.component_key ORDER BY lab.component_key
"""


def q29_docs_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract INPUT path (BASELINE.json input_hint / SURVEY §1.3):
    build the docs(doc_id, spans) table, then drive the engine FROM it
    — posexplode media spans, parse pixel windows out of media_ref,
    re-derive ordinals + CRS footprints via the raster-metadata join
    (pipeline.tiles_from_docs). The oracle computes the same per-doc
    aggregates directly from the tile-grid derivation, so any ingest
    bug (span parse, ordinal law, affine) breaks the hash."""
    from georip_spark import synth
    from georip_spark.pipeline import tiles_from_docs

    rasters = _rasters_from_part(spark, sf_dir)
    docs = synth.synth_docs(spark, rasters)
    tiles = tiles_from_docs(docs, rasters)
    return (
        tiles.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum("ordinal").cast("long").alias("sum_ordinal"),
            F.sum((F.col("tile_w") * F.col("tile_h")).cast("long")).cast("long").alias("sum_px"),
            F.round(F.min("minx"), 6).alias("grid_minx"),
            F.round(F.max("maxy"), 6).alias("grid_maxy"),
        )
        .orderBy("doc_id")
    )


_Q29_SQL = f"""
    WITH r AS ({_RASTERS_SQL}),
    g1 AS (SELECT *, unnest(generate_series(0, height - 1, stride)) AS tile_row FROM r),
    g2 AS (SELECT *, unnest(generate_series(0, width - 1, stride)) AS tile_col FROM g1),
    t AS (SELECT doc_id,
           (tile_row // stride) * ((width + stride - 1) // stride) + (tile_col // stride) AS ordinal,
           CASE WHEN tile_size < width - tile_col THEN tile_size ELSE width - tile_col END AS tile_w,
           CASE WHEN tile_size < height - tile_row THEN tile_size ELSE height - tile_row END AS tile_h,
           tc + tile_col * 1.0 AS minx,
           tf - tile_row * 1.0 AS maxy
    FROM g2)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(ordinal) AS BIGINT) AS sum_ordinal,
           CAST(SUM(tile_w * tile_h) AS BIGINT) AS sum_px,
           ROUND(MIN(minx), 6) AS grid_minx,
           ROUND(MAX(maxy), 6) AS grid_maxy
    FROM t GROUP BY doc_id ORDER BY doc_id
"""


def q30_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END near-dup dedup (the judged composition): MinHash-LSH
    candidates → exact Jaccard ≥ 0.6 verify → connected components →
    keeper = min doc_id per duplicate group. One row per document with
    its group keeper and survival flag. Oracle recomputes the whole
    chain in SQL with a recursive CTE for the components."""
    from georip_spark.operators.dedup import neardup_dedup

    d = _t(spark, sf_dir, "documents")
    return (
        neardup_dedup(d, "doc_id", "text", tau=0.6)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("keeper").cast("long").alias("keeper"),
            "is_kept",
        )
        .orderBy("doc_id")
    )


def _q30_sql() -> str:
    # mirrors dedup.shingle_codes / minhash (a=2h+3, b=5h+1) / band
    # keys / jaccard verify / min-label components (recursive CTE)
    poly = " + ".join(
        f"CAST(unicode(substr(substr(text, i + 1, 8), {j + 1}, 1)) AS BIGINT) * {31 ** j}"
        for j in range(8)
    )
    mins = ", ".join(
        f"list_min(list_transform(cs, c -> (c * {2 * h + 3} + {5 * h + 1}) % 2147483647))"
        for h in range(16)
    )
    band_exprs = ", ".join(
        f"'{b}' || '_' || " + " || '_' || ".join(f"sig[{b * 4 + r + 1}]" for r in range(4))
        for b in range(4)
    )
    return f"""
    WITH RECURSIVE codes AS (SELECT doc_id,
            list_transform(generate_series(0, greatest(length(text) - 8, 0), 4),
                           i -> ({poly}) % 2147483647) AS cs FROM documents),
    sigs AS (SELECT doc_id, [{mins}] AS sig FROM codes),
    bands AS (SELECT doc_id, unnest([{band_exprs}]) AS band FROM sigs),
    cand AS (SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
             FROM bands a JOIN bands b USING (band)
             WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    csets AS (SELECT CAST(doc_id AS BIGINT) AS did, list_distinct(cs) AS cset FROM codes),
    ver AS (SELECT id_a, id_b FROM cand
            JOIN csets ca ON ca.did = cand.id_a
            JOIN csets cb ON cb.did = cand.id_b
            WHERE ROUND(len(list_intersect(ca.cset, cb.cset)) * 1.0 /
                        len(list_distinct(list_concat(ca.cset, cb.cset))), 6) >= 0.6),
    e AS (SELECT id_a AS src, id_b AS dst FROM ver
          UNION ALL SELECT id_b, id_a FROM ver),
    reach(id, comp) AS (
        SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
        UNION
        SELECT e.dst, reach.comp FROM reach JOIN e ON e.src = reach.id),
    lab AS (SELECT id AS doc_id, MIN(comp) AS keeper FROM reach GROUP BY id)
    SELECT doc_id, keeper, doc_id = keeper AS is_kept FROM lab ORDER BY doc_id
"""


_Q30_SQL = _q30_sql()


def _regions_from_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic truth regions for the span-parity queries: two
    axis-aligned rects per part-derived raster, placed inside the
    raster extent with pure integer arithmetic (mirrored in the
    oracle's SQL). Every third (part, j) is Background — exercising
    the class-encode drop path."""
    p = _t(spark, sf_dir, "part")
    pk, jj = F.col("p_partkey"), F.col("j")
    wd = F.lit(256) + (pk % 8) * 128
    ht = F.lit(256) + (F.col("p_size") % 8) * 128
    r = p.select(
        "p_partkey", "p_size", F.explode(F.array(F.lit(0), F.lit(1))).alias("j")
    )
    rx0 = (pk % 64) * 5000.0 + ((pk * 31 + jj * 97) % (wd - 64)).cast("double")
    ry1 = F.floor(pk / 64) * 5000.0 - ((pk * 17 + jj * 53) % (ht - 64)).cast("double")
    sx = (F.lit(48) + ((pk + jj) % 5) * 40).cast("double")
    sy = (F.lit(48) + ((pk * 3 + jj) % 7) * 24).cast("double")
    return r.select(
        F.concat(F.lit("Part"), pk.cast("string")).alias("region"),
        F.lit(2019).alias("start_year"),
        F.lit(2020).alias("end_year"),
        F.when((pk + jj) % 3 == 0, "Background").otherwise("Treatment").alias("class_name"),
        F.format_string(
            "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
            rx0, ry1 - sy, rx0 + sx, ry1 - sy, rx0 + sx, ry1, rx0, ry1, rx0, ry1 - sy,
        ).alias("geometry"),
    )


def _spans_of(docs_out: DataFrame) -> DataFrame:
    """Explode docs(doc_id, spans) to one row per span — the per-row
    form of the BASELINE.json invariant (kind, text, media_ref, order)."""
    s = docs_out.select("doc_id", F.explode("spans").alias("s"))
    return s.select(
        "doc_id",
        F.col("s.offset").alias("pos"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    ).orderBy("doc_id", "pos")


def q31_spans_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.json per-row correctness gate, driver-checked: the
    FULL span sequence (kind, text, media_ref, order) emitted by the
    contract docs-input path (pipeline.from_docs), one row per span.
    The oracle derives the complete expected sequence independently in
    SQL — tile grid, per-part truth rects, Sutherland–Hodgman clip
    vertex order (BL-start CCW, rotated to BR-start iff the region's
    bottom edge is clipped), banker's-rounded fmt6 label text, and the
    composite (ordinal, kind, class, label) span ordering."""
    from georip_spark import synth
    from georip_spark.pipeline import from_docs

    rasters = _rasters_from_part(spark, sf_dir)
    docs = synth.synth_docs(spark, rasters)
    regions = _regions_from_part(spark, sf_dir)
    # res="auto": q31 exercises the data-driven grid resolution
    # (joins.auto_res) under the driver's per-row gate; q32 keeps the
    # explicit DEFAULT_RES so both settings stay driver-covered. The
    # span output is res-invariant (cells are candidates, clip
    # decides), which is exactly what sharing _q31_sql verifies.
    return _spans_of(from_docs(docs, rasters, regions, res="auto")["docs_out"])


def q32_spans_build_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-row span-sequence invariant for the raster-driven
    path (pipeline.build_dataset), against the SAME oracle SQL — both
    entry paths pinned per-row to one independent derivation, which
    implies from_docs ≡ build_dataset span-for-span."""
    from georip_spark.pipeline import build_dataset

    rasters = _rasters_from_part(spark, sf_dir)
    regions = _regions_from_part(spark, sf_dir)
    return _spans_of(build_dataset(rasters, regions)["docs_out"])


def q33_lineage_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage/resume under the driver's per-row gate (VERDICT r3 #6):
    run the checkpointed pipeline (lineage.run_pipeline_with_lineage —
    tiles and docs_out land in bucketed parquet with a manifest), then
    simulate a crash by dropping one completed bucket + its manifest
    entry from EACH stage, resume, and emit the span sequence. The
    resumed output must equal q32's exactly (same _q31_sql oracle):
    resume recomputes only the missing buckets, losing and duplicating
    nothing. Reference has no resumability (per-file exist_ok only,
    georip/raster/tools.py:276-279); this is the north_rule's
    per-partition checkpoint lineage."""
    import tempfile

    from georip_spark.lineage import StageStore, run_pipeline_with_lineage

    rasters = _rasters_from_part(spark, sf_dir)
    regions = _regions_from_part(spark, sf_dir)
    # the store must outlive this call (the returned DF reads from it
    # lazily; the driver collects after we return) — a per-run temp
    # dir under the system tmp, cleaned by the OS
    root = tempfile.mkdtemp(prefix="georip_q33_")
    store = StageStore(root)
    # first full run materializes every bucket (run_stage is eager)
    run_pipeline_with_lineage(spark, rasters, regions, store, n_buckets=8)
    # simulated crash: one bucket gone from each stage
    store.drop_bucket("tiles", 1)
    store.drop_bucket("docs_out", 2)
    resumed = run_pipeline_with_lineage(spark, rasters, regions, store, n_buckets=8)
    return _spans_of(resumed)


def _q31_sql() -> str:
    # fmt6 mirror: the engine's clip kernel rounds with np.round
    # (banker's) and fmt6 strips trailing zeros — round_even + printf
    # reproduce both; values are exact dyadic ratios (integer coords /
    # power-of-two tile sizes), so the rounding ties agree bit-for-bit
    def f6(x: str) -> str:
        return (
            "regexp_replace(regexp_replace(printf('%.6f', round_even(CAST("
            + x
            + " AS DOUBLE), 6)), '0+$', ''), '\\.$', '.0')"
        )

    uL, uR = "((ix0 - tminx) / tw)", "((ix1 - tminx) / tw)"
    vB, vT = "((tmaxy - iy0) / th)", "((tmaxy - iy1) / th)"

    def seq(pts: list[str]) -> str:
        return " || ' ' || ".join(f6(p) for p in pts)

    bl = seq([uL, vB, uR, vB, uR, vT, uL, vT, uL, vB])
    br = seq([uR, vB, uR, vT, uL, vT, uL, vB, uR, vB])
    return f"""
    WITH rr AS (
        SELECT p_partkey AS pk,
               'Part' || p_partkey || '_2019to2020_NDVI_Difference' AS doc_id,
               CAST(256 + (p_partkey % 8) * 128 AS BIGINT) AS width,
               CAST(256 + (p_size % 8) * 128 AS BIGINT) AS height,
               CAST(128 AS BIGINT) AS tile_size,
               CAST(CASE WHEN p_partkey % 5 = 0 THEN 64 ELSE 128 END AS BIGINT) AS stride,
               (p_partkey % 64) * 5000.0 AS tc,
               CAST(FLOOR(p_partkey / 64) AS BIGINT) * 5000.0 AS tf
        FROM part),
    g1 AS (SELECT *, unnest(generate_series(0, height - 1, stride)) AS trow FROM rr),
    g2 AS (SELECT *, unnest(generate_series(0, width - 1, stride)) AS tcol FROM g1),
    t2 AS (SELECT doc_id,
            (trow // stride) * ((width + stride - 1) // stride) + (tcol // stride) AS ordinal,
            doc_id || '_tile_' || trow || '_' || tcol AS media_ref,
            CASE WHEN tile_size < width - tcol THEN tile_size ELSE width - tcol END AS tw,
            CASE WHEN tile_size < height - trow THEN tile_size ELSE height - trow END AS th,
            tc + tcol AS tminx,
            tf - trow AS tmaxy,
            tc + tcol + (CASE WHEN tile_size < width - tcol THEN tile_size ELSE width - tcol END) AS tmaxx,
            tf - trow - (CASE WHEN tile_size < height - trow THEN tile_size ELSE height - trow END) AS tminy
        FROM g2),
    reg AS (SELECT doc_id,
            tc + ((pk * 31 + j * 97) % (width - 64)) AS rx0,
            tf - ((pk * 17 + j * 53) % (height - 64)) AS ry1,
            48 + ((pk + j) % 5) * 40 AS sx,
            48 + ((pk * 3 + j) % 7) * 24 AS sy
        FROM rr CROSS JOIN (SELECT unnest([0, 1]) AS j) js
        WHERE (pk + j) % 3 != 0),
    reg2 AS (SELECT doc_id, rx0, rx0 + sx AS rx1, ry1 - sy AS ry0, ry1 FROM reg),
    pairs AS (SELECT t2.doc_id, t2.ordinal, t2.media_ref, tminx, tmaxy, tw, th, ry0, tminy,
            GREATEST(rx0, tminx) AS ix0, LEAST(rx1, tmaxx) AS ix1,
            GREATEST(ry0, tminy) AS iy0, LEAST(ry1, tmaxy) AS iy1
        FROM t2 JOIN reg2 USING (doc_id)
        WHERE LEAST(rx1, tmaxx) > GREATEST(rx0, tminx)
          AND LEAST(ry1, tmaxy) > GREATEST(ry0, tminy)),
    lab AS (SELECT doc_id, ordinal, media_ref,
            '0 ' || CASE WHEN ry0 >= tminy THEN {bl} ELSE {br} END AS text
        FROM pairs),
    sp AS (
        SELECT doc_id, ordinal, 0 AS k, -2147483648 AS cid, '' AS text, media_ref FROM t2
        UNION ALL
        SELECT doc_id, ordinal, 1 AS k, 0 AS cid, text, media_ref FROM lab)
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ordinal, k, cid, text) - 1 AS INTEGER) AS pos,
           CASE WHEN k = 0 THEN 'media' ELSE 'text' END AS kind,
           text, media_ref
    FROM sp ORDER BY doc_id, pos
"""


_Q31_SQL = _q31_sql()


# ---------------------------------------------------------------------
# driver API
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile part-derived rasters, PIP-join tile footprints
    against supplier rectangles through the cell-indexed spatial join,
    summarize per doc. Exercises tiling + cell cover + join + agg."""
    from georip_spark.operators.joins import prepare_regions, spatial_join_tiles_regions
    from georip_spark.operators.tiling import tile_grid

    sf = SF_DEFAULT
    tiles = tile_grid(_rasters_from_part(spark, sf))
    # rects spread over the same CRS domain as the part-derived rasters
    # (x origins step 5000 over 64 columns, y over rows) so the join
    # actually matches across many docs
    sup = _t(spark, sf, "supplier")
    rects = sup.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 9973) % 320000).cast("double").alias("rminx"),
        (((F.col("s_suppkey") * 331) % 24000) - 2000).cast("double").alias("rminy"),
    ).select(
        "s_suppkey",
        F.format_string(
            "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
            F.col("rminx"), F.col("rminy"),
            F.col("rminx") + 3000.0, F.col("rminy"),
            F.col("rminx") + 3000.0, F.col("rminy") + 3000.0,
            F.col("rminx"), F.col("rminy") + 3000.0,
            F.col("rminx"), F.col("rminy"),
        ).alias("geometry"),
    )
    joined = spatial_join_tiles_regions(
        tiles, prepare_regions(rects, res=9), res=9, how="inner",
        on_years=False, clip=True, broadcast_regions=True,
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.countDistinct("media_ref").cast("long").alias("n_tiles_matched"),
        )
        .orderBy("doc_id")
    )


def q34_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k similarity search — the scale
    path next to q15's exact brute force (round 4; round 5 gates the
    MULTI-TABLE OR-construction, the production recall shape — see
    jobs/ann_recall.py for the measured recall table). Queries are
    vec_id 0..4; each of 2 tables signs against a disjoint 8-plane
    slice and probes its own bucket plus the 8 Hamming-1 buckets
    (sig XOR 2^p); the candidate union is deduped on (q_id, vec_id),
    scored with exact integer dot/norms² and ranked by the
    bit-portable double dot_q/(√nq2_q·√nc2_q) (IEEE ops over
    identical integer inputs — no ROUND, q24's lesson). Output
    carries the exact longs."""
    from georip_spark.operators.similarity import ann_topk_lsh

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return (
        ann_topk_lsh(
            e, q, k=10, n_planes=8, exclude_self=True, n_tables=2
        )
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            "dot_q", "nq2_q", "nc2_q",
        )
        .orderBy("q_id", "rank")
    )


def _q34_sql() -> str:
    # mirrors similarity.ann_topk_lsh: quantize → per-table 8-plane
    # signature over disjoint plane slices (shared arithmetic with
    # _q24_sql) → join key sig + t·2⁸ → multi-probe sig XOR 2^p →
    # DISTINCT pair dedup → exact integer scoring → rank by the IEEE
    # double
    def sig_expr(offset: int) -> str:
        return " + ".join(
            "(CASE WHEN list_sum(list_transform(list_zip(qe, generate_series(0, 63)), "
            f"x -> CAST(x[1] AS BIGINT) * (CASE WHEN (((({P * 1009} + x[2] * 9176 + x[2] * {31 * P} + 1) % 65521) * 48271) % 2147483647 * 48271) % 2147483647 < 1073741824 THEN 1 ELSE -1 END))) > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
            for p, P in ((p, offset + p) for p in range(8))
        )

    csigs = ", ".join(
        f"CAST({sig_expr(t * 8)} AS BIGINT) + {t * 256} AS sig_t{t}" for t in range(2)
    )
    probe_list = "[" + ", ".join(
        f"xor(sig_t{t} - {t * 256}, {m}) + {t * 256}"
        for t in range(2)
        for m in [0] + [1 << p for p in range(8)]
    ) + "]"
    return f"""
    WITH q AS (SELECT vec_id,
            list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qe
        FROM embeddings),
    sigs AS (SELECT vec_id, qe, {csigs} FROM q),
    csig AS (SELECT vec_id, qe, unnest([sig_t0, sig_t1]) AS sig FROM sigs),
    qs AS (SELECT vec_id AS q_id, qe AS qq, sig_t0, sig_t1 FROM sigs WHERE vec_id < 5),
    probes AS (SELECT q_id, qq, unnest({probe_list}) AS sig FROM qs),
    cand AS (SELECT DISTINCT p.q_id, s.vec_id,
            CAST(list_sum(list_transform(list_zip(p.qq, s.qe),
                x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS BIGINT) AS dot_q,
            CAST(list_sum(list_transform(p.qq, v -> v * v)) AS BIGINT) AS nq2_q,
            CAST(list_sum(list_transform(s.qe, v -> v * v)) AS BIGINT) AS nc2_q
        FROM probes p JOIN csig s USING (sig)
        WHERE s.vec_id <> p.q_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY CAST(dot_q AS DOUBLE) / (sqrt(CAST(nq2_q AS DOUBLE)) * sqrt(CAST(nc2_q AS DOUBLE))) DESC,
                     vec_id ASC) AS rank
        FROM cand)
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS BIGINT) AS rank,
           CAST(vec_id AS BIGINT) AS vec_id, dot_q, nq2_q, nc2_q
    FROM ranked WHERE rank <= 10 ORDER BY q_id, rank
"""


_Q34_SQL = _q34_sql()


def q35_holed_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hole-aware clip + largest-part selection, driver-gated (round-4
    session 5; jvm_clip.clip_normalize_coords_mp over
    jvm_wkt.rings_expr — the all-JVM hot-path arm for holed
    geometries). Deterministic fixtures from `documents`: per doc i, a
    MULTIPOLYGON of part A = rect shell with a rect hole (key =
    wa·ha − hw·hh) and part B = solid rect (key = wb·hb), everything
    strictly inside the 100×100 tile with integer coords, so DuckDB
    derives the winner and its normalized closed shell from pure
    integer arithmetic while Spark runs the real parse → 4-pass S-H →
    |shell|−Σ|holes| selection → round-6 normalize. Ties keep part A
    on both sides (kernel: strictly-greater replacement; oracle:
    key_b > key_a). Reference semantics:
    georip/geoprocessing/mapping.py:259-261 (shapely intersection →
    largest part), re-derived."""
    from georip_spark.operators import jvm_clip, jvm_wkt

    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    p = (
        # pre-shrink BEFORE the single-partition window: limit(200)
        # runs as a partial+global TakeOrdered, so only 200 rows ever
        # reach the row_number sort (same fix as q36/q41 per ADVICE)
        d.select("doc_id").orderBy("doc_id").limit(200)
        .withColumn("i", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            (F.lit(20) + (F.col("i") * 7) % 31).alias("wa"),
            (F.lit(20) + (F.col("i") * 11) % 29).alias("ha"),
            (F.lit(15) + (F.col("i") * 13) % 25).alias("wb"),
            (F.lit(15) + (F.col("i") * 17) % 23).alias("hb"),
            "i",
        )
        .select(
            "*",
            (F.lit(1) + (F.col("i") * 3) % (F.col("wa") - 5)).alias("hw"),
            (F.lit(1) + (F.col("i") * 5) % (F.col("ha") - 5)).alias("hh"),
        )
    )
    wkt = F.format_string(
        "MULTIPOLYGON (((10 10, %s 10, %s %s, 10 %s, 10 10), "
        "(12 12, %s 12, %s %s, 12 %s, 12 12)), "
        "((60 60, %s 60, %s %s, 60 %s, 60 60)))",
        F.lit(10) + F.col("wa"), F.lit(10) + F.col("wa"),
        F.lit(10) + F.col("ha"), F.lit(10) + F.col("ha"),
        F.lit(12) + F.col("hw"), F.lit(12) + F.col("hw"),
        F.lit(12) + F.col("hh"), F.lit(12) + F.col("hh"),
        F.lit(60) + F.col("wb"), F.lit(60) + F.col("wb"),
        F.lit(60) + F.col("hb"), F.lit(60) + F.col("hb"),
    )
    coords = jvm_clip.clip_normalize_coords_mp(
        jvm_wkt.rings_expr(wkt),
        F.lit(0.0), F.lit(0.0), F.lit(100.0), F.lit(100.0),
    )
    return (
        p.select("doc_id", F.posexplode(coords).alias("pos", "val"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "val")
        .orderBy("doc_id", "pos")
    )


_Q35_SQL = """
WITH docs AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
    FROM documents ORDER BY doc_id LIMIT 200
),
params AS (
    SELECT doc_id,
        20 + (i*7) % 31 AS wa, 20 + (i*11) % 29 AS ha,
        15 + (i*13) % 25 AS wb, 15 + (i*17) % 23 AS hb,
        1 + (i*3) % (20 + (i*7) % 31 - 5) AS hw,
        1 + (i*5) % (20 + (i*11) % 29 - 5) AS hh
    FROM docs
),
keyed AS (
    SELECT *,
        CASE WHEN wb*hb > wa*ha - hw*hh THEN 1 ELSE 0 END AS win_b
    FROM params
),
rect AS (  -- winning shell as (x0, y0, x1, y1)
    SELECT doc_id,
        CASE WHEN win_b = 1 THEN 60 ELSE 10 END AS x0,
        CASE WHEN win_b = 1 THEN 60 ELSE 10 END AS y0,
        CASE WHEN win_b = 1 THEN 60 + wb ELSE 10 + wa END AS x1,
        CASE WHEN win_b = 1 THEN 60 + hb ELSE 10 + ha END AS y1
    FROM keyed
),
flat AS (  -- closed BL-CCW ring, interleaved u,v at pos 0..9
    SELECT doc_id, unnest(generate_series(0, 9)) AS pos, x0, y0, x1, y1
    FROM rect
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
    CASE WHEN pos % 2 = 0 THEN  -- u = x/100, vertex j = pos//2
        (CASE WHEN FLOOR(pos / 2) IN (1, 2) THEN x1 ELSE x0 END) / 100.0
    ELSE                        -- v = (100 - y)/100
        (100.0 - (CASE WHEN FLOOR(pos / 2) IN (2, 3) THEN y1 ELSE y0 END)) / 100.0
    END AS val
FROM flat ORDER BY doc_id, pos
"""


def q36_media_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the from-scratch media codecs (round-4
    session 8; `georip_spark/codecs.py`). Per doc i: even i → a
    grayscale PNG whose pixel (y,x) = (seed + y·w + x) mod 256,
    scanline filter = i mod 5 so ALL five spec filter arms
    (None/Sub/Up/Average/Paeth) are driven, not just the encoder's
    default; odd i → a mono 16-bit PCM WAV with sample(j) =
    (j·17 + seed·131) mod 65536 − 32768. Executor-side (mapInPandas):
    encode → decode → exact integer sample sum. The encoded payload
    then flows through `media_meta_cols`' pure-JVM header parse
    (sniff magic, IHDR / fmt-chunk fields). DuckDB recomputes the
    sums closed-form from the same formulas — agreement pins
    encoder↔decoder inversion across every filter path AND
    spec-correct header layout (the JVM parse reads redundant bytes
    the python decode also checks: magic, dims, depth, channels,
    rate). Reference parity: the reference emits PNG chips via
    skimage (georip/raster/conversion.py:12-36); this is the
    zero-native-deps equivalent, driver-checked."""
    import numpy as _np
    import pandas as _pd

    from georip_spark import codecs
    from georip_spark.operators.multimodal import media_meta_cols

    d = _t(spark, sf_dir, "documents")
    # pre-shrink BEFORE the single-partition window: orderBy+limit is
    # a TakeOrderedAndProject (no full sort), so only 240 rows funnel
    # through the no-partitionBy row_number (ADVICE r4)
    w = Window.orderBy("doc_id")
    p = (
        d.select("doc_id").orderBy("doc_id").limit(240)
        .withColumn("i", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            F.when(F.col("i") % 2 == 0, "png").otherwise("wav").alias("kind"),
            (F.lit(8) + (F.col("i") * 7) % 25).cast("int").alias("mw"),
            (F.lit(8) + (F.col("i") * 11) % 21).cast("int").alias("mh"),
            (F.lit(64) + (F.col("i") * 13) % 97).cast("int").alias("ns"),
            ((F.col("i") * 31) % 256).cast("int").alias("seed"),
            (F.col("i") % 5).cast("int").alias("ftype"),
        )
    )

    def run(batches):
        for pdf in batches:
            payloads, sums = [], []
            for kind, mw, mh, ns, seed, ftype in zip(
                pdf["kind"].values, pdf["mw"].values, pdf["mh"].values,
                pdf["ns"].values, pdf["seed"].values, pdf["ftype"].values,
            ):
                if kind == "png":
                    idx = _np.arange(int(mw) * int(mh), dtype=_np.int64)
                    img = ((int(seed) + idx) % 256).astype(_np.uint8)
                    img = img.reshape(int(mh), int(mw))
                    payload = codecs.png_encode(img, filter_type=int(ftype))
                    out = codecs.png_decode(payload)
                    sums.append(int(out.astype(_np.int64).sum()))
                else:
                    j = _np.arange(int(ns), dtype=_np.int64)
                    samples = ((j * 17 + int(seed) * 131) % 65536 - 32768).astype(
                        _np.int16
                    )
                    payload = codecs.wav_encode(samples, 16000)
                    out, _rate = codecs.wav_decode(payload)
                    sums.append(int(out.astype(_np.int64).sum()))
                payloads.append(payload)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": payloads,
                    "out_sum": sums,
                }
            )

    decoded = p.mapInPandas(
        run, "doc_id long, kind string, payload binary, out_sum long"
    )
    return (
        media_meta_cols(decoded)
        .select(
            "doc_id", "kind", "sniffed_type", "media_w", "media_h",
            "media_bit_depth", "media_channels", "media_sample_rate",
            "out_sum",
        )
        .orderBy("doc_id")
    )


_Q36_SQL = """
WITH base AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
    FROM documents ORDER BY doc_id LIMIT 240
),
p AS (
    SELECT doc_id,
        CASE WHEN i % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
        8 + (i*7) % 25 AS mw, 8 + (i*11) % 21 AS mh,
        64 + (i*13) % 97 AS ns, (i*31) % 256 AS seed
    FROM base
),
px AS (
    SELECT doc_id, seed, unnest(generate_series(0, mw*mh - 1)) AS idx
    FROM p WHERE kind = 'png'
),
psum AS (
    SELECT doc_id, SUM((seed + idx) % 256) AS s FROM px GROUP BY doc_id
),
sx AS (
    SELECT doc_id, seed, unnest(generate_series(0, ns - 1)) AS idx
    FROM p WHERE kind = 'wav'
),
ssum AS (
    SELECT doc_id, SUM((idx*17 + seed*131) % 65536 - 32768) AS s
    FROM sx GROUP BY doc_id
)
SELECT p.doc_id, p.kind, p.kind AS sniffed_type,
    CAST(CASE WHEN p.kind = 'png' THEN mw END AS INT) AS media_w,
    CAST(CASE WHEN p.kind = 'png' THEN mh END AS INT) AS media_h,
    CAST(CASE WHEN p.kind = 'png' THEN 8 ELSE 16 END AS INT) AS media_bit_depth,
    CAST(1 AS INT) AS media_channels,
    CAST(CASE WHEN p.kind = 'wav' THEN 16000 END AS INT) AS media_sample_rate,
    CAST(COALESCE(psum.s, ssum.s) AS BIGINT) AS out_sum
FROM p
LEFT JOIN psum ON p.doc_id = psum.doc_id
LEFT JOIN ssum ON p.doc_id = ssum.doc_id
ORDER BY p.doc_id
"""


# unique memory-sink names: the driver may invoke a streaming gate
# more than once per session (warm + timed), and a memory table name
# can only back one query at a time
_STREAM_QUERY_SEQ = [0]


def _stream_query_name(base: str) -> str:
    _STREAM_QUERY_SEQ[0] += 1
    return f"{base}_{_STREAM_QUERY_SEQ[0]}"


def q37_stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the Structured-Streaming dedup path (round-5
    VERDICT #5; `georip_spark/streaming.py`). The documents table is
    read as a file-source STREAM, each row deterministically
    re-arrives 1 + (doc_id % 3) times (the duplicate-injection that
    exercises the dropDuplicatesWithinWatermark state store — the sf
    corpora have no natural exact dupes), and
    streaming.stream_exact_dedup must emit exactly one survivor per
    fingerprint under trigger=availableNow. Fingerprint =
    md5(doc_id \\x1f text): scoped per source row so the survivor's
    non-key columns are deterministic regardless of arrival order
    (a cross-doc content fingerprint would make the surviving doc_id
    depend on batch order; cross-doc content dedup is q13's batch
    gate). Output = every survivor's (fingerprint, doc_id, n_chars),
    sorted — any state-store bug (dropped first arrival, surviving
    re-arrival, double emit) breaks rows or hash."""
    import tempfile

    from georip_spark import streaming as GS

    # the sf tables are single FILES; the file stream source lists a
    # DIRECTORY, so stage the table into one (same as q38's docs)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="q37_docs_")
    batch.write.mode("overwrite").parquet(tmp)
    src = (
        spark.readStream.schema(batch.schema)
        .parquet(tmp)
        .withColumn(
            "copy",
            F.explode(
                F.sequence(
                    F.lit(0), F.pmod(F.col("doc_id"), F.lit(3)).cast("int")
                )
            ),
        )
        .withColumn(
            # spread event times over 600s; the 24h watermark keeps
            # every row inside the horizon however availableNow chunks
            # the input into micro-batches (a 10min watermark dropped
            # the min-event_ts row as late once batch 1 advanced the
            # watermark to exactly its timestamp)
            "event_ts",
            F.timestamp_seconds(
                F.lit(100000) + F.pmod(F.col("doc_id"), F.lit(600))
            ),
        )
    )
    fp = F.md5(
        F.concat_ws("\x1f", F.col("doc_id").cast("string"), F.col("text"))
    )
    survivors = GS.stream_exact_dedup(src, watermark="24 hours", fingerprint=fp)
    out = GS.run_availablenow(survivors, _stream_query_name("q37_dedup"))
    return out.select(
        "fingerprint",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars_actual"),
    ).orderBy("fingerprint")


_Q37_SQL = """
    SELECT md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR), text)) AS fingerprint,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual
    FROM documents ORDER BY fingerprint
"""


def q38_stream_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the streaming ingest path: the contract docs
    table is materialized to parquet once, read back as a file-source
    STREAM (streaming.stream_docs), pushed through the stream-static
    raster-metadata join + media-span fan-out
    (streaming.stream_tiles == pipeline.tiles_from_docs, batch-parity
    tested), and the availableNow result must reproduce q29's per-doc
    tile aggregates — the SAME DuckDB oracle, so the streaming lane
    is held to the full value-hash bar, not rows-only."""
    import tempfile

    from georip_spark import streaming as GS, synth

    rasters = _rasters_from_part(spark, sf_dir)
    docs = synth.synth_docs(spark, rasters)
    tmp = tempfile.mkdtemp(prefix="q38_docs_")
    docs.write.mode("overwrite").parquet(tmp)
    tiles = GS.stream_tiles(GS.stream_docs(spark, tmp), rasters)
    out = GS.run_availablenow(tiles, _stream_query_name("q38_tiles"))
    return (
        out.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum("ordinal").cast("long").alias("sum_ordinal"),
            F.sum((F.col("tile_w") * F.col("tile_h")).cast("long")).cast("long").alias("sum_px"),
            F.round(F.min("minx"), 6).alias("grid_minx"),
            F.round(F.max("maxy"), 6).alias("grid_maxy"),
        )
        .orderBy("doc_id")
    )


def q41_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the from-scratch MJPEG-AVI video codec
    (round 5; `georip_spark/avi.py` + `jpeg.py`) and the frame-sample
    surface. Per doc i ∈ [0, 200): an AVI of nf = 2 + (i·5 mod 7)
    flat grayscale frames — frame j's pixel value v_ij =
    2·((i·13 + j·29) mod 128) is even, so at quality 50 each frame's
    DC/quantizer ratio is integral and the JPEG roundtrip is
    bit-exact (the q39 argument, per frame). Executor-side: encode
    the container, decode every 2nd frame via the RIFF walk (skipped
    frames never JPEG-decode), and emit the count and the exact sum
    over sampled frames — which DuckDB computes closed-form with no
    codec. The payload also flows through `media_meta_cols`' pure-JVM
    header parse (magic + canonical-layout MainAVIHeader at byte 32:
    dims, total frames), pinning the emitted container structure.
    Reference parity: the reference reads no video; this covers the
    engine's multimodal frame-sampling surface with a real container
    format and zero native dependencies."""
    import numpy as _np
    import pandas as _pd

    from georip_spark import avi as _avi
    from georip_spark.operators.multimodal import media_meta_cols

    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    p = (
        d.select("doc_id").orderBy("doc_id").limit(200)
        .withColumn("i", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            (F.lit(8) + (F.col("i") * 7) % 25).cast("int").alias("mw"),
            (F.lit(8) + (F.col("i") * 11) % 21).cast("int").alias("mh"),
            (F.lit(2) + (F.col("i") * 5) % 7).cast("int").alias("nf"),
            F.col("i").cast("int").alias("i"),
        )
    )

    def run(batches):
        for pdf in batches:
            payloads, n_sampled, sums = [], [], []
            for mw, mh, nf, i in zip(
                pdf["mw"].values, pdf["mh"].values,
                pdf["nf"].values, pdf["i"].values,
            ):
                mw, mh, nf, i = int(mw), int(mh), int(nf), int(i)
                frames = [
                    _np.full((mh, mw), 2 * ((i * 13 + j * 29) % 128), _np.uint8)
                    for j in range(nf)
                ]
                payload = _avi.avi_encode_mjpeg(frames, fps=10, quality=50)
                dec = _avi.avi_decode_frames(payload, every=2)
                n_sampled.append(len(dec))
                sums.append(int(sum(int(f.astype(_np.int64).sum()) for f in dec)))
                payloads.append(payload)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "n_sampled": n_sampled,
                    "sampled_sum": sums,
                }
            )

    decoded = p.mapInPandas(
        run, "doc_id long, payload binary, n_sampled int, sampled_sum long"
    )
    return (
        media_meta_cols(decoded)
        .select(
            "doc_id", "sniffed_type", "media_w", "media_h",
            "media_n_frames", "n_sampled", "sampled_sum",
        )
        .orderBy("doc_id")
    )


_Q41_SQL = """
WITH base AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
    FROM documents ORDER BY doc_id LIMIT 200
),
p AS (
    SELECT doc_id, i,
        8 + (i*7) % 25 AS mw, 8 + (i*11) % 21 AS mh,
        2 + (i*5) % 7 AS nf
    FROM base
),
fr AS (
    SELECT doc_id, i, mw, mh, unnest(generate_series(0, nf - 1)) AS j
    FROM p
),
sampled AS (
    SELECT doc_id,
        COUNT(*) AS n_sampled,
        SUM(2 * ((i*13 + j*29) % 128) * mw * mh) AS s
    FROM fr WHERE j % 2 = 0 GROUP BY doc_id
)
SELECT p.doc_id,
    'avi' AS sniffed_type,
    CAST(p.mw AS INT) AS media_w,
    CAST(p.mh AS INT) AS media_h,
    CAST(p.nf AS INT) AS media_n_frames,
    CAST(sampled.n_sampled AS INT) AS n_sampled,
    CAST(sampled.s AS BIGINT) AS sampled_sum
FROM p JOIN sampled USING (doc_id)
ORDER BY p.doc_id
"""


def q40_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k similarity search — the
    cell-partitioned ANN scale path next to q34's hash-bucketed LSH
    (round 5; `similarity.ann_topk_ivf`). Coarse quantizer = the 16
    corpus vectors with smallest vec_id (the deterministic
    random-sample bootstrap of IVF — k-means refinement is
    data-dependent and not oracle-expressible; this is). Queries are
    vec_id 0..4, each probing its 4 nearest cells; corpus→cell
    assignment is scan-stage column math (array_max over centroid
    structs — no shuffle, no Python); candidates are scored with
    exact integer dot/norms² and ranked by the bit-portable double
    dot_q/(√nq2_q·√nc2_q), ties toward the smaller id on BOTH the
    assignment and the final rank (q24's lesson). DuckDB recomputes
    assignment and probes from the same integer arithmetic via
    windowed argmin. Measured recall@10: 0.91 on this corpus at
    n_probe=4/16; ≥0.9 asserted on the clustered fixture
    (tests/test_similarity.py::test_ivf_recall_clustered)."""
    from georip_spark.operators.similarity import ann_topk_ivf

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return (
        ann_topk_ivf(
            e, q, k=10, n_centroids=16, n_probe=4, exclude_self=True
        )
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            "dot_q", "nq2_q", "nc2_q",
        )
        .orderBy("q_id", "rank")
    )


_Q40_SQL = """
WITH c AS (SELECT vec_id,
        list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qe
    FROM embeddings),
cn AS (SELECT vec_id, qe,
        CAST(list_sum(list_transform(qe, v -> v * v)) AS BIGINT) AS n2
    FROM c),
cents AS (SELECT vec_id AS cid, qe AS cv, n2 AS ncent2
    FROM cn ORDER BY vec_id LIMIT 16),
asg AS (SELECT a.vec_id, a.qe, a.n2, k.cid,
        CAST(list_sum(list_transform(list_zip(a.qe, k.cv),
            x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
        / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(k.ncent2 AS DOUBLE))) AS cosd
    FROM cn a CROSS JOIN cents k),
cell AS (SELECT vec_id, qe, n2, cid AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cosd DESC, cid ASC) AS r FROM asg)
    WHERE r = 1),
probes AS (SELECT vec_id AS q_id, qe AS qq, n2 AS nq2, cid AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cosd DESC, cid ASC) AS r FROM asg WHERE vec_id < 5)
    WHERE r <= 4),
cand AS (SELECT p.q_id, s.vec_id,
        CAST(list_sum(list_transform(list_zip(p.qq, s.qe),
            x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS BIGINT) AS dot_q,
        p.nq2 AS nq2_q, s.n2 AS nc2_q
    FROM probes p JOIN cell s USING (cell)
    WHERE s.vec_id <> p.q_id),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        ORDER BY CAST(dot_q AS DOUBLE) / (sqrt(CAST(nq2_q AS DOUBLE)) * sqrt(CAST(nc2_q AS DOUBLE))) DESC,
                 vec_id ASC) AS rank
    FROM cand)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id, dot_q, nq2_q, nc2_q
FROM ranked WHERE rank <= 10 ORDER BY q_id, rank
"""


def q39_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the from-scratch baseline JPEG codec (round-5;
    `georip_spark/jpeg.py`, ITU-T T.81). Per doc i ∈ [0, 240): two
    executor-side legs inside one mapInPandas —

    * EXACT leg: a flat grayscale image (mh×mw, every pixel = v with
      v = 2·((i·13) mod 128), i.e. even) encoded at quality 50 then
      decoded. At q50 the luma quantizer's DC entry is 16 and the DC
      coefficient of a flat block is 8·(v−128), so DC/qt = (v−128)/2
      is integral for even v: the roundtrip recovers every pixel
      bit-exactly and ``flat_sum`` = v·mw·mh — which DuckDB computes
      closed-form with no codec at all.
    * LOSSY leg: a triangle-wave image pixel(y,x) =
      |((seed + 3x + 5y) mod 510) − 255| encoded at quality 90,
      decoded, PSNR against the source asserted ≥ 40 dB (measured
      worst case over all 240 parameter rows: 48.4 after the round-5
      dequant-order fix; the pre-fix decoder read 31.1, which is how
      the review caught the bug). The payload then
      flows through ``media_meta_cols``' pure-JVM magic sniff
      ('jpeg') while width/height/channels come from
      ``jpeg.jpeg_meta``'s python header parse — pinning both parse
      paths against the encoder's emitted SOF0.

    Reference parity: the reference never encodes JPEG (it emits PNG
    chips via skimage — georip/raster/conversion.py:12-36); this gate
    covers the engine's multimodal surface for the dominant web image
    format with zero native dependencies."""
    import numpy as _np
    import pandas as _pd

    from georip_spark import jpeg as _jpeg
    from georip_spark.operators.multimodal import media_meta_cols

    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    p = (
        d.select("doc_id").orderBy("doc_id").limit(240)
        .withColumn("i", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            (F.lit(8) + (F.col("i") * 7) % 25).cast("int").alias("mw"),
            (F.lit(8) + (F.col("i") * 11) % 21).cast("int").alias("mh"),
            (((F.col("i") * 13) % 128) * 2).cast("int").alias("v"),
            ((F.col("i") * 31) % 256).cast("int").alias("seed"),
        )
    )

    def run(batches):
        for pdf in batches:
            payloads, sums, meta_w, meta_h, meta_c, psnr_ok = [], [], [], [], [], []
            for mw, mh, v, seed in zip(
                pdf["mw"].values, pdf["mh"].values,
                pdf["v"].values, pdf["seed"].values,
            ):
                mw, mh, v, seed = int(mw), int(mh), int(v), int(seed)
                flat = _np.full((mh, mw), v, _np.uint8)
                out = _jpeg.jpeg_decode(_jpeg.jpeg_encode(flat, quality=50))
                sums.append(int(out.astype(_np.int64).sum()))
                yy, xx = _np.mgrid[0:mh, 0:mw]
                img = _np.abs(((seed + 3 * xx + 5 * yy) % 510) - 255).astype(
                    _np.uint8
                )
                payload = _jpeg.jpeg_encode(img, quality=90)
                dec = _jpeg.jpeg_decode(payload)
                mse = float(
                    _np.mean((dec.astype(_np.float64) - img.astype(_np.float64)) ** 2)
                )
                psnr = 99.0 if mse == 0 else 10 * _np.log10(255.0**2 / mse)
                psnr_ok.append(bool(psnr >= 40.0))
                m = _jpeg.jpeg_meta(payload)
                meta_w.append(m["width"])
                meta_h.append(m["height"])
                meta_c.append(m["channels"])
                payloads.append(payload)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "flat_sum": sums,
                    "meta_w": meta_w,
                    "meta_h": meta_h,
                    "meta_channels": meta_c,
                    "psnr_ok": psnr_ok,
                }
            )

    decoded = p.mapInPandas(
        run,
        "doc_id long, payload binary, flat_sum long, meta_w int, "
        "meta_h int, meta_channels int, psnr_ok boolean",
    )
    return (
        media_meta_cols(decoded)
        .select(
            "doc_id", "sniffed_type", "meta_w", "meta_h",
            "meta_channels", "flat_sum", "psnr_ok",
        )
        .orderBy("doc_id")
    )


_Q39_SQL = """
WITH base AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
    FROM documents ORDER BY doc_id LIMIT 240
)
SELECT doc_id,
    'jpeg' AS sniffed_type,
    CAST(8 + (i*7) % 25 AS INT) AS meta_w,
    CAST(8 + (i*11) % 21 AS INT) AS meta_h,
    CAST(1 AS INT) AS meta_channels,
    CAST(((i*13) % 128) * 2 * (8 + (i*7) % 25) * (8 + (i*11) % 21) AS BIGINT)
        AS flat_sum,
    TRUE AS psnr_ok
FROM base
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_region_revenue": q02_region_revenue,
        "q03_event_stats": q03_event_stats,
        "q04_distinct_dedup": q04_distinct_dedup,
        "q05_first_match": q05_first_match,
        "q06_topk_per_group": q06_topk_per_group,
        "q07_union_except": q07_union_except,
        "q08_class_encode": q08_class_encode,
        "q09_tile_grid": q09_tile_grid,
        "q10_pip_join": q10_pip_join,
        "q11_knn": q11_knn,
        "q12_cell_assign": q12_cell_assign,
        "q13_exact_dedup": q13_exact_dedup,
        "q14_text_stats": q14_text_stats,
        "q15_cosine_topk": q15_cosine_topk,
        "q16_stratified_split": q16_stratified_split,
        "q17_alternating_dedup": q17_alternating_dedup,
        "q18_seeded_sample": q18_seeded_sample,
        "q19_minhash_pairs": q19_minhash_pairs,
        "q20_ngram_jaccard": q20_ngram_jaccard,
        "q21_simhash": q21_simhash,
        "q22_langid": q22_langid,
        "q23_quality_score": q23_quality_score,
        "q24_embedding_neardup": q24_embedding_neardup,
        "q25_rolling_fingerprint": q25_rolling_fingerprint,
        "q26_payload_normalize": q26_payload_normalize,
        "q27_vectorize_payload": q27_vectorize_payload,
        "q28_dissolve_components": q28_dissolve_components,
        "q29_docs_ingest": q29_docs_ingest,
        "q30_neardup_dedup": q30_neardup_dedup,
        "q31_spans_from_docs": q31_spans_from_docs,
        "q32_spans_build_dataset": q32_spans_build_dataset,
        "q33_lineage_resume": q33_lineage_resume,
        "q34_ann_topk_lsh": q34_ann_topk_lsh,
        "q35_holed_clip": q35_holed_clip,
        "q36_media_roundtrip": q36_media_roundtrip,
        "q37_stream_exact_dedup": q37_stream_exact_dedup,
        "q38_stream_tiles": q38_stream_tiles,
        "q39_jpeg_roundtrip": q39_jpeg_roundtrip,
        "q40_ann_topk_ivf": q40_ann_topk_ivf,
        "q41_mjpeg_frames": q41_mjpeg_frames,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": _Q01_SQL,
        "q02_region_revenue": _Q02_SQL,
        "q03_event_stats": _Q03_SQL,
        "q04_distinct_dedup": _Q04_SQL,
        "q05_first_match": _Q05_SQL,
        "q06_topk_per_group": _Q06_SQL,
        "q07_union_except": _Q07_SQL,
        "q08_class_encode": _Q08_SQL,
        "q09_tile_grid": _Q09_SQL,
        "q10_pip_join": _Q10_SQL,
        "q11_knn": _Q11_SQL,
        "q12_cell_assign": _Q12_SQL,
        "q13_exact_dedup": _Q13_SQL,
        "q14_text_stats": _Q14_SQL,
        "q15_cosine_topk": _Q15_SQL,
        "q16_stratified_split": _Q16_SQL,
        "q17_alternating_dedup": _Q17_SQL,
        "q18_seeded_sample": _Q18_SQL,
        "q19_minhash_pairs": _Q19_SQL,
        "q20_ngram_jaccard": _Q20_SQL,
        "q21_simhash": _Q21_SQL,
        "q22_langid": _Q22_SQL,
        "q23_quality_score": _Q23_SQL,
        "q24_embedding_neardup": _Q24_SQL,
        "q25_rolling_fingerprint": _Q25_SQL,
        "q26_payload_normalize": _Q26_SQL,
        "q27_vectorize_payload": _Q27_SQL,
        "q28_dissolve_components": _Q28_SQL,
        "q29_docs_ingest": _Q29_SQL,
        "q30_neardup_dedup": _Q30_SQL,
        "q31_spans_from_docs": _Q31_SQL,
        "q32_spans_build_dataset": _Q31_SQL,
        "q33_lineage_resume": _Q31_SQL,
        "q34_ann_topk_lsh": _Q34_SQL,
        "q35_holed_clip": _Q35_SQL,
        "q36_media_roundtrip": _Q36_SQL,
        "q37_stream_exact_dedup": _Q37_SQL,
        "q38_stream_tiles": _Q29_SQL,
        "q39_jpeg_roundtrip": _Q39_SQL,
        "q40_ann_topk_ivf": _Q40_SQL,
        "q41_mjpeg_frames": _Q41_SQL,
    }
