"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is an
LSH-bucketed variant (random-hyperplane signs → bucket equi-join) that
turns the O(N·Q) scan into bucket-local candidate generation. Both are
pure column math (F.zip_with/F.aggregate — JVM higher-order functions,
no Python).

At 100 TB: signatures are computed in the scan stage; the bucket join
shuffles on a near-uniform key; exact re-scoring touches only bucket
collisions. Brute force remains available for small query sets
(broadcast the queries, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MOD = 2147483647


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double (deterministic left-to-right fold — the
    same order any SQL engine folds a list, so oracles agree)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k per query: broadcast queries × scan corpus, window
    rank. Scores rounded before ranking with id tie-break so ranking
    is reproducible across engines and partitionings."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(dot(F.col(vec_col), F.col(q_vec_col)), round_to).alias("score"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature as a long bitmask: bit p is the
    sign of <vec, h_p> where h_p is a deterministic ±1 hyperplane
    derived from (p, i) arithmetic — engine-portable, no stored
    planes. h_p[i] = +1 if ((p·31 + i·17) mod 7) < 4 else −1."""
    def plane_sign(p: int):
        return lambda x, i: x.cast("double") * F.when(
            ((F.lit(p * 31) + i * 17) % 7) < 4, 1.0
        ).otherwise(-1.0)

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 16,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs: bucket on the hyperplane signature,
    exact-cosine verify within buckets. Recall < 1 by LSH nature; the
    exact variant is a plain self-join (see brute_force_topk)."""
    sigs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, "sig")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                dot(F.col("a._v"), F.col("b._v"))
                / (norm(F.col("a._v")) * norm(F.col("b._v"))),
                round_to,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
