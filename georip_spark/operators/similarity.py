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
QUANT_SCALE = 10000  # embedding components → longs; |q| ≤ ~10⁴ for
# unit-norm vectors, so Σ q_a·q_b over dim ≤ 10⁴ stays ≪ 2⁶³


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double (deterministic left-to-right fold — the
    same order any SQL engine folds a list, so oracles agree)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def quantize(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<long> of floor(v·scale + 0.5): the
    integer embedding representation all near-dup math runs on.

    Why integers: double folds are order- and ULP-sensitive — Spark's
    strictly-left F.aggregate and DuckDB's list_sum disagree in the
    last bit, which flips ROUND(cosine, 4) when a value sits on a
    rounding boundary (round-1's only red oracle cell, q24). Integer
    sums are associative and exact, so signature signs, dots and
    norms² hash bit-identically on any engine."""
    return F.transform(
        vec, lambda v: F.floor(v.cast("double") * scale + 0.5).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact Σ a_i·b_i over array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
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


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    n_planes: int = 16,
    dim: int = 64,
    hamming_probes: bool = True,
    scale: int = QUANT_SCALE,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k over an embedding corpus: the LSH-bucketed
    scale path next to ``brute_force_topk``'s exact baseline.

    Plan shape at 100 TB: corpus signatures are scan-stage column
    math (no shuffle of the corpus); the probe side —
    |Q|·(1+n_planes) rows after the multi-probe explode — is
    broadcast, so the join keeps the corpus partitioning; the only
    shuffle is the per-query window rank over candidates
    (|candidates| ≈ Σ probed-bucket sizes ≪ N·Q, the whole point).

    Multi-probe: each query probes its own signature bucket plus the
    ``n_planes`` buckets at Hamming distance 1 (one sign flipped) —
    the standard recall repair for hyperplane LSH, deterministic, and
    expressible in plain SQL (sig XOR 2^p) so the oracle can replicate
    it. A corpus row matches at most one probe per query (probe values
    are distinct), so no candidate dedup is needed.

    Scoring/ranking is engine-portable by construction: candidates are
    scored with EXACT integer dot/norms² over the quantized embedding
    (see ``quantize``), and ranked by the double
    dot_q/(√nq2_q·√nc2_q) — computed from identical integer inputs
    with IEEE-correctly-rounded ops (cast, sqrt, mul, div), it is
    bit-identical on any engine, unlike a ROUND() of it (q24's
    round-2 lesson). Ties break on the corpus id. The output carries
    the exact longs, not the derived double.

    Recall caveat (disclosed): a hot bucket inflates candidates (an
    all-near-identical corpus degrades toward brute force for queries
    landing in it), and true neighbors ≥2 sign flips away are missed;
    ``lsh_bucket_stats`` audits bucket shape, ``brute_force_topk``
    measures recall on a sample."""
    c = corpus.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("_cq")
    ).withColumn("sig", hyperplane_signature(F.col("_cq"), n_planes, dim))
    q = queries.select(
        F.col(q_id_col), quantize(F.col(q_vec_col), scale).alias("_qq")
    ).withColumn("_sig0", hyperplane_signature(F.col("_qq"), n_planes, dim))
    probes = [F.col("_sig0")]
    if hamming_probes:
        probes += [
            F.col("_sig0").bitwiseXOR(F.lit(1 << p).cast("long"))
            for p in range(n_planes)
        ]
    qp = q.select(
        F.col(q_id_col), F.col("_qq"), F.explode(F.array(*probes)).alias("sig")
    )
    cand = c.join(F.broadcast(qp), "sig")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(q_id_col))
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        int_dot(F.col("_qq"), F.col("_cq")).alias("dot_q"),
        int_dot(F.col("_qq"), F.col("_qq")).alias("nq2_q"),
        int_dot(F.col("_cq"), F.col("_cq")).alias("nc2_q"),
    )
    cosd = F.col("dot_q").cast("double") / (
        F.sqrt(F.col("nq2_q").cast("double"))
        * F.sqrt(F.col("nc2_q").cast("double"))
    )
    w = Window.partitionBy(q_id_col).orderBy(cosd.desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(qvec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature as a long bitmask over a
    QUANTIZED (array<long>) embedding: bit p is the sign of <q, h_p>
    where h_p is a deterministic ±1 hyperplane derived from (p, i)
    arithmetic — engine-portable, no stored planes, and the projection
    is an exact integer sum (no float fold-order divergence).
    h_p[i] = +1 if ((p·31 + i·17) mod 7) < 4 else −1."""
    def plane_sign(p: int):
        return lambda x, i: x * F.when(
            ((F.lit(p * 31) + i * 17) % 7) < 4, F.lit(1).cast("long")
        ).otherwise(F.lit(-1).cast("long"))

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(qvec, F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(p)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_bucket_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Diagnostic: (sig, n) bucket histogram — run this to size
    ``bucket_cap`` / audit how many pairs hot-bucket sub-splitting
    will forgo on a given corpus."""
    return (
        df.select(hyperplane_signature(quantize(F.col(vec_col), scale), n_planes, dim).alias("sig"))
        .groupBy("sig")
        .agg(F.count("*").alias("n"))
    )


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 16,
    dim: int = 64,
    round_to: int = 4,
    scale: int = QUANT_SCALE,
    bucket_cap: int = 1000,
    exact_cols: bool = False,
    snm_window: int = 2,
) -> DataFrame:
    """Embedding near-dup pairs: bucket on the hyperplane signature of
    the quantized embedding, exact-cosine verify within buckets.
    Recall < 1 by LSH nature; the exact variant is a plain self-join
    (see brute_force_topk).

    All arithmetic is integer (quantize(scale)) until the final
    cosine division, whose operands (dot, norm²) are exact longs — so
    the emitted cosine is bit-identical across engines.

    Hot-bucket guard: a near-duplicate-heavy corpus (the target
    workload) can put O(n) rows into ONE signature bucket, turning the
    self-join O(n²). Buckets larger than ``bucket_cap`` are sub-split
    on ``id mod ceil(n/bucket_cap)`` — bounding every join group at
    ~bucket_cap rows at the cost of missing pairs that straddle
    sub-buckets (disclosed recall trade; audit with lsh_bucket_stats).
    The sub-split key is derived from the id, not a random salt, so
    results stay deterministic and oracle-reproducible.

    Sorted-neighborhood stitch (``snm_window``, round 4): the
    sub-split alone shatters an adversarial all-near-identical bucket
    into k disconnected sub-cliques — a downstream connected-components
    dedup would keep k representatives instead of 1. Within hot
    buckets ONLY (k > 1), each row is additionally paired with its
    next ``snm_window`` neighbors in (quantized-component-0, id) sort
    order — pure window ``lead``s over the same ``sig`` partitioning
    (no extra join), O(n·w) extra candidates. Pairs whose endpoints
    share a sub-bucket are filtered out (the join already emits them),
    and every stitched pair passes the SAME exact threshold predicate.
    Guarantee: pair ENUMERATION within hot buckets stays intentionally
    capped at O(n·bucket_cap + n·w) — never O(n²) — but near-identical
    members become adjacent under the sort, so the stitched chain
    connects the cluster and component-level recall (what dedup
    consumes) is restored to 1 on the adversarial corpus
    (tests/test_similarity_lsh.py; measured numbers in NOTES.md).
    Cost: one additional evaluation of the signature branch (the
    self-join already evaluates it twice); the per-bucket SORT runs
    only on hot-bucket rows (the filter precedes the ordered window).
    ``snm_window=0`` disables the stitch (the round-3 behavior).

    Threshold semantics: the cutoff is applied as the EXACT integer
    predicate  dot≥0 ∧ 1e8·dot² ≥ t4²·na2·nb2  (t4 = round(t·1e4),
    DECIMAL(38,0) arithmetic — no doubles, so the kept pair-set is
    bit-identical on any engine; for t<0 the disjunctive mirror keeps
    cosine ≥ t exactly). With ``exact_cols=True`` the output carries
    the exact long columns (dot_q, na2_q, nb2_q) instead of a derived
    double ``cosine`` — use this whenever downstream comparison must
    be bit-exact (Spark rounds doubles through Java BigDecimal, DuckDB
    through float multiply-shift; the two differ in the last ULP)."""
    sigs = df.select(
        F.col(id_col).alias("_id"),
        quantize(F.col(vec_col), scale).alias("_q"),
    ).withColumn("sig", hyperplane_signature(F.col("_q"), n_planes, dim))
    # bucket-size window: same shuffle key as the join itself, so AQE
    # reuses the exchange; k sub-buckets per hot signature
    wb = Window.partitionBy("sig")
    sigs = sigs.withColumn(
        "_k",
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.count("*").over(wb) / F.lit(bucket_cap)).cast("long"),
        ),
    )
    # Sub-split key: only hot buckets (_k > 1) need one. The id must
    # cast to long for the mod to be deterministic AND oracle-portable
    # (the SQL mirror is `id % k`); a non-castable id would turn the
    # key null and silently drop every hot-bucket pair — fail loudly
    # instead (raise_error fires only on hot-bucket rows with a null
    # cast, so string-digit ids and cold corpora still work).
    idl = F.col("_id").cast("long")
    sigs = sigs.withColumn(
        "sub",
        F.when(F.col("_k") <= 1, F.lit(0).cast("long")).otherwise(
            F.pmod(
                F.coalesce(
                    idl,
                    F.raise_error(
                        f"lsh_neardup_pairs: id_col '{id_col}' must cast to long "
                        "for the deterministic hot-bucket sub-split"
                    ).cast("long"),
                ),
                F.col("_k"),
            )
        ),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    na2 = int_dot(F.col("a._q"), F.col("a._q"))
    nb2 = int_dot(F.col("b._q"), F.col("b._q"))
    pairs = (
        a.join(b, ["sig", "sub"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            int_dot(F.col("a._q"), F.col("b._q")).alias("dot_q"),
            na2.alias("na2_q"),
            nb2.alias("nb2_q"),
        )
    )
    if snm_window > 0:
        # stitch hot buckets: lead() pairs in sort order; only rows in
        # hot buckets (_k > 1) are sorted — filtering first keeps whole
        # buckets (k is bucket-level), so cold corpora pay nothing
        hot = sigs.filter(F.col("_k") > 1)
        ws = Window.partitionBy("sig").orderBy(
            F.col("_q")[0].asc(), F.col("_id").asc()
        )
        nbrs = F.array(*[
            F.struct(
                F.lead("_id", i).over(ws).alias("nid"),
                F.lead("_q", i).over(ws).alias("nq"),
            )
            for i in range(1, snm_window + 1)
        ])
        e = (
            hot.select("_id", "_q", "_k", nbrs.alias("_nbrs"))
            .select("_id", "_q", "_k", F.explode("_nbrs").alias("n"))
            .filter(F.col("n.nid").isNotNull())
            # same sub-bucket ⇒ the join above already emitted the pair
            .filter(
                F.pmod(F.col("_id").cast("long"), F.col("_k"))
                != F.pmod(F.col("n.nid").cast("long"), F.col("_k"))
            )
        )
        # normalize to id_a < id_b with the same comparison semantics
        # as the join (original id type)
        swap = F.col("_id") < F.col("n.nid")
        stitched = e.select(
            F.when(swap, F.col("_id")).otherwise(F.col("n.nid")).alias("id_a"),
            F.when(swap, F.col("n.nid")).otherwise(F.col("_id")).alias("id_b"),
            int_dot(F.col("_q"), F.col("n.nq")).alias("dot_q"),
            F.when(swap, int_dot(F.col("_q"), F.col("_q")))
            .otherwise(int_dot(F.col("n.nq"), F.col("n.nq"))).alias("na2_q"),
            F.when(swap, int_dot(F.col("n.nq"), F.col("n.nq")))
            .otherwise(int_dot(F.col("_q"), F.col("_q"))).alias("nb2_q"),
        )
        pairs = pairs.unionByName(stitched)
    # exact integer threshold: cosine ≥ t  ⟺  dot ≥ t·√(na2·nb2);
    # squared with t quantized to 1e-4 — all DECIMAL(38,0), no doubles
    t4 = int(round(threshold * 10000))
    dec = "decimal(38,0)"
    dd = F.col("dot_q").cast(dec)
    lhs = dd * dd * F.lit(10 ** 8).cast(dec)
    rhs = (
        F.lit(t4 * t4).cast(dec)
        * F.col("na2_q").cast(dec)
        * F.col("nb2_q").cast(dec)
    )
    if t4 >= 0:
        pairs = pairs.filter((F.col("dot_q") >= 0) & (lhs >= rhs))
    else:
        pairs = pairs.filter((F.col("dot_q") >= 0) | (lhs <= rhs))
    if exact_cols:
        return pairs
    return pairs.select(
        "id_a",
        "id_b",
        F.round(
            F.col("dot_q").cast("double")
            / (
                F.sqrt(F.col("na2_q").cast("double"))
                * F.sqrt(F.col("nb2_q").cast("double"))
            ),
            round_to,
        ).alias("cosine"),
    )
