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
    n_tables: int = 1,
    hamming2: bool = False,
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
    it — and, with ``hamming2``, the C(n_planes,2) buckets at Hamming
    distance 2. Within one table a corpus row matches at most one
    probe per query (probe values are distinct).

    Multi-table (``n_tables`` > 1): the standard OR-construction —
    table t signs against the disjoint plane slice
    [t·n_planes, (t+1)·n_planes) of the same deterministic family and
    candidates are the UNION across tables, deduplicated on
    (query, corpus id) before scoring. Recall compounds as
    1−(1−r₁)ᴸ while the corpus side stays scan-stage column math
    (the per-table signatures explode corpus rows ×L with no
    shuffle). Measured on the clustered 5000×64 fixture
    (within-cluster cos ≈ 0.9, jobs/ann_recall.py): one table at
    n_planes=16 reads recall@10 ≈ 0.3; n_planes=12 × 4 tables ≈ 0.93
    at ~6% of the corpus scored; +hamming2 ≈ 0.99.

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
    measures recall on a sample (jobs/ann_recall.py records the
    table)."""
    scored = ann_candidates(
        corpus, queries, id_col, vec_col, q_id_col, q_vec_col,
        n_planes, dim, hamming_probes, scale, exclude_self, n_tables,
        hamming2,
    ).select(
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


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    n_centroids: int = 16,
    n_probe: int = 4,
    scale: int = QUANT_SCALE,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the cell-partitioned ANN scale path next to ``ann_topk_lsh``'s
    hash-bucketed one.

    Coarse quantizer (disclosed): the ``n_centroids`` corpus vectors
    with the smallest ids — the standard random-sample bootstrap of
    IVF *before* k-means refinement (Lloyd iterations are
    data-dependent and not oracle-expressible; a deterministic
    centroid set is, which is what makes this path driver-gateable).
    Collected driver-side (one TakeOrdered over ≪ the corpus) and
    folded into the assignment expression as literals.

    Plan shape at 100 TB: corpus→cell assignment is scan-stage column
    math (``array_max`` over ``n_centroids`` struct(cos, −cid)
    expressions — no shuffle, no Python, exactly like the LSH
    signature stage); the probe side (|Q|·n_probe rows) is broadcast,
    so the cell join keeps the corpus partitioning; the only shuffle
    is the per-query rank window over candidates (≈ n_probe/n_centroids
    of the corpus per query). A corpus row lives in exactly ONE cell,
    so no candidate dedup is needed (unlike multi-table LSH).

    Engine-portability: assignment and ranking order by the double
    CAST(dot AS DOUBLE)/(√nrow2·√ncent2) computed from exact integer
    inputs — bit-identical on any engine (q24's lesson) — with ties
    broken toward the smaller centroid/corpus id. The output carries
    the exact longs.

    Recall trade (disclosed): a true neighbor assigned to a cell the
    query doesn't probe is missed; raising ``n_probe`` trades scan
    fraction for recall (jobs/ann_recall.py records the measured
    curve next to the LSH table)."""
    cq = corpus.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("_cq")
    )
    cents = (
        cq.orderBy(id_col).limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("_cq").alias("_cv"))
        .collect()
    )
    cent_rows = [(int(r["cid"]), [int(v) for v in r["_cv"]]) for r in cents]

    def cos_struct(vec: Column, n2: Column, cid: int, cv: list[int]):
        lit = F.array(*[F.lit(v).cast("long") for v in cv])
        n2c = sum(v * v for v in cv)
        cosd = int_dot(vec, lit).cast("double") / (
            F.sqrt(n2.cast("double")) * F.sqrt(F.lit(float(n2c)))
        )
        return F.struct(
            cosd.alias("s"),
            F.lit(-cid).cast("long").alias("ncid"),
            F.lit(cid).cast("long").alias("cid"),
        )

    # corpus: argmax over the centroid structs = (cos desc, cid asc).
    # The row norm² is computed once here and CARRIED through the join
    # (recomputing it per candidate would pay an O(dim) fold per pair)
    c = cq.withColumn("_cn2", int_dot(F.col("_cq"), F.col("_cq"))).select(
        F.col(id_col),
        F.col("_cq"),
        F.col("_cn2"),
        F.array_max(
            F.array(*[
                cos_struct(F.col("_cq"), F.col("_cn2"), cid, cv)
                for cid, cv in cent_rows
            ])
        )["cid"].alias("cell"),
    )
    # queries: top-n_probe cells = the leading slice of the structs
    # sorted descending — |Q| rows, stays broadcast-side
    q = queries.select(
        F.col(q_id_col), quantize(F.col(q_vec_col), scale).alias("_qq")
    ).withColumn("_qn2", int_dot(F.col("_qq"), F.col("_qq")))
    qp = q.select(
        F.col(q_id_col),
        F.col("_qq"),
        F.col("_qn2"),
        F.explode(
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.array(*[
                            cos_struct(F.col("_qq"), F.col("_qn2"), cid, cv)
                            for cid, cv in cent_rows
                        ])
                    )
                ),
                1,
                n_probe,
            )["cid"]
        ).alias("cell"),
    )
    cand = c.join(F.broadcast(qp), "cell")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(q_id_col))
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        int_dot(F.col("_qq"), F.col("_cq")).alias("dot_q"),
        F.col("_qn2").alias("nq2_q"),
        F.col("_cn2").alias("nc2_q"),
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


def ann_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    n_planes: int = 16,
    dim: int = 64,
    hamming_probes: bool = True,
    scale: int = QUANT_SCALE,
    exclude_self: bool = False,
    n_tables: int = 1,
    hamming2: bool = False,
) -> DataFrame:
    """The candidate-generation stage of ``ann_topk_lsh``, exposed so
    recall/efficiency audits (jobs/ann_recall.py) measure the exact
    candidate set the ranker scores. Returns one row per distinct
    (query, corpus id) pair landing in any probed bucket of any
    table, carrying the quantized vectors ``_qq``/``_cq``."""
    # join key packs (table, sig) into one long: sig < 2^n_planes
    def packed(sig: Column, t: int) -> Column:
        return sig + F.lit(t << n_planes).cast("long")

    c = corpus.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("_cq")
    ).select(
        F.col(id_col),
        F.col("_cq"),
        F.explode(
            F.array(*[
                packed(
                    hyperplane_signature(
                        F.col("_cq"), n_planes, dim, plane_offset=t * n_planes
                    ),
                    t,
                )
                for t in range(n_tables)
            ])
        ).alias("sig"),
    )
    q = queries.select(
        F.col(q_id_col), quantize(F.col(q_vec_col), scale).alias("_qq")
    )
    probes = []
    for t in range(n_tables):
        sig_t = hyperplane_signature(
            F.col("_qq"), n_planes, dim, plane_offset=t * n_planes
        )
        flips = [0]
        if hamming_probes:
            flips += [1 << p for p in range(n_planes)]
        if hamming2:
            flips += [
                (1 << a) | (1 << b)
                for a in range(n_planes)
                for b in range(a + 1, n_planes)
            ]
        probes += [
            packed(sig_t.bitwiseXOR(F.lit(m).cast("long")), t) for m in flips
        ]
    qp = q.select(
        F.col(q_id_col), F.col("_qq"), F.explode(F.array(*probes)).alias("sig")
    )
    cand = c.join(F.broadcast(qp), "sig")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(q_id_col))
    if n_tables > 1:
        # a pair can match in several tables; one shuffle of the small
        # candidate set (≪ N·Q) dedups before scoring so the rank
        # window sees each pair once
        cand = cand.dropDuplicates([q_id_col, id_col])
    return cand.select(F.col(q_id_col), F.col(id_col), "_qq", "_cq")


def hyperplane_signature(
    qvec: Column, n_planes: int = 16, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH signature as a long bitmask over a
    QUANTIZED (array<long>) embedding: bit p is the sign of <q, h_P>
    (P = plane_offset + p) where h_P is a deterministic ±1 hyperplane
    derived from (P, i) arithmetic — engine-portable, no stored
    planes, and the projection is an exact integer sum (no float
    fold-order divergence).

    Plane family (round 5): h_P[i] = +1 iff two Lehmer-MINSTD steps of
    the seed (P·1009 + i·9176 + P·i·31 + 1) mod 65521 land below half
    of 2³¹−1. The P·i CROSS term matters: an affine-only seed makes
    every plane a shifted copy of one base ±1 sequence (the round-4
    family collapsed further — mod 7 left only SEVEN distinct planes,
    measured pairwise |corr| up to 0.94 and ANN recall@10 ≈ 0.1).
    This family measures |corr| mean 0.09 over 80 planes, all
    distinct. All intermediates < 2⁶³ (no ANSI overflow); ±1 balance
    within 0.06 mean bias.

    ``plane_offset`` selects a disjoint slice of the family so
    multi-table LSH (see ``ann_topk_lsh`` n_tables) gets independent
    tables from the same arithmetic."""
    def plane_sign(p: int):
        def f(x, i):
            seed = (
                F.lit(p * 1009).cast("long") + i.cast("long") * 9176
                + i.cast("long") * (31 * p) + 1
            ) % 65521
            y = ((seed * 48271) % 2147483647 * 48271) % 2147483647
            return x * F.when(
                y < 1073741824, F.lit(1).cast("long")
            ).otherwise(F.lit(-1).cast("long"))
        return f

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                qvec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                plane_sign(plane_offset + p),
            ),
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
