"""Similarity / embedding near-dup operator tests (SURVEY.md LLM-ops).

Covers the hot-bucket guard added in round 2: a duplicate-heavy
corpus (the target workload of near-dup detection) collapses into one
LSH signature bucket; the sub-split must bound the self-join while
still finding duplicates inside each sub-bucket.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from georip_spark.operators.similarity import (
    QUANT_SCALE,
    brute_force_topk,
    lsh_bucket_stats,
    lsh_neardup_pairs,
    quantize,
)


def _unit(seed: int, dim: int = 8) -> list[float]:
    vals = [math.sin(seed * 13.7 + i * 2.31) for i in range(dim)]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


@pytest.fixture(scope="module")
def dup_heavy(spark):
    """200 vectors, 90% exact copies of one vector → one hot bucket."""
    base = _unit(1)
    rows = [(i, base if i < 180 else _unit(100 + i)) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestLshNeardup:
    def test_hot_bucket_subsplit_bounds_join(self, spark, dup_heavy):
        cap = 20
        pairs = lsh_neardup_pairs(
            dup_heavy, threshold=0.999, n_planes=4, dim=8, bucket_cap=cap
        )
        got = pairs.collect()
        # the 180 duplicates share sig; k = ceil(180+/cap) sub-buckets.
        # every emitted pair must be a true near-dup...
        assert all(r["cosine"] >= 0.999 for r in got)
        # ...and the sub-split must have cut the quadratic blow-up:
        # uncapped would emit C(180,2)=16110 duplicate pairs.
        n_dup_pairs = sum(1 for r in got if r["id_a"] < 180 and r["id_b"] < 180)
        assert 0 < n_dup_pairs < 16110
        # per-sub group ≈ 180/k rows → pairs per sub ≈ C(180/k, 2),
        # plus ≤ n·snm_window sorted-neighborhood stitch pairs
        k = math.ceil(200 / cap)  # ≥ dup-bucket's k (bucket ≤ 200 rows)
        per_sub = math.ceil(180 / math.ceil(180 / cap)) + 1
        bound = math.ceil(180 / cap) * per_sub * (per_sub - 1) / 2 + 180 * 2
        assert n_dup_pairs <= bound

    def test_small_buckets_unaffected_by_cap(self, spark, dup_heavy):
        """cap larger than any bucket ⇒ identical results to uncapped."""
        lo = lsh_neardup_pairs(dup_heavy, threshold=0.5, n_planes=4, dim=8,
                               bucket_cap=10_000)
        hi = lsh_neardup_pairs(dup_heavy, threshold=0.5, n_planes=4, dim=8,
                               bucket_cap=100_000)
        assert sorted(map(tuple, lo.collect())) == sorted(map(tuple, hi.collect()))

    def test_bucket_stats_histogram(self, spark, dup_heavy):
        stats = lsh_bucket_stats(dup_heavy, n_planes=4, dim=8).collect()
        assert max(r["n"] for r in stats) >= 180  # the hot bucket is visible
        assert sum(r["n"] for r in stats) == 200

    def test_quantized_cosine_matches_numpy(self, spark):
        import numpy as np

        a = _unit(3)
        b = [v + (0.01 if i == 0 else 0.0) for i, v in enumerate(a)]  # near-dup → same bucket
        df = spark.createDataFrame(
            [(0, a), (1, b)], "vec_id long, embedding array<float>"
        )
        pairs = lsh_neardup_pairs(df, threshold=-1.0, n_planes=4, dim=8).collect()
        assert len(pairs) == 1
        av, bv = np.asarray(a), np.asarray(b)
        want = float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)))
        assert abs(pairs[0]["cosine"] - want) < 2e-3  # quantization error ≤ ~1e-4·dim

    def test_quantize_roundtrip(self, spark):
        df = spark.createDataFrame([([0.12345, -0.5, 0.0],)], "v array<float>")
        got = df.select(quantize(F.col("v"), 10000).alias("q")).collect()[0]["q"]
        assert got == [1235, -5000, 0]  # floor(v·1e4 + .5)


class TestBruteForceTopk:
    def test_exact_topk(self, spark):
        corpus = spark.createDataFrame(
            [(i, _unit(i)) for i in range(20)], "vec_id long, embedding array<float>"
        )
        queries = spark.createDataFrame(
            [(0, _unit(3))], "q_id long, q_vec array<float>"
        )
        got = brute_force_topk(corpus, queries, k=3).orderBy("rank").collect()
        assert [r["vec_id"] for r in got][0] == 3  # self is nearest
        assert len(got) == 3


class TestAnnRecall:
    def test_ann_recall_clustered(self, spark):
        """Recall gate for the q34 scale path (round-5 VERDICT #4):
        on a deterministic clustered corpus in the near-dup regime
        (within-cluster cos ≈ 0.9 — what embedding dedup/similarity
        search targets), the multi-table OR-construction (n_planes=12,
        n_tables=4, Hamming-1 probes) must recover ≥ 0.9 of the exact
        top-10. Everything is seeded/deterministic, so the measured
        recall is a constant, not a flake. The full sweep — including
        the weak-neighbor regime where sub-linear LSH fundamentally
        can't reach this — is recorded by jobs/ann_recall.py in
        NOTES.md."""
        import numpy as np

        from georip_spark.operators.similarity import ann_topk_lsh

        dim, n, n_q, k = 64, 2000, 50, 10
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, 20, n)
        pts = centers[assign] + 0.05 * rng.standard_normal((n, dim))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        qs = centers[assign[:n_q]] + 0.05 * rng.standard_normal((n_q, dim))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        corpus = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        queries = spark.createDataFrame(
            [(int(i), [float(x) for x in qs[i]]) for i in range(n_q)],
            "q_id long, q_vec array<float>",
        )
        exact = brute_force_topk(corpus, queries, k).select("q_id", "vec_id")
        ann = ann_topk_lsh(
            corpus, queries, k, n_planes=12, dim=dim, n_tables=4
        ).select("q_id", "vec_id")
        hits = exact.join(ann, ["q_id", "vec_id"]).count()
        recall = hits / (k * n_q)
        assert recall >= 0.9, f"recall@10 = {recall}"

    def test_ivf_recall_clustered(self, spark):
        """Recall gate for the IVF cell-partitioned scale path
        (round 5): same deterministic clustered corpus as the LSH
        gate; with 32 sample centroids and n_probe=6 the inverted
        file must recover ≥ 0.9 of the exact top-10 while scanning
        ≈ n_probe/n_centroids of the corpus. Deterministic fixture →
        measured recall is a constant."""
        import numpy as np

        from georip_spark.operators.similarity import ann_topk_ivf

        dim, n, n_q, k = 64, 2000, 50, 10
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, 20, n)
        pts = centers[assign] + 0.05 * rng.standard_normal((n, dim))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        qs = centers[assign[:n_q]] + 0.05 * rng.standard_normal((n_q, dim))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        corpus = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        queries = spark.createDataFrame(
            [(int(i), [float(x) for x in qs[i]]) for i in range(n_q)],
            "q_id long, q_vec array<float>",
        )
        exact = brute_force_topk(corpus, queries, k).select("q_id", "vec_id")
        ann = ann_topk_ivf(
            corpus, queries, k, n_centroids=32, n_probe=6
        ).select("q_id", "vec_id")
        hits = exact.join(ann, ["q_id", "vec_id"]).count()
        recall = hits / (k * n_q)
        assert recall >= 0.9, f"ivf recall@10 = {recall}"
