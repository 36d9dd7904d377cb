"""Adversarial hot-bucket recall audit (VERDICT r3 #5).

Corpus: 10⁴ near-identical embeddings that all land in ONE LSH
signature bucket (every pair is a true near-dup above threshold) —
the worst case for the bucket_cap sub-split, whose id%k shattering
alone caps pair recall at ~1/k AND splits the single true component
into k pieces (a downstream CC dedup would keep k representatives
instead of 1).

Measured here and recorded in NOTES.md:
- pair recall of the sub-split alone (~1/k by design — the cap is
  exactly what bounds the join away from O(n²); disclosed),
- component recall after the round-4 sorted-neighborhood stitch:
  the stitched pair graph reconnects the cluster → ONE component,
  ONE keeper — what the dedup endpoint actually consumes.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from georip_spark.operators.similarity import lsh_bucket_stats, lsh_neardup_pairs

N = 10_000
CAP = 1_000
DIM = 16
PLANES = 8


@pytest.fixture(scope="module")
def adversarial(spark):
    """N near-identical unit-ish vectors: base + {0,1,2}·1e-4 on
    component 0 — perturbation is ≤ 2 quantized units, far below any
    hyperplane projection's margin, so all N share one signature and
    every pair's cosine is ≥ 0.9999."""
    base = [0.25 if i % 3 else 0.35 for i in range(DIM)]
    rows = [
        (i, [base[0] + (i % 3) * 1e-4] + base[1:])
        for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestAdversarialHotBucket:
    def test_single_bucket_fixture(self, spark, adversarial):
        stats = lsh_bucket_stats(adversarial, n_planes=PLANES, dim=DIM).collect()
        assert len(stats) == 1 and stats[0]["n"] == N

    def test_subsplit_alone_pair_recall_is_1_over_k(self, spark, adversarial):
        k = math.ceil(N / CAP)
        pairs = lsh_neardup_pairs(
            adversarial, threshold=0.999, n_planes=PLANES, dim=DIM,
            bucket_cap=CAP, snm_window=0,
        )
        got = pairs.count()
        true_pairs = N * (N - 1) // 2
        recall = got / true_pairs
        # bounded away from O(n²) — and honestly low: ~1/k
        assert got == k * (N // k) * (N // k - 1) // 2
        assert abs(recall - 1 / k) < 0.01

    def test_snm_stitch_restores_component_recall(self, spark, adversarial):
        from georip_spark.operators.dissolve import connected_components

        pairs = lsh_neardup_pairs(
            adversarial, threshold=0.999, n_planes=PLANES, dim=DIM,
            bucket_cap=CAP, snm_window=2,
        )
        # stitch adds ≤ N·w extra pairs — still nowhere near O(n²)
        k = math.ceil(N / CAP)
        join_pairs = k * (N // k) * (N // k - 1) // 2
        n_pairs = pairs.count()
        assert join_pairs < n_pairs <= join_pairs + N * 2
        # the pair graph must now be ONE component → one keeper
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        vertices = adversarial.select(F.col("vec_id").alias("geom_id"))
        comps = connected_components(edges, vertices)
        n_components = comps.select("component").distinct().count()
        assert n_components == 1


class TestAnnTopK:
    """ann_topk_lsh (round 4): the LSH-bucketed scale path for
    similarity search, vs brute_force_topk as ground truth."""

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        # 5 well-separated direction clusters x 40 members; member
        # perturbation (<= 2 quantized units on one component) keeps a
        # cluster inside one signature bucket
        rows = []
        for c in range(5):
            base = [0.9 if i == c else 0.1 for i in range(DIM)]
            for m in range(40):
                vid = c * 40 + m
                rows.append((vid, [base[0] + (m % 3) * 1e-4] + base[1:]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_recall_vs_brute_force(self, spark, clustered):
        from georip_spark.operators.similarity import (
            ann_topk_lsh,
            brute_force_topk,
        )

        q = clustered.filter(F.col("vec_id") % 40 == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        ann = ann_topk_lsh(
            clustered, q, k=10, n_planes=PLANES, dim=DIM, exclude_self=True
        )
        rows = ann.collect()
        # 10 results per query, and every one a TRUE neighbor (same
        # cluster; within-cluster cosine ~1 vs ~0.33 across clusters).
        # Note exact-set comparison vs brute_force_topk is meaningless
        # here: the 39 same-cluster members tie to 3 score values, and
        # brute force ranks by ROUND(dot,4)+id while ann ranks by the
        # exact cosine, so the two pick different members of the tie
        # group — cluster membership is the invariant that matters.
        assert len(rows) == 50
        for r in rows:
            assert r["vec_id"] // 40 == r["q_id"] // 40
        # and brute force agrees at cluster level on its own top-10
        exact = brute_force_topk(clustered, q, k=10)
        for r in exact.filter(F.col("vec_id") != F.col("q_id")).collect():
            assert r["vec_id"] // 40 == r["q_id"] // 40

    def test_exact_integer_scores_and_determinism(self, spark, clustered):
        from georip_spark.operators.similarity import ann_topk_lsh

        q = clustered.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        a = ann_topk_lsh(clustered, q, k=5, n_planes=PLANES, dim=DIM,
                         exclude_self=True)
        r1 = [tuple(r) for r in a.orderBy("rank").collect()]
        r2 = [tuple(r) for r in a.orderBy("rank").collect()]
        assert r1 == r2 and len(r1) == 5
        # exact longs: nq2_q is the query's quantized norm-squared,
        # constant across the result set
        nq2 = {r[3] for r in r1}
        assert len(nq2) == 1 and r1[0][3] > 0
