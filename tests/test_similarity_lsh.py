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
