"""Structured-Streaming surface (georip_spark/streaming.py):
batch/stream parity of the tile derivation, watermarked span stats,
and streaming exact dedup. Deterministic via trigger=availableNow
over a static file drop."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from georip_spark import streaming as S


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """A docs parquet drop: synth docs from 12 rasters + event_ts."""
    from georip_spark import synth

    rasters = synth.synth_rasters(spark, 12)
    docs = synth.synth_docs(spark, rasters)
    t0 = int(dt.datetime(2026, 1, 1, 12, 0, 0).timestamp())
    docs = docs.withColumn(
        "event_ts",
        F.timestamp_seconds(F.lit(t0) + F.crc32(F.col("doc_id")) % 180),
    )
    path = str(tmp_path_factory.mktemp("docs_stream"))
    docs.write.mode("overwrite").parquet(path)
    return path, rasters, docs


class TestStreaming:
    def test_stream_tiles_matches_batch(self, spark, docs_dir):
        path, rasters, docs = docs_dir
        from georip_spark.pipeline import tiles_from_docs

        stream = S.stream_docs(spark, path)
        got = S.run_availablenow(
            S.stream_tiles(stream, rasters), "t_tiles"
        )
        want = tiles_from_docs(docs.drop("event_ts"), rasters)
        g = {tuple(r) for r in got.select("doc_id", "media_ref", "ordinal").collect()}
        w = {tuple(r) for r in want.select("doc_id", "media_ref", "ordinal").collect()}
        assert g == w and len(g) > 0

    def test_span_stats_windowed(self, spark, docs_dir):
        path, _, docs = docs_dir
        stream = S.stream_docs(spark, path)
        got = S.run_availablenow(
            S.stream_span_stats(stream, window="1 minute"),
            "t_stats",
            output_mode="complete",
        )
        rows = got.collect()
        assert sum(r["docs"] for r in rows) == docs.count()
        total_spans = docs.selectExpr("sum(size(spans)) s").collect()[0]["s"]
        assert sum(r["spans"] for r in rows) == total_spans
        # synth docs are all media spans
        assert sum(r["media_spans"] for r in rows) == total_spans

    def test_stream_exact_dedup(self, spark, docs_dir, tmp_path):
        path, _, docs = docs_dir
        # re-drop every doc a second time with a later timestamp:
        # 2x files, same fingerprints — dedup must keep one per doc
        dup_dir = str(tmp_path / "dup_docs")
        docs.write.parquet(dup_dir)
        docs.withColumn(
            "event_ts", F.col("event_ts") + F.expr("INTERVAL 30 SECONDS")
        ).write.mode("append").parquet(dup_dir)
        stream = S.stream_docs(spark, dup_dir)
        got = S.run_availablenow(S.stream_exact_dedup(stream), "t_dedup")
        assert got.count() == docs.count()
        assert got.select("fingerprint").distinct().count() == docs.count()
