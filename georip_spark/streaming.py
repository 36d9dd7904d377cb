"""Structured-Streaming ingestion over the contract docs table.

The reference is a batch engine (SURVEY.md §2.10) and the north_star
pipeline is batch; this module is the "beyond the reference" streaming
surface a training-data platform needs: docs arriving continuously
(crawl output, annotation drops) flow through the SAME engine
transformations — `pipeline.tiles_from_docs` is already stream-safe
(stream-static join + explode + column math, no action inside) — so
the batch and streaming paths cannot drift.

Patterns used (all standard Spark Structured Streaming):
- file-source `readStream` with an explicit schema (streams cannot
  infer), trigger `availableNow` for deterministic catch-up runs,
- stream-static join against the raster-metadata dim,
- watermarked windowed aggregation for span-arrival stats,
- `dropDuplicatesWithinWatermark` for streaming exact dedup on a
  content fingerprint (the streaming analog of operators/dedup.py's
  md5 groups; state is bounded by the watermark).

At scale: the file source lists incrementally; each micro-batch is
the same narrow plan as the batch DAG, so executor sizing follows the
batch guidance. State stores only hold (fingerprint → seen) within
the watermark horizon — bounded, spillable, and partitioned by the
dedup key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the contract docs schema (BASELINE.json input_hint) + an arrival
# timestamp for watermarking
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def stream_docs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """readStream over a docs directory (parquet by default). The
    schema is the contract schema; files dropped into `path` become
    micro-batches."""
    return spark.readStream.format(fmt).schema(DOCS_SCHEMA).load(path)


def stream_tiles(docs_stream: DataFrame, rasters: DataFrame) -> DataFrame:
    """Streaming tile derivation: the batch `tiles_from_docs` applied
    to a stream (stream-static inner join + explode — both supported
    without a state store)."""
    from georip_spark.pipeline import tiles_from_docs

    return tiles_from_docs(docs_stream.drop("event_ts"), rasters)


def stream_span_stats(
    docs_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed span-arrival stats: docs per window plus
    media/text span counts — the monitoring aggregate a continuous
    ingest needs. Late docs beyond the watermark are dropped (state
    stays bounded)."""
    e = docs_stream.withWatermark("event_ts", watermark)
    return (
        e.select(
            "event_ts",
            F.size("spans").alias("n_spans"),
            F.size(F.filter("spans", lambda s: s["kind"] == "media")).alias("n_media"),
        )
        .groupBy(F.window("event_ts", window).alias("w"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_spans").alias("spans"),
            F.sum("n_media").alias("media_spans"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "docs",
            "spans",
            "media_spans",
        )
    )


def doc_content(spans_col) -> "F.Column":
    """Serialize a spans array to the canonical content string — the
    SHARED identity between streaming dedup here and batch
    `exact_dup_groups` (tested equal row-for-row): md5(doc_content)
    is the fingerprint on both paths.

    Each field is null-normalized BEFORE the join: concat_ws silently
    skips nulls, so without the coalesce a span (kind, text='x',
    media_ref=null) and (kind, text=null, media_ref='x') would both
    serialize to 'kind\\x1ex' and one distinct doc would be wrongly
    dropped as a duplicate (ADVICE round 3). '\\x00' preserves field
    position for null values and cannot collide with real text."""
    def _f(field):
        return F.coalesce(field, F.lit("\x00"))

    return F.concat_ws(
        "\x1f",
        F.transform(
            spans_col,
            lambda s: F.concat_ws(
                "\x1e", _f(s["kind"]), _f(s["text"]), _f(s["media_ref"])
            ),
        ),
    )


def stream_exact_dedup(
    docs_stream: DataFrame,
    watermark: str = "10 minutes",
    fingerprint: "F.Column | None" = None,
) -> DataFrame:
    """Streaming exact dedup: first arrival per content fingerprint
    survives; re-arrivals within the watermark horizon are dropped.
    Default fingerprint = md5(doc_content(spans)) — the same content
    identity operators/dedup.py's exact_dup_groups computes in batch;
    pass ``fingerprint`` to dedup a differently-shaped stream (e.g.
    the flat documents table keyed on md5(text), q37's driver gate)."""
    fp = fingerprint if fingerprint is not None else F.md5(
        doc_content(F.col("spans"))
    )
    return (
        docs_stream.withColumn("fingerprint", fp)
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_availablenow(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming DataFrame over all currently-available
    input (trigger=availableNow) into an in-memory sink and return
    the result as a batch DataFrame — the deterministic harness used
    by tests and backfills.

    Gotcha encoded here: append-mode WINDOWED aggregations emit a
    window only after the watermark passes its end, which a single
    availableNow batch never triggers — run aggregations with
    output_mode='complete'; stateless transforms and
    dropDuplicatesWithinWatermark use the default 'append'."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
