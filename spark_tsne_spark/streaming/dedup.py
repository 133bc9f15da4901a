"""Streaming deduplication — continuous-ingest twin of the batch
exact-dedup operator.

A training-data pipeline that ingests continuously cannot re-run
batch dedup over the whole corpus per batch; the streaming form keys
state by content fingerprint and lets the watermark bound it:
``dropDuplicatesWithinWatermark`` keeps a fingerprint only until the
event-time watermark passes its horizon, so state scales with the
dedup window's traffic, not corpus size. (Plain ``dropDuplicates`` on
a stream would grow state forever.)

The reference has no streaming layer (SURVEY.md §1); this extends the
engine's Structured Streaming surface alongside the windowed aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spark_tsne_spark.functions.text import fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit the first-seen document per content fingerprint; a
    duplicate arriving within ``watermark`` event-time of the first
    copy is dropped. Fingerprint = md5 of the whitespace-normalized,
    lowercased text (same normalization as batch ``exact_dedup``), so
    the streaming and batch keep-sets agree on bounded input."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
