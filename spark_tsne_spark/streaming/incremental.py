"""Streaming ingestion dedup: foreachBatch against a growing
fingerprint index.

``dropDuplicatesWithinWatermark`` (streaming/dedup.py) dedups WITHIN
the stream's watermark horizon; this module is the other half of the
production contract — each micro-batch is also checked against the
PERSISTED corpus fingerprint index (every document ever accepted), so
a re-crawled page from last month is still dropped. The same pattern
as the batch ``incremental_exact_flags`` (operators/dedup.py), driven
continuously by Structured Streaming's ``foreachBatch``.

Scale + semantics notes:

- The index join is a semi/anti join on an md5 key — uniform, and at
  scale the index parquet is bucketed by fingerprint so the per-batch
  join is exchange-free on the index side.
- ``foreachBatch`` is at-least-once: on batch replay the rows' own
  fingerprints are already in the index, so the replayed batch emits
  nothing — the fingerprint index makes reprocessing self-cleaning
  (idempotent output up to a torn write of one batch's two appends,
  which a transactional table format would close).
- State lives in PARQUET, not the state store: the index survives
  restarts, is shared with batch jobs, and is unbounded by the
  watermark — exactly what the in-stream dedup cannot give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_tsne_spark.functions.text import fingerprint


def _index_fps(spark: SparkSession, index_path: str) -> DataFrame:
    """The persisted fingerprint set; empty frame if no index yet."""
    try:
        return spark.read.parquet(index_path).select("fp")
    except Exception:
        return spark.createDataFrame([], "fp string")


def dedup_ingest(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start an availableNow foreachBatch query that appends only
    never-seen-before documents to ``out_path`` and their fingerprints
    to ``index_path``. Returns the started StreamingQuery (caller
    awaits termination)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fps = fingerprint(F.col(text_col)).alias("fp")
        marked = batch_df.select(id_col, text_col).withColumn("fp", fps)
        # within-batch dedup first (keep the lowest id per fingerprint),
        # then drop anything the corpus index has already accepted
        w = Window.partitionBy("fp").orderBy(id_col)
        fresh = (
            marked.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .join(
                _index_fps(spark, index_path),
                on="fp",
                how="left_anti",
            )
            .cache()
        )
        fresh.select(id_col, text_col, "fp").write.mode("append").parquet(
            out_path
        )
        fresh.select("fp").write.mode("append").parquet(index_path)
        fresh.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
