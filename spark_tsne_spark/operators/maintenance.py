"""Corpus/table maintenance: upsert-merge and snapshot diff.

A live training corpus is maintained, not rebuilt: re-crawls supersede
old versions of a document, and every release is audited against the
previous one. Two batch operators cover that lifecycle:

- ``upsert_latest``: MERGE a changes table into a base snapshot,
  latest version per key wins (the Delta/Iceberg ``MERGE INTO ...
  WHEN MATCHED UPDATE`` semantics, expressed engine-neutrally as
  union + one per-key window). ONE shuffle on the key; ties break
  deterministically (changes beat base, then higher version).
- ``snapshot_diff``: classify every key across two snapshots as
  added / removed / changed / unchanged via a single full-outer join
  on the key with a content-fingerprint comparison — the audit job
  run before promoting a corpus release.

Scale: both are single-shuffle plans on the (high-cardinality,
uniform) document key; AQE handles size differences between the
sides. No driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def upsert_latest(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    version: str = "version",
) -> DataFrame:
    """Latest-wins merge of ``changes`` into ``base``: one row per
    key — the highest ``version``; on version ties the changes side
    wins (a re-delivery of the same version supersedes the stored
    row, the standard MERGE contract). Output schema = input schema +
    nothing (the provenance flag is dropped after the window)."""
    b = base.withColumn("_src", F.lit(0))
    c = changes.withColumn("_src", F.lit(1))
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("_src").desc()
    )
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """Per-key change classification between two snapshots:
    ``(key, status)`` with status ∈ added | removed | changed |
    unchanged, decided by key presence and fingerprint equality.
    ONE full-outer equi-join on the key."""
    o = old.select(F.col(key).alias("k"), F.col(fingerprint_col).alias("old_fp"))
    n = new.select(F.col(key).alias("k"), F.col(fingerprint_col).alias("new_fp"))
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key),
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )
