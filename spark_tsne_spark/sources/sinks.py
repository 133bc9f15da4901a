"""Parquet sinks: partitioned and bucketed writes.

The reference's only sink is a driver-side per-iteration CSV
(``MNIST.scala:50,58-70``; covered by ``streaming/progress.py``). A
100 TB pipeline needs layout-aware sinks:

- **partitioned** writes give Catalyst partition *pruning*: a filter
  on the partition column skips whole directories at plan time.
- **bucketed** writes give *co-located joins and aggregations*: two
  tables bucketed and sorted on the same key join with NO exchange on
  either side (the sort-merge join reads matching buckets directly) —
  the single biggest shuffle eliminator for repeated fact-to-fact
  joins at scale. Spark persists bucketing metadata through the table
  catalog, so these go through ``saveAsTable`` with an explicit
  ``path`` (external table) rather than ``parquet(path)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet (directory per key value).

    Filters on ``partition_by`` columns prune directories at planning
    time — the scan never opens non-matching files.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: list[str] | str,
    num_buckets: int,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) external parquet table.

    Joins/aggregations between tables bucketed on the same key with
    the same bucket count run shuffle-free; sorting within buckets
    additionally removes the sort from sort-merge joins.
    """
    bcols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).option("path", path).bucketBy(num_buckets, *bcols)
    if sort_by is not None:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucketing metadata rides along)."""
    return spark.table(table)
