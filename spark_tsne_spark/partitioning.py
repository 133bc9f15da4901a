"""Partition-layout helpers shared by the operator library.

The operators here are written for inputs that arrive with sensible
parallelism (at 100 TB a table is thousands of parquet row-groups).
Small fixtures and dimension-sized inputs instead arrive as ONE file →
one partition, which serializes every narrow per-row stage (shingling,
hashing, feature extraction) onto a single core. ``widen_small_input``
repairs exactly that case and no-ops at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to cluster parallelism when the
    input has fewer partitions than the cluster has slots.

    Cost where it fires: one extra shuffle of a small input (by
    definition under-partitioned ⇒ little data per slot). At scale
    inputs already carry ≥ parallelism partitions and this is the
    identity — it never *reduces* partitioning.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
