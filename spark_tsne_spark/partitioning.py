"""Partition-layout helpers shared by the operator library.

The operators here are written for inputs that arrive with sensible
parallelism (at 100 TB a table is thousands of parquet row-groups).
Small fixtures and dimension-sized inputs instead arrive as ONE file →
one partition, which serializes every narrow per-row stage (shingling,
hashing, feature extraction) onto a single core. ``widen_small_input``
repairs exactly that case and no-ops at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a hot key on the big side.

    A shuffle join sends every row of a hot key to ONE reducer; that
    task runs as long as the key is hot (the classic straggler). Here
    the big side scatters each key across ``n_salts`` sub-keys (hash
    of the whole row mod n_salts — deterministic, no rand()), and the
    small side is replicated n_salts times, so the hot key's rows
    spread over n_salts tasks. Cost: the small side shuffles n_salts×
    — only pay it when the small side is modest but above broadcast
    size AND the key histogram is skewed. AQE's runtime skew-join
    split (on by default in `session.get_spark`) handles most cases
    without this; salting is the explicit, plan-time form for when a
    single key exceeds what task-splitting can fix (e.g. one key =
    50% of the table).

    Result equals ``big.join(small, key, how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
