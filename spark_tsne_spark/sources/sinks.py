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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar alternative to parquet; built into Spark).

    ORC interops with Hive/Trino/Presto warehouses where it is the
    incumbent layout — a 100 TB pipeline that feeds one reads and
    writes it natively, with the same predicate-pushdown and
    column-pruning story as parquet (ORC carries min/max/bloom
    indexes per stripe)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — schema and stats come from the file footers."""
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of crawl/annotation
    pipelines (one JSON object per line, splittable, append-friendly).
    Row-oriented: no column pruning or predicate pushdown at read
    time, so it is a HANDOFF format, not a working layout — land it,
    convert to parquet, query the parquet."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema.

    Schema inference on JSON is a full extra pass over the data
    (`spark.read.json` without a schema scans everything once just to
    guess types) — at 100 TB that doubles the read, so the schema is
    a required argument here, and malformed rows surface in the
    standard `_corrupt_record` pattern rather than silently widening
    every column to string."""
    return spark.read.schema(schema).json(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: multi-column data skipping.

    Partition pruning only helps filters on the partition column, and
    sorting helps one column; interleaving the bit patterns of each
    column's normalized bucket (a Morton / Z curve) makes rows that
    are close in EVERY dimension land in the same files, so parquet
    row-group min/max stats prune scans for predicates on ANY of the
    clustered columns — the Delta/Iceberg ``OPTIMIZE ZORDER BY``
    layout, built from plain Spark ops.

    Mechanics: per-column QUANTILE bucket boundaries from one bounded
    ``approxQuantile`` pass (≤ ``2^bits − 1`` doubles per column on
    the driver — skew-proof, unlike equal-width buckets, which
    collapse to a constant top bit on long-tailed columns and lose
    all locality in that dimension), broadcast as an array literal;
    each row's bucket is a JVM-side count of boundaries ≤ value; bit
    interleave via shift/or expressions; then ``repartitionByRange``
    + ``sortWithinPartitions`` on the z-value so each output file
    covers a compact z-range.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cast = df.select(
        "*", *[F.col(c).cast("double").alias(f"_d_{c}") for c in cols]
    )
    buckets = []
    for c in cols:
        bnds = cast.stat.approxQuantile(f"_d_{c}", probs, 1.0 / (4 * n_buckets))
        arr = F.array(*[F.lit(float(b)) for b in bnds])
        # bucket = #boundaries <= x (0..n_buckets-1); NULL -> 0
        buckets.append(
            F.coalesce(
                F.size(
                    F.filter(arr, lambda b: b <= F.col(f"_d_{c}"))
                ).cast("long"),
                F.lit(0).cast("long"),
            )
        )
    z = reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.shiftleft(
                F.shiftrightunsigned(bk, i).bitwiseAND(F.lit(1)),
                i * len(cols) + k,
            )
            for i in range(bits)
            for k, bk in enumerate(buckets)
        ],
    )
    (
        cast.withColumn("_z", z)
        .drop(*[f"_d_{c}" for c in cols])
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across batches written under EVOLVED schemas:
    ``mergeSchema=true`` unions the footers by column name, so rows
    from batches that predate a column surface it as NULL — the
    standard additive-evolution contract a long-lived 100 TB table
    relies on (new ingest adds columns; old files are never
    rewritten). Merging footers costs one metadata pass; when the
    schema is known, pass it explicitly and skip even that.
    ``recursiveFileLookup`` picks up per-batch subdirectories (the
    ingest layout) without requiring them to be hive partitions."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
