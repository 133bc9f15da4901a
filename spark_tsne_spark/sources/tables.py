"""Parquet table catalog over the driver-generated synthetic tables.

Centralizes reads so every query benefits from parquet column pruning
and predicate pushdown (Catalyst handles both when reads stay
declarative). The reference's only source was a gzipped CSV text scan
(reference ``MNIST.scala:25``); here the engine is format-native.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# File-SCHEMA cache (metadata only, never rows): every bare
# ``spark.read.parquet`` runs a one-task schema-inference job before
# the query proper — one job per load_table call, i.e. per bench entry
# per repeat. The schema of a given parquet path is immutable for the
# process lifetime here (the driver writes the testdata once), so the
# first load's INFERRED schema is replayed as an explicit reader
# schema on subsequent loads — the standard large-deployment pattern
# (at 100 TB you pass the catalog schema instead of sampling footers).
# Same class as Spark's own session-scoped file-listing cache; the
# data itself is re-read from parquet on every query as before.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one synthetic table as a DataFrame.

    ``events.parquet`` may carry TIMESTAMP(NANOS) columns, which Spark
    refuses by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    truncate to microseconds with integer division — the same
    truncation DuckDB applies when it narrows TIMESTAMP_NS to its
    microsecond TIMESTAMP, so both engines see identical instants.
    (Float division would round, not truncate, and drift by 1µs.)
    """
    base = sf_dir or DEFAULT_SF_DIR
    path = f"{base}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load several tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv_gz(
    spark: SparkSession, path: str, schema=None, header: bool = False
) -> DataFrame:
    """Typed CSV scan (gzip handled automatically by the codec).

    Covers the reference's S1/S4 source operators
    (``MNIST.scala:25,30-31``) with a declarative typed read instead of
    ``sc.textFile`` + manual split.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
