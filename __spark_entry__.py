"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship Barnes-Hut t-SNE on sf0.001 embeddings.
``queries()`` — one callable per implemented operator
(SURVEY.md §2 + training-data-pipeline ops), backed by
``spark_tsne_spark.plans.queries``.
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible
entry; iterative numerical ops (perplexity bisection, t-SNE) are
rows-only by contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_tsne_spark.plans.queries import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_tsne_spark.api import bh_tsne

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    res = bh_tsne(
        emb,
        max_iterations=50,
        perplexity=15.0,
        seed=42,
        id_col="vec_id",
        features="embedding",
    )
    return res.to_df(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return {name: q.sql for name, q in catalog().items() if q.sql is not None}
