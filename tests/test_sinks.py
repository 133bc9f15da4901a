"""Layout-aware sinks: partition pruning and shuffle-free bucketed joins."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.sources.sinks import read_table, write_bucketed, write_partitioned


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark, sf_dir, tmpdir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, f"{tmpdir}/orders_part", "o_orderpriority")
    back = spark.read.parquet(f"{tmpdir}/orders_part")
    one = back.where(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan or "1-URGENT" in plan
    expected = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == expected


def test_bucketed_join_runs_shuffle_free(spark, sf_dir, tmpdir):
    """Two tables bucketed+sorted on the join key sort-merge-join with
    zero Exchange operators — the co-located join layout for repeated
    fact-to-fact joins at scale."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        lineitem, "li_b", f"{tmpdir}/li_b", "l_orderkey", 4, sort_by="l_orderkey"
    )
    write_bucketed(
        orders, "ord_b", f"{tmpdir}/ord_b", "o_orderkey", 4, sort_by="o_orderkey"
    )
    li, od = read_table(spark, "li_b"), read_table(spark, "ord_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li["l_orderkey"] == od["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg: the join
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # cross-check values against the unbucketed plan
        plain = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))
        a = {r["o_orderpriority"]: float(r["qty"]) for r in joined.collect()}
        b = {r["o_orderpriority"]: float(r["qty"]) for r in plain.collect()}
        assert a == b
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
