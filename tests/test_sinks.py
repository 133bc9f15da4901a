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


def test_zordered_write_skips_files_on_both_dims(spark, tmpdir):
    """Z-order layout: parquet footer min/max stats (what row-group
    skipping consults) must allow pruning on EVERY clustered column.
    A single-column sort prunes perfectly on its own column and not
    at all on the other; z-order prunes partially on both — the
    multi-dimensional data-skipping contract."""
    import glob

    import pyarrow.parquet as pq

    from spark_tsne_spark.sources.sinks import write_zordered

    # sf0.001 has only 15 distinct users — too coarse to measure
    # skipping; use the 150-user sf0.01 events table
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmpdir) + "/z"
    spath = str(tmpdir) + "/s"
    write_zordered(ev, zpath, cols=["user_id", "value"], num_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def file_spans(path):
        out = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            u_lo = v_lo = float("inf")
            u_hi = v_hi = float("-inf")
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    if col.path_in_schema == "user_id":
                        u_lo, u_hi = min(u_lo, st.min), max(u_hi, st.max)
                    elif col.path_in_schema == "value":
                        v_lo, v_hi = min(v_lo, st.min), max(v_hi, st.max)
            out.append((u_lo, u_hi, v_lo, v_hi))
        return out

    q = ev.agg(
        F.expr("percentile(user_id, 0.45)").alias("u1"),
        F.expr("percentile(user_id, 0.55)").alias("u2"),
        F.expr("percentile(value, 0.45)").alias("v1"),
        F.expr("percentile(value, 0.55)").alias("v2"),
    ).collect()[0]

    def hits(spans, lo_i, hi_i, lo, hi):
        return sum(1 for s in spans if s[lo_i] <= hi and s[hi_i] >= lo)

    zs, ss = file_spans(zpath), file_spans(spath)
    z_v = hits(zs, 2, 3, q["v1"], q["v2"])
    z_u = hits(zs, 0, 1, q["u1"], q["u2"])
    s_v = hits(ss, 2, 3, q["v1"], q["v2"])
    s_u = hits(ss, 0, 1, q["u1"], q["u2"])
    # the value-sorted dimension of the contrast layout can't prune at
    # all; z-order must beat it there and still prune on user_id
    assert s_v == len(ss), (s_v, len(ss))
    assert z_v < s_v and z_v <= (3 * len(zs)) // 4, (z_v, s_v)
    assert z_u < len(zs), (z_u, len(zs))
    # single-col sort rightly stays king on its OWN column
    assert s_u <= z_u, (s_u, z_u)

    # and the data round-trips exactly
    assert (
        spark.read.parquet(zpath).orderBy("event_id").collect()
        == ev.orderBy("event_id").collect()
    )


def test_orc_roundtrip_fidelity(spark, tmp_path):
    """ORC write -> read preserves every row, column, and type."""
    from spark_tsne_spark.sources.sinks import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a\nb", 3.5, [1.0, 2.0]), (2, None, -0.0, []), (3, "x", 7.25, None)],
        "id long, s string, v double, arr array<double>",
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    key = lambda r: r["id"]
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_dynamic_partition_pruning_plan(spark, sf_dir, tmpdir):
    """Fact partitioned by year joined to a filtered dim: the plan
    must carry a DynamicPruningExpression on the fact scan — at 100 TB
    DPP skips whole partition directories based on the dim filter's
    RUNTIME result (the broadcast result is reused as the pruning
    subquery), which static pruning cannot do because the years only
    exist in the dim."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = f"{tmpdir}/orders_by_year"
    orders.withColumn("oyear", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("oyear").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1995, "a"), (1996, "b"), (1997, "c"), (1998, "d"), (1999, "e")],
        "y int, tag string",
    ).where(F.col("tag") == "b")
    j = fact.join(dim, fact["oyear"] == dim["y"]).agg(
        F.count("*").alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = orders.where(F.year("o_orderdate") == 1996).count()
    assert j.collect()[0]["n"] == want
