"""Property tests for the round-8m operators: RFM segment migration,
exact skewness/kurtosis moments, term burstiness."""

import math
import os
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_rfm_migration_matrix_properties(spark):
    """Row shares sum to 1 per before-segment; the matrix covers only
    customers active in BOTH halves; segments are 1..4."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["customers_rfm_migration"].fn(spark, SF).collect()
    assert rows
    by_before = defaultdict(list)
    for r in rows:
        assert 1 <= r["seg_before"] <= 4 and 1 <= r["seg_after"] <= 4
        by_before[r["seg_before"]].append(r)
    for seg, rs in by_before.items():
        assert abs(sum(r["row_share"] for r in rs) - 1.0) < 1e-4, seg
        tot = sum(r["n_customers"] for r in rs)
        for r in rs:
            assert r["row_share"] == round(r["n_customers"] / tot, 6)


def test_rfm_migration_paired_cohort_only(spark):
    """Total matrix mass equals the count of customers with orders in
    BOTH halves of the time range (midpoint split)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    o = _t(spark, SF, "orders")
    lo, hi = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).collect()[0]
    cut = lo + (hi - lo) / 2
    both = (
        o.select(
            "o_custkey",
            F.when(F.col("o_orderdate") < F.lit(cut), 0).otherwise(1).alias(
                "half"
            ),
        )
        .distinct()
        .groupBy("o_custkey")
        .count()
        .where("count = 2")
        .count()
    )
    rows = catalog()["customers_rfm_migration"].fn(spark, SF).collect()
    assert sum(r["n_customers"] for r in rows) == both


def test_moments_match_scipy_formulas(spark):
    """Skewness and excess kurtosis must match the driver float
    recomputation (population moments) on the raw quantities."""
    from spark_tsne_spark.plans.queries import _t, catalog

    xs = [
        round(r["l_quantity"])
        for r in _t(spark, SF, "lineitem").select("l_quantity").collect()
    ]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    r = catalog()["lineitem_moments"].fn(spark, SF).collect()[0]
    assert r["n"] == n
    assert abs(r["mean"] - mu) < 1e-6
    assert abs(r["skewness"] - m3 / m2**1.5) < 1e-5
    assert abs(r["excess_kurtosis"] - (m4 / m2**2 - 3)) < 1e-5
    # offset-centered integer sums are self-consistent:
    # s2 = sum d^2 where d = x - floor-mean
    c = sum(xs) // n
    assert r["s1"] == sum(x - c for x in xs)
    assert r["s2"] == sum((x - c) ** 2 for x in xs)


def test_burstiness_matches_driver(spark):
    """tf/df, within-doc variance and the top-25 ranking must equal
    the driver recomputation; burstiness >= 1 always (a containing
    doc has at least one occurrence)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    docs = _t(spark, SF, "documents").select("doc_id", "text").collect()
    per = defaultdict(Counter)
    for d in docs:
        for t in re.split(r"\s+", d["text"].strip()):
            if t:
                per[t][d["doc_id"]] += 1
    stats = {}
    for term, cc in per.items():
        df = len(cc)
        if df < 3:
            continue
        tf = sum(cc.values())
        sk2 = sum(k * k for k in cc.values())
        var = ((df * sk2 - tf * tf) / df) / max(df - 1, 1)
        stats[term] = (df, tf, round(tf / df, 6), round(var, 6))
    top = sorted(stats.items(), key=lambda kv: (-kv[1][2], kv[0]))[:25]
    rows = catalog()["text_term_burstiness"].fn(spark, SF).collect()
    assert [(r["term"], r["df"], r["tf"], r["burstiness"], r["within_doc_var"]) for r in rows] == [
        (t, s[0], s[1], s[2], s[3]) for t, s in top
    ]
    for r in rows:
        assert r["burstiness"] >= 1.0
