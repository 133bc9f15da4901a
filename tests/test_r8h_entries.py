"""Property tests for the round-8h operators: Mann-Kendall trend,
Theil-Sen robust slope, per-type KS with Benjamini-Hochberg FDR."""

import math
import os
from collections import Counter

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _hourly(spark):
    from spark_tsne_spark.plans.queries import _t

    rows = (
        _t(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .orderBy("h")
        .collect()
    )
    return [r["y"] for r in rows]


def test_mann_kendall_matches_driver(spark):
    """S, the tie term, tau_a and z must match the textbook
    recomputation over the hourly series."""
    from spark_tsne_spark.plans.queries import catalog

    y = _hourly(spark)
    n = len(y)
    s = sum(
        (1 if y[j] > y[i] else -1 if y[j] < y[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(y)
    tie18 = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    cc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = cc / math.sqrt(var18 / 18.0)
    r = catalog()["events_mann_kendall"].fn(spark, SF).collect()[0]
    assert (r["n"], r["n_pairs"], r["s_stat"], r["var18"]) == (
        n,
        n * (n - 1) // 2,
        s,
        var18,
    )
    assert r["tau_a"] == round(2 * s / (n * (n - 1)), 6)
    assert abs(r["z"] - z) < 2e-6


def test_theil_sen_matches_driver(spark):
    """The lower-median pairwise slope and the median residual
    intercept must match a driver recomputation."""
    from spark_tsne_spark.plans.queries import catalog

    y = _hourly(spark)
    n = len(y)
    slopes = sorted(
        (y[j] - y[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    slope = slopes[(m + 1) // 2 - 1]
    resid = sorted(v - round(slope, 8) * (i + 1) for i, v in enumerate(y))
    ic = resid[(n + 1) // 2 - 1]
    r = catalog()["events_theil_sen"].fn(spark, SF).collect()[0]
    assert r["n_pairs"] == m
    assert r["ts_slope"] == round(slope, 8)
    assert abs(r["ts_intercept"] - ic) < 2e-8


def test_ks_fdr_step_up_rule(spark):
    """Rejections must follow the BH step-up rule: reject exactly the
    ranks <= k* = max{k: p_(k) <= alpha*k/m} — including any
    below-k* rank whose own p exceeds its critical value."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["events_ks_per_type_fdr"].fn(spark, SF).collect()
    m = len(rows)
    assert [r["rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    k_star = max(
        (r["rank"] for r in rows if r["p_value"] <= 0.05 * r["rank"] / m),
        default=0,
    )
    for r in rows:
        assert r["reject"] == (1 if r["rank"] <= k_star else 0)
        assert r["bh_critical"] == round(0.05 * r["rank"] / m, 6)


def test_ks_fdr_per_type_d_matches_single_type_recount(spark):
    """One type's D must equal a driver-side recomputation of that
    type's two-sample sup gap."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["events_ks_per_type_fdr"].fn(spark, SF).collect()
    et = rows[0]["event_type"]
    ev = (
        _t(spark, SF, "events")
        .where(F.col("event_type") == et)
        .select("user_id", "value")
        .collect()
    )
    a = sorted(r["value"] for r in ev if r["user_id"] % 2 == 0)
    b = sorted(r["value"] for r in ev if r["user_id"] % 2 == 1)
    ca, cb = Counter(a), Counter(b)
    n0, n1 = len(a), len(b)
    cum0 = cum1 = 0
    best = 0
    for v in sorted(set(a) | set(b)):
        cum0 += ca.get(v, 0)
        cum1 += cb.get(v, 0)
        best = max(best, abs(cum0 * n1 - cum1 * n0))
    r = rows[0]
    assert (r["n0"], r["n1"]) == (n0, n1)
    assert r["d"] == round(best / (n0 * n1), 6)
