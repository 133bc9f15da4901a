"""Property tests for the round-8l operators: ABC-XYZ matrix, Hill
tail index, hour-of-day seasonality strength."""

import math
import os
from collections import defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_abc_xyz_partitions_parts_and_conserves_revenue(spark):
    """Cells partition the part set and conserve total revenue;
    the A band's revenue share is >= its part share (concentration
    by construction)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["part_abc_xyz_matrix"].fn(spark, SF).collect()
    li = _t(spark, SF, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    total = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["cents"] for r in rows) == total
    a_parts = sum(r["n_parts"] for r in rows if r["abc"] == "A")
    a_cents = sum(r["cents"] for r in rows if r["abc"] == "A")
    assert a_cents / total >= a_parts / n_parts


def test_abc_boundary_is_cross_multiplied_exact(spark):
    """Recompute the ABC assignment driver-side with the same exact
    integer compares and match the per-cell counts."""
    from collections import Counter

    from spark_tsne_spark.plans.queries import _t, catalog

    li = _t(spark, SF, "lineitem").collect()
    cents = defaultdict(int)
    weekly = defaultdict(lambda: defaultdict(int))
    for l in li:
        cents[l["l_partkey"]] += round(l["l_extendedprice"] * 100)
        wk = (l["l_shipdate"].isocalendar().year, l["l_shipdate"].isocalendar().week)
        weekly[l["l_partkey"]][wk] += round(l["l_quantity"])
    order = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(cents.values())
    cum = 0
    cells = Counter()
    for pk, c in order:
        cum += c
        abc = "A" if cum * 10 <= tot * 8 else "B" if cum * 100 <= tot * 95 else "C"
        qs = list(weekly[pk].values())
        n = len(qs)
        tq = sum(qs)
        if n >= 2 and tq > 0:
            var = (n * sum(q * q for q in qs) - tq * tq) / (n * (n - 1))
            cv = math.sqrt(max(var, 0.0)) / (tq / n)
            xyz = "X" if cv < 0.5 else "Y" if cv < 1.0 else "Z"
        else:
            xyz = "Z"
        cells[(abc, xyz)] += 1
    rows = catalog()["part_abc_xyz_matrix"].fn(spark, SF).collect()
    assert {(r["abc"], r["xyz"]): r["n_parts"] for r in rows} == dict(cells)


def test_hill_matches_driver(spark):
    """gamma and alpha must equal the driver recomputation over the
    top-100 order statistics on the same rounded-log grid."""
    from spark_tsne_spark.plans.queries import _t, catalog

    vals = sorted(
        (
            round(r["value"] * 100)
            for r in _t(spark, SF, "events")
            .where(F.col("value") > 0)
            .select("value")
            .collect()
        ),
        reverse=True,
    )
    c_k = vals[100]
    logsum = sum(round(math.log(v / c_k), 8) for v in vals[:100])
    gamma = logsum / 100
    r = catalog()["events_hill_tail_index"].fn(spark, SF).collect()[0]
    assert r["k"] == 100
    assert r["c_k"] == c_k
    assert r["hill_gamma"] == round(gamma, 6)
    assert r["tail_alpha"] == round(1 / gamma, 6)
    assert r["tail_alpha"] > 0


def test_seasonality_strength_bounded_and_matches_anova(spark):
    """0 <= strength <= 1 and it matches the driver-side eta-squared
    with the same floor-division discipline."""
    from spark_tsne_spark.plans.queries import _t, catalog

    hc = (
        _t(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    ys = [(r["h"].hour, r["y"]) for r in hc]
    n = len(ys)
    s = sum(y for _, y in ys)
    sq = sum(y * y for _, y in ys)
    ss_total = sq - (s * s) // n
    groups = defaultdict(list)
    for h, y in ys:
        groups[h].append(y)
    ss_within = sum(
        sum(y * y for y in g) - (sum(g) * sum(g)) // len(g)
        for g in groups.values()
    )
    r = catalog()["events_seasonality_strength"].fn(spark, SF).collect()[0]
    assert r["n"] == n
    assert r["ss_total"] == float(ss_total)
    assert r["ss_within"] == float(ss_within)
    assert r["seasonality_strength"] == round(1.0 - ss_within / ss_total, 6)
    assert 0.0 <= r["seasonality_strength"] <= 1.0
