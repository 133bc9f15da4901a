"""Property tests for the round-8j operators: item-item CF,
rolling-window HLL merge, feature-hashing collision audit."""

import hashlib
import os
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_similar_items_matches_driver_cf(spark):
    """Pair counts, cosines and top-5 sets must equal the driver-side
    basket recomputation."""
    import math

    from spark_tsne_spark.plans.queries import _t, catalog

    li = _t(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n_ord = Counter()
    pair = Counter()
    for items in baskets.values():
        for i in items:
            n_ord[i] += 1
        s = sorted(items)
        for x in range(len(s)):
            for z in range(x + 1, len(s)):
                pair[(s[x], s[z])] += 1
    scored = defaultdict(list)
    for (i, j), c in pair.items():
        if c >= 2:
            cos = round(c / math.sqrt(n_ord[i] * n_ord[j]), 6)
            scored[i].append((-cos, -c, j))
            scored[j].append((-cos, -c, i))
    want = {}
    for p, lst in scored.items():
        lst.sort()
        for rnk, (negcos, negc, nb) in enumerate(lst[:5], 1):
            want[(p, rnk)] = (nb, -negc, -negcos)
    rows = catalog()["part_similar_items"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert want[(r["part"], r["rnk"])] == (
            r["neighbor"],
            r["n_pair"],
            r["cosine"],
        )
    assert len(rows) == len(want)


def test_rolling_hll_day1_equals_single_day_and_monotone_weekly(spark):
    """The first day's window is that day alone; a 7-day window's
    register set dominates any member day's (merge = max), so its
    denom_scaled is <= the member's."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["events_rolling_distinct_hll"].fn(spark, SF).collect()
    assert rows
    days = [r["day_ts"] for r in rows]
    assert days == sorted(days)
    # merged window of later days includes more registers than day 1
    for r in rows:
        assert 1 <= r["n_regs"] <= 512
        assert r["denom_scaled"] > 0
        assert r["est"] > 0
    # windows only ever merge MORE days early on -> est non-decreasing
    # across the first 7 days (register max is monotone under union)
    first7 = [r for r in rows[:7]]
    ests = [r["n_regs"] for r in first7]
    assert ests == sorted(ests)


def test_rolling_hll_estimate_tracks_exact(spark):
    """The raw estimate for the LAST day's 7-day window must land
    within 3 sigma-ish (~15% at p=9) of the exact trailing distinct
    count."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["events_rolling_distinct_hll"].fn(spark, SF).collect()
    last = rows[-1]
    ev = _t(spark, SF, "events")
    exact = (
        ev.where(
            (F.date_trunc("day", "ts") <= last["day_ts"])
            & (
                F.date_trunc("day", "ts")
                > last["day_ts"] - F.expr("INTERVAL 7 DAY")
            )
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(last["est"] - exact) / exact < 0.15


def test_feature_hashing_matches_driver(spark):
    """Occupancy histogram and collision rate must equal a driver
    hashlib recomputation over the distinct shingle set."""
    from spark_tsne_spark.plans.queries import _t, catalog

    docs = (
        _t(spark, SF, "documents")
        .where(F.length("text") >= 5)
        .select("text")
        .collect()
    )
    feats = set()
    for d in docs:
        t = d["text"]
        for i in range(len(t) - 4):
            feats.add(t[i : i + 5])
    occ = Counter()
    for f_ in feats:
        b = int(hashlib.md5(f"feat:{f_}".encode()).hexdigest()[:15], 16) % 256
        occ[b] += 1
    hist = Counter(occ.values())
    n_feats = len(feats)
    collided = sum((k - 1) * v for k, v in hist.items() if k > 1)
    rows = catalog()["vocab_feature_hashing_collisions"].fn(spark, SF).collect()
    assert {(r["occupancy"], r["n_buckets"]) for r in rows} == set(hist.items())
    r = rows[0]
    assert r["n_feats"] == n_feats
    assert r["buckets_used"] == len(occ)
    assert r["max_occupancy"] == max(hist)
    assert r["collision_rate"] == round(collided / n_feats, 6)
