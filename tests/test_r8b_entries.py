"""Property tests for the round-8b operators: KMV intersection
sketches, negative-sampling table, quarantine bitmask, robust
scaling, streaming sessionization."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------- KMV


def test_kmv_exact_regime_matches_truth(spark):
    """When both sets fit in the sketch (k_used < k) the estimates
    must be EXACT — the regime switch is part of the contract."""
    from spark_tsne_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketches,
    )

    rows = [("a", i) for i in range(60)] + [("b", i) for i in range(40, 120)]
    df = spark.createDataFrame(rows, "g: string, k: long")
    sk = kmv_sketches(df, "g", "k", k=256)
    out = kmv_pair_estimates(sk, k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["grp_a"], r["grp_b"]) == ("a", "b")
    assert r["union_est"] == 120.0  # |0..119|
    assert r["inter_est"] == 20.0   # |40..59|
    assert r["n_common"] == 20


def test_kmv_estimation_regime_accuracy(spark):
    """Past the sketch size the estimates carry ~1/sqrt(k) error —
    at k=128 allow a generous 3-sigma band; also pin the bottom-k
    identity: pool-of-sketches bottom-k == bottom-k of the union."""
    from spark_tsne_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketches,
    )

    a = spark.range(0, 5000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    b = spark.range(3000, 8000).select(F.lit("b").alias("g"), F.col("id").alias("k"))
    df = a.unionAll(b)
    sk = kmv_sketches(df, "g", "k", k=128)
    assert sk.groupBy("grp").count().agg(F.max("count")).collect()[0][0] == 128
    r = kmv_pair_estimates(sk, k=128).collect()[0]
    assert r["k_used"] == 128
    assert abs(r["union_est"] - 8000) / 8000 < 0.3
    assert abs(r["inter_est"] - 2000) / 2000 < 0.6
    # bottom-k identity
    u = df.select(F.lit("u").alias("g"), "k")
    union_sketch = sorted(
        x["h"] for x in kmv_sketches(u, "g", "k", k=128).collect()
    )
    pooled = sorted(
        set(x["h"] for x in sk.collect())
    )[:128]
    assert union_sketch == pooled


# ---------------------------------------------------- negative sampling


def test_negative_sampling_smoothing_monotone(spark, sf_dir):
    """smoothed/raw share ratio is (T/W)·tf^-0.25 — strictly
    decreasing in tf. The emitted table must respect that: frequent
    terms get flattened DOWN, rare terms UP, monotonically."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["vocab_negative_sampling"].fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 200  # min(200, |vocab|)
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    ratios = [r["ppm_smoothed"] / r["ppm_raw"] for r in by_rank]
    tfs = [r["tf"] for r in by_rank]
    for i in range(len(ratios) - 1):
        if tfs[i] > tfs[i + 1]:
            assert ratios[i] < ratios[i + 1] + 1e-9
    for r in rows:
        assert r["w_micro"] == round(r["tf"] ** 0.75 * 1_000_000)


# ------------------------------------------------------ quarantine mask


def test_quarantine_bitmask_routes_reasons(spark, tmp_path):
    """Each check sets exactly its bit; combinations compose; clean
    rows land at mask 0; the orphan bit fires on referential misses
    (the fixture never exercises it, so build one)."""
    from spark_tsne_spark.plans.queries import catalog

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [10, 10, 99, 10, 10],
            "o_orderstatus": ["O", "P", "F", "F", "P"],
            "o_totalprice": [100.0, 500000.0, 200.0, 300.0, 450000.0],
            "o_orderdate": pd.to_datetime(
                ["1996-01-01", "1996-01-01", "2001-01-01",
                 "1996-01-01", "2000-06-01"]
            ),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    cust = pd.DataFrame(
        {"c_custkey": [10], "c_name": ["x"], "c_nationkey": [0],
         "c_acctbal": [1.0], "c_mktsegment": ["BUILDING"]}
    )
    # micro-precision timestamps: the plain loader path expects the
    # fixture convention (only events.parquet carries NANOS)
    orders.to_parquet(f"{tmp_path}/orders.parquet", coerce_timestamps="us")
    cust.to_parquet(f"{tmp_path}/customer.parquet")
    out = {
        r["fail_mask"]: r
        for r in catalog()["orders_quarantine_bitmask"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # key 1: clean; 2: price+status = 1+4; 3: date+orphan = 2+8;
    # 4: clean; 5: price+date+status = 1+2+4
    assert set(out) == {0, 5, 10, 7}
    assert out[0]["n_rows"] == 2 and out[0]["example_orderkey"] == 1
    assert out[5]["example_orderkey"] == 2
    assert out[10]["example_orderkey"] == 3
    assert out[7]["example_orderkey"] == 5


# -------------------------------------------------------- robust scale


def test_robust_scale_quantiles_are_data_values(spark, sf_dir):
    """q1/median/q3 are SELECTED data values at the percentile_disc
    ranks (recomputed per group in pandas), and the outlier census
    matches a literal recount."""
    from spark_tsne_spark.plans.queries import catalog

    got = {
        r["o_orderpriority"]: r
        for r in catalog()["orders_robust_scale"].fn(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for grp, g in pdf.groupby("o_orderpriority"):
        vals = g.sort_values(["o_totalprice", "o_orderkey"])[
            "o_totalprice"
        ].tolist()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1]
        med = vals[(n + 1) // 2 - 1]
        q3 = vals[(3 * n + 3) // 4 - 1]
        r = got[grp]
        assert (r["q1"], r["median"], r["q3"]) == (q1, med, q3)
        iqr = q3 - q1
        n_out = sum(1 for v in vals if abs(v - med) > 3.0 * iqr)
        assert r["n_outliers"] == n_out and r["n"] == n


# -------------------------------------------------- streaming sessions


def test_streaming_sessionize_equals_batch(spark, sf_dir):
    """The streaming session_window drain must reproduce the batch
    lag+running-sum sessionizer row-for-row (same ids, bounds, and
    counts) — the streaming-twin contract every streaming entry in
    this repo carries."""
    from spark_tsne_spark.plans.queries import catalog

    cat = catalog()
    stream_rows = sorted(
        map(tuple, cat["streaming_sessionize"].fn(spark, sf_dir).collect())
    )
    batch_rows = sorted(
        map(
            tuple,
            cat["events_sessionize"]
            .fn(spark, sf_dir)
            .select(
                "user_id", "session_id", "n_events",
                "session_start", "session_end",
            )
            .collect(),
        )
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0
