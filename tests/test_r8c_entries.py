"""Property tests for the round-8c operators: interval overlap join,
MAD anomaly census, trimmed/winsorized means, conformal forecast
bands."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _ts(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_interval_overlap_join_equals_theta(spark):
    """The bucketed plan must produce EXACTLY the theta-join pair
    set — including pairs spanning several buckets (emitted once via
    the responsibility bucket) and bucket-boundary-kissing pairs."""
    from spark_tsne_spark.operators.timeseries import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10"), _ts("2024-01-01 05:20")),  # long
            (2, _ts("2024-01-01 01:00"), _ts("2024-01-01 01:30")),
            (3, _ts("2024-01-01 02:59"), _ts("2024-01-01 03:01")),  # spans
            (4, _ts("2024-01-01 07:00"), _ts("2024-01-01 08:00")),  # kisses
        ],
        "lid: long, ls: timestamp, le: timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 01:00"), _ts("2024-01-01 02:00")),
            (11, _ts("2024-01-01 03:00"), _ts("2024-01-01 04:00")),
            (12, _ts("2024-01-01 08:00"), _ts("2024-01-01 09:00")),
        ],
        "rid: long, rs: timestamp, re: timestamp",
    )
    got = {
        (r["lid"], r["rid"]): r["overlap_us"]
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_s=3600.0
        ).collect()
    }
    # theta truth: half-open overlap
    import itertools

    lt = {r["lid"]: (r["ls"], r["le"]) for r in left.collect()}
    rt = {r["rid"]: (r["rs"], r["re"]) for r in right.collect()}
    want = {}
    for (li, (a0, a1)), (ri, (b0, b1)) in itertools.product(
        lt.items(), rt.items()
    ):
        if a0 < b1 and b0 < a1:
            ov = (min(a1, b1) - max(a0, b0)).total_seconds()
            want[(li, ri)] = int(ov * 1_000_000)
    assert got == want
    # pair (4, 12) kisses at 08:00 — half-open means NO overlap
    assert (4, 12) not in got
    # the long session matched both incidents, each exactly once
    assert got[(1, 10)] == 3600 * 1_000_000 and (1, 11) in got
    with pytest.raises(ValueError):
        interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_s=0)


def test_mad_resists_contamination(spark, tmp_path):
    """Inject one absurd value per type: mean/stdev census moves,
    median/MAD census must not (that is the point of MAD)."""
    from spark_tsne_spark.plans.queries import catalog

    base = pd.DataFrame(
        {
            "event_id": range(101),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "click",
            "value": [float(i % 10) for i in range(100)] + [1e9],
            "props": "{}",
        }
    )
    base.to_parquet(f"{tmp_path}/events.parquet", coerce_timestamps="us")
    r = (
        catalog()["events_anomaly_mad"].fn(spark, str(tmp_path)).collect()
    )[0]
    # median/MAD of 0..9 cycle ignore the 1e9 row entirely
    assert r["median"] == 4.0 or r["median"] == 5.0
    assert r["mad"] <= 5.0
    assert r["n_outliers"] >= 1  # the contaminant itself is flagged


def test_trimmed_mean_bounds_and_exactness(spark, sf_dir):
    """trimmed and winsorized means sit between min and max, react
    less to tails than the raw mean, and reproduce a pandas
    recomputation exactly (integer-cents arithmetic)."""
    from spark_tsne_spark.plans.queries import catalog

    rows = {
        r["o_orderpriority"]: r
        for r in catalog()["orders_trimmed_mean"].fn(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for grp, g in pdf.groupby("o_orderpriority"):
        cents = (
            g.sort_values(["o_totalprice", "o_orderkey"])["o_totalprice"]
            * 100.0
        ).round().astype("int64").tolist()
        n = len(cents)
        lo = (n * 5) // 100
        trim = cents[lo : n - lo]
        p05, p95 = cents[lo], cents[n - lo - 1]
        wins = [min(max(c, p05), p95) for c in cents]
        r = rows[grp]
        assert r["n_trimmed_each"] == lo
        assert r["mean_raw"] == round(sum(cents) / n / 100.0, 6)
        assert r["mean_trimmed"] == round(
            sum(trim) / len(trim) / 100.0, 6
        )
        assert r["mean_winsorized"] == round(sum(wins) / n / 100.0, 6)


def test_conformal_band_covers_backtest(spark, sf_dir):
    """The q90 band must cover >= ~90% of the backtest residuals by
    construction (rank selection), and lo <= fc <= hi."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["events_forecast_conformal"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["q90_resid"] >= 0.0
        assert r["lo_90"] <= r["fc_next"] <= r["hi_90"]
        assert round(r["hi_90"] - r["fc_next"], 4) == round(
            r["fc_next"] - r["lo_90"], 4
        )


def test_conformal_constant_series_zero_band(spark):
    """A perfectly constant series forecasts itself with ZERO
    residuals — the band collapses exactly."""
    from spark_tsne_spark.operators.timeseries import holt_linear  # noqa: F401
    from spark_tsne_spark.plans.queries import catalog
    import pandas as pd

    ts = pd.date_range("2024-01-01", periods=240, freq="h")
    pdf = pd.DataFrame(
        {
            "event_id": range(240),
            "ts": ts,
            "user_id": 1,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    import tempfile, os as _os

    d = tempfile.mkdtemp()
    pdf.to_parquet(f"{d}/events.parquet", coerce_timestamps="us")
    r = (
        catalog()["events_forecast_conformal"].fn(spark, d).collect()
    )[0]
    assert r["q90_resid"] == 0.0
    assert r["lo_90"] == r["fc_next"] == r["hi_90"] == 24.0
