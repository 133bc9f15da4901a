"""Semantics tests for operators/timeseries.py beyond the catalog
oracles: tie-breaks, tolerance, brute-force equivalence, grid/locf
invariants — the cases the sf fixtures may not hit."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.operators.timeseries import (
    asof_join,
    gapfill_interp,
    gapfill_locf,
    range_join_buckets,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),
            (2, 100, _ts("2024-01-01T10:00:05")),
            (3, 200, _ts("2024-01-01T10:00:03")),
            (4, 300, _ts("2024-01-01T09:00:00")),  # no quote ever
        ],
        "trade_id long, sym long, ts timestamp",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01T09:59:59"), 1.0),
            (11, 100, _ts("2024-01-01T10:00:00"), 2.0),  # tie with trade 1
            (12, 100, _ts("2024-01-01T10:00:00"), 3.0),  # same ts, higher id
            (13, 100, _ts("2024-01-01T10:00:04"), 4.0),
            (14, 200, _ts("2024-01-01T10:00:10"), 5.0),  # after trade 3
        ],
        "quote_id long, sym long, ts timestamp, px double",
    )


def test_asof_inclusive_and_tie_break(spark, trades, quotes):
    out = {
        r["trade_id"]: (r["r_quote_id"], r["r_px"])
        for r in asof_join(
            trades, quotes, by="sym", ts="ts",
            right_cols=["quote_id", "px"], right_order="quote_id",
        ).collect()
    }
    # equal-ts quotes DO match (inclusive), max quote_id wins the tie
    assert out[1] == (12, 3.0)
    # strictly-later quote 13 (10:00:04) is the latest at 10:00:05
    assert out[2] == (13, 4.0)
    # sym 200's only quote is after the trade -> no match
    assert out[3] == (None, None)
    # sym 300 has no quotes at all -> left row kept, NULL match
    assert out[4] == (None, None)


def test_asof_tolerance_voids_stale_matches(spark, trades, quotes):
    out = {
        r["trade_id"]: r["r_quote_id"]
        for r in asof_join(
            trades, quotes, by="sym", ts="ts",
            right_cols=["quote_id"], right_order="quote_id",
            tolerance_s=0,
        ).collect()
    }
    # tolerance 0 keeps only exact-ts matches
    assert out[1] == 12
    assert out[2] is None and out[3] is None and out[4] is None


def test_asof_partition_invariant(spark, trades, quotes):
    base = asof_join(
        trades, quotes, by="sym", ts="ts",
        right_cols=["quote_id"], right_order="quote_id",
    )
    rep = asof_join(
        trades.repartition(7), quotes.repartition(3), by="sym", ts="ts",
        right_cols=["quote_id"], right_order="quote_id",
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, rep.collect()))


def test_range_join_equals_brute_force(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id") < 300)
        .select("event_id", "ts")
    )
    left = ev.select(F.col("event_id").alias("lid"), F.col("ts").alias("lts"))
    right = ev.select(F.col("event_id").alias("rid"), F.col("ts").alias("rts"))
    got = {
        (r["lid"], r["rid"])
        for r in range_join_buckets(
            left, right, "lts", "rts", lower_s=-45.0, upper_s=90.0
        ).collect()
    }
    lus = F.unix_micros(F.col("lts").cast("timestamp"))
    rus = F.unix_micros(F.col("rts").cast("timestamp"))
    want = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .where((rus >= lus - 45_000_000) & (rus <= lus + 90_000_000))
        .collect()
    }
    assert got == want and len(got) > len(
        ev.collect()
    )  # window wide enough that some cross-row pairs exist


def test_range_join_rejects_inverted_window(spark, trades):
    with pytest.raises(ValueError, match="upper_s"):
        range_join_buckets(trades, trades, "ts", "ts", lower_s=10.0, upper_s=-10.0)


def test_gapfill_grid_dense_and_locf(spark):
    rows = [
        ("a", _ts("2024-01-01T00:10:00"), 1.5),
        ("a", _ts("2024-01-01T03:20:00"), 2.5),
        ("b", _ts("2024-01-01T01:00:00"), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = gapfill_locf(df, series="k", ts="ts", value="value").collect()
    by_key = {(r["k"], r["hour_ts"].hour): r for r in out}
    # grid: global bounds 00:00..03:00 -> 4 hourly buckets per series
    assert len(out) == 8
    # series b has data only at 01:00; hours 2-3 are synthesized with
    # the 01:00 sum carried forward, hour 0 precedes any observation
    assert by_key[("b", 0)]["sum_value_locf"] is None
    assert by_key[("b", 0)]["n_events"] == 0 and by_key[("b", 0)]["gap_filled"]
    assert by_key[("b", 1)]["sum_value_locf"] == 7.0
    assert by_key[("b", 3)]["sum_value_locf"] == 7.0
    assert by_key[("b", 3)]["gap_filled"]
    # series a: locf bridges hours 1-2 with hour 0's sum
    assert by_key[("a", 2)]["sum_value_locf"] == 1.5
    assert by_key[("a", 3)]["sum_value_locf"] == 2.5
    assert not by_key[("a", 0)]["gap_filled"]


def test_gapfill_interp_lerps_between_observations(spark):
    rows = [
        ("a", _ts("2024-01-01T00:30:00"), 10.0),
        ("a", _ts("2024-01-01T03:15:00"), 40.0),  # 3-bucket gap: 1/3, 2/3
        ("b", _ts("2024-01-01T01:00:00"), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        (r["k"], r["hour_ts"].hour): r["sum_value_interp"]
        for r in gapfill_interp(df, series="k", ts="ts", value="value").collect()
    }
    # observed endpoints kept exactly
    assert out[("a", 0)] == 10.0 and out[("a", 3)] == 40.0
    # linear between: 10 + 10k (floor-exact on the 1e-4 grid)
    assert out[("a", 1)] == 20.0 and out[("a", 2)] == 30.0
    # edges beyond first/last observation stay NULL
    assert out[("b", 0)] is None and out[("b", 2)] is None and out[("b", 3)] is None
    assert out[("b", 1)] == 5.0


def test_gapfill_interp_midpoint_no_half_point_flip(spark):
    """The case that broke float lerp: 2-bucket gap (frac=1/2) between
    4-decimal endpoints whose mean sits on the rounding midpoint —
    fixed-point floor keeps it deterministic and exact."""
    rows = [
        ("a", _ts("2024-01-01T00:00:00"), 0.1234),
        ("a", _ts("2024-01-01T02:00:00"), 0.1237),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["hour_ts"].hour: r["sum_value_interp"]
        for r in gapfill_interp(df, series="k", ts="ts", value="value").collect()
    }
    # exact rational midpoint 0.12355 floors to 0.1235 on the 1e-4 grid
    assert out[1] == 0.1235


def test_asof_equals_brute_force_with_heavy_ties(spark):
    """Randomized cross-check against an independent brute-force
    evaluation on data dense with equal timestamps (the tie-break
    regime the fixtures rarely hit): coarse integer second grid so
    many rows collide exactly."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        lrows = [
            (i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(8)))
            for i in range(25)
        ]
        rrows = [
            (100 + i, rng.randrange(3),
             base + dt.timedelta(seconds=rng.randrange(8)), float(i))
            for i in range(25)
        ]
        left = spark.createDataFrame(lrows, "lid long, sym long, ts timestamp")
        right = spark.createDataFrame(
            rrows, "rid long, sym long, ts timestamp, px double"
        )
        got = {
            r["lid"]: r["r_rid"]
            for r in asof_join(
                left, right, by="sym", ts="ts",
                right_cols=["rid"], right_order="rid",
            ).collect()
        }
        # independent brute force: max rid among right rows at the
        # latest ts <= left ts within the sym group
        want = {}
        for lid, sym, lts in lrows:
            cands = [(rts, rid) for rid, rsym, rts, _ in rrows
                     if rsym == sym and rts <= lts]
            want[lid] = max(cands)[1] if cands else None
        assert got == want, seed


def test_events_funnel_ordering_semantics(spark, tmp_path):
    """A user only advances a funnel step with an event STRICTLY after
    the previous step's first event: click-before-view doesn't count,
    purchase-without-click doesn't count."""
    import datetime as dt

    from spark_tsne_spark.plans.queries import events_funnel

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1: full ordered funnel
        (1, ts(0), 1, "view", 0.0, "{}"),
        (2, ts(1), 1, "click", 0.0, "{}"),
        (3, ts(2), 1, "purchase", 0.0, "{}"),
        # u2: click BEFORE first view -> stops at step 1
        (4, ts(0), 2, "click", 0.0, "{}"),
        (5, ts(1), 2, "view", 0.0, "{}"),
        # u3: view then purchase, no click -> stops at step 1
        (6, ts(0), 3, "view", 0.0, "{}"),
        (7, ts(1), 3, "purchase", 0.0, "{}"),
        # u4: never views -> not even step 1
        (8, ts(0), 4, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    out = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in events_funnel(spark, str(tmp_path)).collect()
    }
    assert out == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}


# --------------------------------------------------------------------------
# round-6: windowed EWMA + nearest-event join
# --------------------------------------------------------------------------


def test_ewma_smooth_small(spark):
    """Hand-checked weights: alpha=0.5 over window 3 — each row's
    value is the (0.25, 0.5, 1)-weighted mean of its trailing
    history, normalized over the weights present."""
    from spark_tsne_spark.operators.timeseries import ewma_smooth

    rows = [
        (1, "2024-01-01 00:00:00", 10, 8.0),
        (1, "2024-01-01 00:00:01", 11, 4.0),
        (1, "2024-01-01 00:00:02", 12, 2.0),
        (1, "2024-01-01 00:00:03", 13, 6.0),
        (2, "2024-01-01 00:00:00", 20, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            df, "user_id", "ts", "value", "event_id", window=3, alpha=0.5
        ).collect()
    }
    # row 10: 8
    # row 11: (0.5*8 + 1*4) / 1.5 = 16/3
    # row 12: (0.25*8 + 0.5*4 + 1*2) / 1.75 = 6/1.75
    # row 13: (0.25*4 + 0.5*2 + 1*6) / 1.75 = 8/1.75
    assert got[10] == 8.0
    assert got[11] == round(16 / 3, 6)
    assert got[12] == round(6 / 1.75, 6)
    assert got[13] == round(8 / 1.75, 6)
    assert got[20] == 5.0


def test_ewma_validates_params(spark):
    import pytest as _pytest

    from spark_tsne_spark.operators.timeseries import ewma_smooth

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, 1.0)],
        "user_id long, ts string, event_id long, value double",
    )
    with _pytest.raises(ValueError):
        ewma_smooth(df, "user_id", "ts", "value", "event_id", window=0)
    with _pytest.raises(ValueError):
        ewma_smooth(df, "user_id", "ts", "value", "event_id", alpha=0.0)


def test_nearest_join_two_sided_and_ties(spark):
    """Nearest looks BOTH ways (unlike as-of), respects the
    tolerance, and breaks exact-|dt| ties toward the earlier right
    row; left rows with no candidate in range drop out."""
    from spark_tsne_spark.operators.timeseries import nearest_join

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, eid long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    left = ev(
        [
            (1, 100, "2024-01-01 00:10:00"),  # nearest is AFTER it
            (1, 101, "2024-01-01 00:40:00"),  # equidistant tie
            (2, 200, "2024-01-01 09:00:00"),  # nothing within 15 min
        ]
    )
    right = ev(
        [
            (1, 1, "2024-01-01 00:02:00"),   # 8 min before 100
            (1, 2, "2024-01-01 00:13:00"),   # 3 min after 100
            (1, 3, "2024-01-01 00:35:00"),   # 5 min before 101
            (1, 4, "2024-01-01 00:45:00"),   # 5 min after 101 (tie)
            (2, 5, "2024-01-01 10:00:00"),
        ]
    )
    out = {
        r["eid"]: (r["eid_r"], r["dt_s"])
        for r in nearest_join(
            left.select("user_id", F.col("eid"), "ts"),
            right.select("user_id", F.col("eid").alias("eid_r"), "ts"),
            by="user_id", left_id="eid", left_ts="ts",
            right_id="eid_r", right_ts="ts", tolerance_s=900.0,
        ).collect()
    }
    assert out[100] == (2, 180.0)       # forward match beats farther backward
    assert out[101] == (3, -300.0)      # tie -> earlier right row
    assert 200 not in out               # out of tolerance
    assert len(out) == 2


def test_ewma_randomized_vs_pandas_reference(spark):
    """Randomized series (duplicate timestamps, many users, several
    partitionings) against an independent pandas implementation of
    the same finite-window normalized EWMA."""
    import numpy as np
    import pandas as pd

    from spark_tsne_spark.operators.timeseries import ewma_smooth

    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, n),
            "ts_s": rng.integers(0, 50, n),  # heavy ts collisions
            "event_id": np.arange(n),
            "value": np.round(rng.normal(size=n), 3),
        }
    )
    window, alpha = 5, 0.3

    def ref(g):
        g = g.sort_values(["ts_s", "event_id"])
        out = {}
        vals = g["value"].tolist()
        ids = g["event_id"].tolist()
        for i in range(len(vals)):
            w = vals[max(0, i - window + 1) : i + 1]
            wts = [(1 - alpha) ** (len(w) - 1 - j) for j in range(len(w))]
            out[ids[i]] = round(
                sum(v * t for v, t in zip(w, wts)) / sum(wts), 6
            )
        return out

    want = {}
    for _, g in pdf.groupby("user_id"):
        want.update(ref(g))

    df = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_seconds(F.col("ts_s"))
    )
    for parts in (1, 7, 32):
        got = {
            r["event_id"]: r["ewma"]
            for r in ewma_smooth(
                df.repartition(parts), "user_id", "ts", "value",
                "event_id", window=window, alpha=alpha,
            ).collect()
        }
        assert got == want, parts


def test_nearest_join_randomized_vs_bruteforce(spark):
    """Randomized event sets vs an exact brute-force nearest
    computation with the same tie contract."""
    import numpy as np

    from spark_tsne_spark.operators.timeseries import nearest_join

    rng = np.random.default_rng(23)
    nl, nr, tol = 120, 150, 40.0
    lrows = [
        (int(rng.integers(0, 5)), 1000 + i, int(rng.integers(0, 600)))
        for i in range(nl)
    ]
    rrows = [
        (int(rng.integers(0, 5)), 2000 + i, int(rng.integers(0, 600)))
        for i in range(nr)
    ]

    want = {}
    for bu, lid, lt in lrows:
        cands = [
            (abs(rt - lt), rt, rid, rt - lt)
            for bu2, rid, rt in rrows
            if bu2 == bu and abs(rt - lt) <= tol
        ]
        if cands:
            _, _, rid, dt = min(cands)
            want[lid] = (rid, float(dt))

    def mk(rows, idc):
        return spark.createDataFrame(
            rows, f"user_id long, {idc} long, ts_s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))

    got = {
        r["lid"]: (r["rid"], r["dt_s"])
        for r in nearest_join(
            mk(lrows, "lid"), mk(rrows, "rid"),
            by="user_id", left_id="lid", left_ts="ts",
            right_id="rid", right_ts="ts", tolerance_s=tol,
        ).collect()
    }
    assert got == want


def test_ewma_null_values_skipped_consistently(spark):
    """NULL values neither contribute nor receive weight — the
    contract the DuckDB oracle mirrors with list_filter."""
    from spark_tsne_spark.operators.timeseries import ewma_smooth

    rows = [
        (1, "2024-01-01 00:00:00", 1, 4.0),
        (1, "2024-01-01 00:00:01", 2, None),
        (1, "2024-01-01 00:00:02", 3, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            df, "user_id", "ts", "value", "event_id", window=3, alpha=0.5
        ).collect()
    }
    # row 3's frame holds [4, NULL, 8] -> weights over [4, 8] only
    assert got[3] == round((0.5 * 4 + 1 * 8) / 1.5, 6)
    # row 2's frame is [4, NULL]; the non-null list is [4] -> 4.0
    assert got[2] == 4.0
