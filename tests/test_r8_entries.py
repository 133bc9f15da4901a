"""Property tests for the round-8 operators: Kaplan-Meier survival,
k-anonymity audit, HLL register sketch, record-linkage scoring,
margin mining, Holt linear smoothing."""

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------- KM


def test_km_textbook_example(spark):
    """Hand-computed product-limit values on the classic tiny cohort:
    durations (1,e) (2,e) (2,c) (3,e) (4,c) ->
    S(1)=4/5, S(2)=0.8*3/4=0.6, S(3)=0.6*1/2=0.3."""
    from spark_tsne_spark.operators.survival import km_curve

    subj = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)], "t: long, e: int"
    )
    rows = {r["t"]: r for r in km_curve(subj).collect()}
    assert sorted(rows) == [1, 2, 3]  # censor-only times don't emit
    assert rows[1]["n_risk"] == 5 and rows[1]["d_events"] == 1
    assert rows[2]["n_risk"] == 4 and rows[3]["n_risk"] == 2
    assert rows[1]["km"] == 0.8
    assert rows[2]["km"] == 0.6
    assert rows[3]["km"] == 0.3


def test_km_monotone_and_all_events_reach_zero(spark):
    """S(t) is non-increasing, bounded in [0,1], and with NO censoring
    the curve ends at exactly 0 (everyone eventually fails)."""
    from spark_tsne_spark.operators.survival import km_curve

    subj = spark.createDataFrame(
        [((i * 7) % 13, 1) for i in range(200)], "t: long, e: int"
    )
    curve = sorted(
        (r["t"], r["km"]) for r in km_curve(subj).collect()
    )
    kms = [k for _, k in curve]
    assert all(0.0 <= k <= 1.0 for k in kms)
    assert all(a >= b for a, b in zip(kms, kms[1:]))
    assert kms[-1] == 0.0


def test_km_censoring_keeps_curve_above_naive(spark):
    """Censored subjects leave the risk set without an event, so the
    KM curve must sit >= the naive all-events curve at every shared
    time (dropping censoring biases survival DOWN is the classic
    error; treating censored as events is the other)."""
    from spark_tsne_spark.operators.survival import km_curve

    base = [(t, 1) for t in (1, 1, 2, 3, 3, 4, 5, 5)]
    cens = [(2, 0), (3, 0), (4, 0)]
    km_c = {
        r["t"]: r["km"]
        for r in km_curve(
            spark.createDataFrame(base + cens, "t: long, e: int")
        ).collect()
    }
    km_all_events = {
        r["t"]: r["km"]
        for r in km_curve(
            spark.createDataFrame(
                base + [(t, 1) for t, _ in cens], "t: long, e: int"
            )
        ).collect()
    }
    for t in km_c:
        assert km_c[t] >= km_all_events[t]


# ------------------------------------------------------ k-anonymity


def test_k_anonymity_bands_and_risk(spark):
    from spark_tsne_spark.operators.privacy import k_anonymity_report

    # 1 singleton class, 1 class of 3, 1 class of 6
    rows = (
        [("a", 1)] + [("b", 2)] * 3 + [("c", 3)] * 6
    )
    df = spark.createDataFrame(rows, "qi: string, other: int")
    out = {
        r["size_band"]: r
        for r in k_anonymity_report(df, ["qi"], k=5).collect()
    }
    assert set(out) == {"1", "2-4", "5-9"}
    assert out["1"]["n_classes"] == 1 and out["1"]["n_rows"] == 1
    assert out["2-4"]["n_rows"] == 3 and out["2-4"]["n_rows_below_k"] == 3
    assert out["5-9"]["n_rows"] == 6 and out["5-9"]["n_rows_below_k"] == 0
    assert out["1"]["n_rows_below_k"] == 1
    total_pct = sum(r["pct_rows"] for r in out.values())
    assert abs(total_pct - 1.0) < 1e-6


def test_k_anonymity_validations(spark):
    from spark_tsne_spark.operators.privacy import k_anonymity_report

    with pytest.raises(ValueError):
        k_anonymity_report(None, ["x"], k=1)
    with pytest.raises(ValueError):
        k_anonymity_report(None, [], k=5)


# -------------------------------------------------------------- HLL


def test_hll_accuracy_and_merge(spark):
    """Estimate within the ~1.04/sqrt(m) HLL error envelope (m=512 ->
    ~4.6%; allow 3 sigma), and the sketch MERGE property: registers
    of a union == groupBy-max over the concatenated shard sketches."""
    from spark_tsne_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 5000).select(F.col("id").alias("k"))
    est = hll_estimate(
        hll_registers(a.unionAll(b), "k"), p=9
    ).collect()[0]["est"]
    assert abs(est - 5000) / 5000 < 0.14
    merged = (
        hll_registers(a, "k")
        .unionAll(hll_registers(b, "k"))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    one_pass = hll_registers(a.unionAll(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_pass.collect())
    )


def test_hll_empty_and_validation(spark):
    from spark_tsne_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "k: long")
    out = hll_estimate(hll_registers(empty, "k"), p=9).collect()[0]
    assert out["v_empty"] == 512 and out["est"] == 0.0
    with pytest.raises(ValueError):
        hll_registers(empty, "k", p=3)


# ---------------------------------------------------------- linkage


def test_linkage_scores_and_vector(spark):
    """Score == sum of the per-field weights implied by the emitted
    agreement vector, for every pair; only within-block pairs exist;
    a < b exactly once."""
    from spark_tsne_spark.operators.linkage import (
        FieldRule,
        linkage_score_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "blk", "x", 10),
            (2, "blk", "x", 11),
            (3, "blk", "y", 30),
            (4, "other", "x", 10),
        ],
        "id: long, blk: string, f1: string, f2: long",
    )
    rules = [
        FieldRule("f1", lambda a, b: a == b, 5, -2),
        FieldRule("f2", lambda a, b: F.abs(a - b) <= 1, 3, -1),
    ]
    out = linkage_score_pairs(df, "id", ["blk"], rules, min_score=-100)
    rows = {(r["a"], r["b"]): r for r in out.collect()}
    # block "blk" has 3 members -> 3 pairs; id 4 is alone in its block
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    for r in rows.values():
        expect = (5 if r["f1_agree"] else -2) + (3 if r["f2_agree"] else -1)
        assert r["score"] == expect
    assert rows[(1, 2)]["score"] == 8
    assert rows[(1, 3)]["score"] == -3
    # threshold actually filters
    kept = linkage_score_pairs(df, "id", ["blk"], rules, min_score=8)
    assert {(r["a"], r["b"]) for r in kept.collect()} == {(1, 2)}


# ----------------------------------------------------- margin mining


def test_margin_discounts_hubs(spark):
    """A hub candidate (near-max cosine to EVERY query) must lose the
    margin ranking to a candidate that is selectively close to one
    query — the exact failure of raw-cosine retrieval that margin
    scoring fixes."""
    from spark_tsne_spark.operators.similarity import margin_mine

    # 4-dim toy space: queries along axes; hub = diagonal.
    qs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.1]),
            (2, [0.0, 1.0, 0.0, 0.1]),
            (4, [0.0, 0.0, 1.0, 0.1]),
        ],
        "vec_id: long, embedding: array<double>",
    )
    hub = [0.577, 0.577, 0.577, 0.1]
    cands = spark.createDataFrame(
        [
            (1, hub),
            (3, [0.95, 0.05, 0.0, 0.1]),   # selective partner of q0
            (5, [0.05, 0.95, 0.0, 0.1]),   # selective partner of q2
            (7, [0.0, 0.05, 0.95, 0.1]),   # selective partner of q4
        ],
        "vec_id: long, embedding: array<double>",
    )
    out = margin_mine(qs, cands, k=2, top_per_query=1).collect()
    picks = {r["src"]: r["tgt"] for r in out}
    assert picks == {0: 3, 2: 5, 4: 7}, picks
    for r in out:
        assert r["rank"] == 1 and -1.0 <= r["cosine"] <= 1.0
    with pytest.raises(ValueError):
        margin_mine(qs, cands, k=0)


# ------------------------------------------------------------- Holt


def test_holt_constant_series_is_exact(spark):
    """On a constant series the recursion is a fixed point: level ==
    the constant EXACTLY (dyadic ops), trend == 0, forecasts == level."""
    from spark_tsne_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame(
        [("s", i, 42.0) for i in range(20)],
        "g: string, o: long, y: double",
    )
    r = holt_linear(df, "g", "o", "y", horizon=3).collect()[0]
    assert r["level"] == 42.0 and r["trend"] == 0.0
    assert r["fc_1"] == r["fc_2"] == r["fc_3"] == 42.0
    assert r["n_obs"] == 20


def test_holt_tracks_linear_trend(spark):
    """On y_t = 10 + 3t the converged trend approaches 3 and the
    1-step forecast approaches y_{T+1} — the property EWMA cannot
    deliver (it lags a ramp forever)."""
    from spark_tsne_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame(
        [("s", t, 10.0 + 3.0 * t) for t in range(1, 41)],
        "g: string, o: long, y: double",
    )
    r = holt_linear(df, "g", "o", "y", horizon=2).collect()[0]
    assert abs(r["trend"] - 3.0) < 0.05
    assert abs(r["fc_1"] - (10.0 + 3.0 * 41)) < 0.6
    # short series dropped, horizon validated
    one = spark.createDataFrame([("s", 1, 5.0)], "g: string, o: long, y: double")
    assert holt_linear(one, "g", "o", "y").count() == 0
    with pytest.raises(ValueError):
        holt_linear(df, "g", "o", "y", horizon=0)
