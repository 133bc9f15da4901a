"""Exact-order-statistics tests: iterative histogram narrowing vs a
local full sort, across tie-heavy / constant / negative / wide-domain
inputs and randomized rank sets. The operator's whole point is exact
results with O(buckets) driver state, so every test compares against
sorted()[k-1] ground truth.
"""

import random

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.operators.quantiles import (
    exact_group_quantile,
    exact_kth_smallest,
    quantile_summary,
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["v"])


@pytest.mark.parametrize(
    "gen",
    [
        lambda rng: [rng.randint(-(10**12), 10**12) for _ in range(4000)],
        lambda rng: [rng.randint(0, 30) for _ in range(3000)],  # ties
        lambda rng: [7] * 123,  # constant column
        lambda rng: [rng.getrandbits(62) for _ in range(1500)],  # wide
    ],
)
def test_exact_kth_matches_full_sort(spark, gen):
    rng = random.Random(11)
    vals = gen(rng)
    s = sorted(vals)
    n = len(vals)
    ks = sorted({1, 2, n // 7, n // 3, (n + 1) // 2, n - 1, n})
    got = exact_kth_smallest(_df(spark, vals), "v", ks, n_buckets=64)
    assert got == {k: s[k - 1] for k in ks}


def test_exact_kth_random_ranks_small_buckets(spark):
    """Random ranks with tiny bucket counts force many narrowing
    rounds and shared-bracket bookkeeping (several open ranks per
    round, some resolving early)."""
    rng = random.Random(23)
    vals = [rng.randint(-500, 500) for _ in range(2000)]
    s = sorted(vals)
    ks = sorted(rng.sample(range(1, 2001), 9))
    got = exact_kth_smallest(_df(spark, vals), "v", ks, n_buckets=4)
    assert got == {k: s[k - 1] for k in ks}


def test_exact_kth_validates(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="out of range"):
        exact_kth_smallest(df, "v", [0])
    with pytest.raises(ValueError, match="out of range"):
        exact_kth_smallest(df, "v", [4])
    with pytest.raises(ValueError, match="empty"):
        exact_kth_smallest(df.where(F.col("v") > 99), "v", [1])
    assert exact_kth_smallest(df, "v", []) == {}


def test_exact_group_quantile_matches_per_group_sort(spark):
    """Per-group medians via shared-scan narrowing equal the local
    per-group sort, with uneven group sizes (including a 1-row
    group) and value ranges that differ wildly per group — the case
    where the per-group bracket widths diverge immediately."""
    rng = random.Random(31)
    groups = {
        "a": [rng.randint(0, 9) for _ in range(501)],
        "b": [rng.randint(-(10**9), 10**9) for _ in range(900)],
        "c": [42],
        "d": [rng.randint(100, 101) for _ in range(64)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["src", "v"])
    got = {
        r["src"]: r["q_value"]
        for r in exact_group_quantile(
            df, "src", "v", 0.5, n_buckets=8
        ).collect()
    }
    want = {
        g: sorted(vs)[(len(vs) + 1) // 2 - 1] for g, vs in groups.items()
    }
    assert got == want


def test_exact_group_quantile_validates_q(spark):
    df = spark.createDataFrame([("a", 1)], ["src", "v"])
    with pytest.raises(ValueError, match="out of"):
        exact_group_quantile(df, "src", "v", 0.0)
    with pytest.raises(ValueError, match="out of"):
        exact_group_quantile(df, "src", "v", 1.5)


def test_weighted_kth_matches_cumulative_weight(spark):
    """Weighted ranks: the k-th smallest under weights equals the
    value where the cumulative weight over value-sorted rows first
    reaches k (local ground truth), including zero-weight rows and
    heavy ties."""
    rng = random.Random(41)
    rows = [
        (rng.randint(0, 99), rng.randint(0, 5)) for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, ["v", "w"])
    total = sum(w for _, w in rows)
    ks = sorted({1, total // 4, (total + 1) // 2, total})
    got = exact_kth_smallest(df, "v", ks, n_buckets=8, weight_col="w")
    svals = sorted(rows)
    want = {}
    for k in ks:
        acc = 0
        for v, w in svals:
            acc += w
            if acc >= k:
                want[k] = v
                break
    assert got == want


def test_weighted_rejects_negative_weights(spark):
    df = spark.createDataFrame([(1, 2), (2, -1)], ["v", "w"])
    with pytest.raises(ValueError, match="negative weights"):
        exact_kth_smallest(df, "v", [1], weight_col="w")


def test_weighted_rejects_fractional_weight_type(spark):
    """Float weights would be floored per bin by the long cast,
    leaving ranks silently unreachable — must refuse up front."""
    df = spark.createDataFrame([(1, 0.5), (2, 0.5)], ["v", "w"])
    with pytest.raises(ValueError, match="integer-typed"):
        exact_kth_smallest(df, "v", [1], weight_col="w")


def test_group_quantile_all_null_groups_empty_typed_result(spark):
    """Every group NULL -> empty result with the input's group type,
    not a CANNOT_INFER_EMPTY_SCHEMA crash."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2)], "src string, v int"
    )
    out = exact_group_quantile(df, "src", "v", 0.5)
    assert out.count() == 0
    assert out.schema["src"].dataType.simpleString() == "string"
    assert out.schema["q_value"].dataType.simpleString() == "bigint"


def test_quantile_summary_validates_q(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="out of"):
        quantile_summary(df, "v", [0.0])
    with pytest.raises(ValueError, match="out of"):
        quantile_summary(df, "v", [-0.3])


def test_group_quantile_skips_null_groups(spark):
    """NULL groups can't be routed by equality and are documented as
    skipped — they must not hang the narrowing loop or appear in the
    output."""
    rows = [("a", v) for v in range(10)] + [(None, v) for v in range(5)]
    df = spark.createDataFrame(rows, ["src", "v"])
    got = exact_group_quantile(df, "src", "v", 0.5, n_buckets=4)
    assert [(r["src"], r["q_value"]) for r in got.collect()] == [("a", 4)]


def test_quantile_summary_labels_permille_exact(spark):
    """Labels come from the same permille snap as the ranks: 0.29
    must be p29 (not a truncated p28) and 0.999 must get its own
    p999m label (not collide with 0.99)."""
    df = _df(spark, list(range(1, 1001)))
    out = quantile_summary(df, "v", [0.29, 0.99, 0.999])
    assert sorted(out.columns) == ["p29", "p99", "p999m"]
    row = out.collect()[0]
    assert (row["p29"], row["p99"], row["p999m"]) == (290, 990, 999)
    with pytest.raises(ValueError, match="duplicate"):
        quantile_summary(df, "v", [0.5, 0.5001])


def test_narrowing_job_count_bounded(spark):
    """Pin the cost model mechanically: p50/p90/p99 over a
    cents-scale domain (~1e7) take one bounds scan plus <= 3
    narrowing rounds (1e7 -> 9766 -> 10 -> 1 at 1024 buckets) = 4
    actions TOTAL for all three ranks together. AQE splits each
    collect into ~2 jobs (shuffle materialization + result), so the
    job budget is 4 x 2 + 1 slack = 9. The regression this exists to
    catch is per-RANK scans: if the ranks stopped sharing rounds the
    count would land near 3 x 8 and fail loudly."""
    rng = random.Random(53)
    df = _df(spark, [rng.randint(0, 10**7) for _ in range(5000)])
    df = df.cache()
    df.count()  # materialize outside the counted group
    sc = spark.sparkContext
    sc.setJobGroup("quantile-jobs", "narrowing job count")
    try:
        quantile_summary(df, "v", [0.5, 0.9, 0.99]).collect()
        ids = sc._jsc.sc().statusTracker().getJobIdsForGroup(
            "quantile-jobs"
        )
        assert len(ids) <= 9, f"{len(ids)} jobs: {list(ids)}"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        df.unpersist()


def test_quantile_summary_lower_quantile_semantics(spark):
    """quantile_summary returns the value at rank ceil(q*n) — the
    smallest value with cume_dist >= q. Pinned on a hand-checkable
    input: n=10, p50 -> rank 5, p90 -> rank 9, p99 -> rank 10."""
    vals = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    row = quantile_summary(
        _df(spark, vals), "v", [0.5, 0.9, 0.99]
    ).collect()[0]
    assert (row["p50"], row["p90"], row["p99"]) == (50, 90, 100)
