"""Regression tests for the round-7 ADVICE findings (round-8 fixes).

Each test pins the exact failure mode the advisor described:
1. sorted_neighborhood_pairs must derive rank offsets from the SAME
   materialized range shuffle as the ranks themselves (ReuseExchange),
   not from a separate collect job whose reservoir-sampled boundaries
   can differ;
2. bloom_semijoin must survive NULL build keys (Arrow hands nullable
   longs to pandas as float64+NaN, crashing .to_numpy(np.int64));
3. histogram_sketch_quantiles must ignore NULL values (a NULL bin
   sorts FIRST under Spark's window ordering and inflates n);
4. events_ab_test cohort sizes must count rows, not non-null values,
   to match the oracle's count(CASE WHEN cohort=0 THEN 1 END).
"""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_sorted_neighborhood_single_range_shuffle(spark):
    """The offset branch and the rank branch must hang off ONE range
    exchange: the executed plan contains a ReusedExchange (or AQE
    stage reuse), and no collect() splits the pid assignment into two
    independently-sampled executions. The old formulation ran
    repartitionByRange twice — reservoir sampling seeds differ per
    execution, so at scale the two jobs could bucket rows differently
    and silently corrupt global ranks."""
    from spark_tsne_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sorted_neighborhood_pairs(docs, window=4, rank_partitions=8)
    # Materialize THIS DataFrame so AQE finalizes its executed plan.
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # Inspect only the final plan (toString appends the initial plan).
    final = plan.split("== Initial Plan ==")[0]
    lines = final.splitlines()
    executed = sum(
        "Exchange rangepartitioning" in l and "ReusedExchange" not in l
        for l in lines
    )
    reused = sum(
        "ReusedExchange" in l and "rangepartitioning" in l for l in lines
    )
    assert executed == 1, f"range exchange executed {executed}x:\n{final[:4000]}"
    assert reused >= 1, (
        "offset branch did not reuse the rank branch's range shuffle:\n"
        + final[:4000]
    )


def test_sorted_neighborhood_matches_single_partition_truth(spark):
    """Output under multi-partition two-stage ranking == the plain
    1-partition sorted-window semantics (ground truth)."""
    from spark_tsne_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kw = dict(window=4, max_hamming=3)
    truth = sorted(
        map(tuple, sorted_neighborhood_pairs(docs, rank_partitions=1, **kw).collect())
    )
    got = sorted(
        map(tuple, sorted_neighborhood_pairs(docs, rank_partitions=8, **kw).collect())
    )
    assert got == truth
    assert len(truth) > 0


def test_bloom_semijoin_null_build_keys(spark):
    """NULL build keys must neither crash the bitmap builder nor
    admit probe NULLs: result is exactly probe ⋉ (non-null build)."""
    from spark_tsne_spark.operators.joins import bloom_semijoin

    probe = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (7,)], "pk: long"
    )
    build = spark.createDataFrame(
        [(2,), (None,), (7,), (None,), (9,)], "bk: long"
    )
    got = sorted(
        r["pk"]
        for r in bloom_semijoin(probe, build, "pk", "bk", m_bits=1 << 10).collect()
    )
    assert got == [2, 7]


def test_bloom_semijoin_all_null_build(spark):
    """Degenerate build side (every key NULL) → empty result, no crash."""
    from spark_tsne_spark.operators.joins import bloom_semijoin

    probe = spark.createDataFrame([(1,), (2,)], "pk: long")
    build = spark.createDataFrame([(None,), (None,)], "bk: long")
    assert bloom_semijoin(probe, build, "pk", "bk", m_bits=1 << 10).count() == 0


def test_histogram_sketch_ignores_nulls(spark):
    """Injecting NULL values must not move any estimate: NULLs carry
    no rank information, and counting them would both inflate n and
    order differently across engines (NULLS FIRST vs LAST)."""
    from spark_tsne_spark.operators.quantiles import (
        histogram_sketch_quantiles,
    )

    base = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 101)], "grp: string, v: double"
    )
    nulled = base.unionAll(
        spark.createDataFrame(
            [("g", None)] * 25, "grp: string, v: double"
        )
    )
    kw = dict(
        value_col="v", group_col="grp", qs_permille=[500, 900],
        lo=0.0, hi=100.0, bins=50,
    )
    clean = sorted(map(tuple, histogram_sketch_quantiles(base, **kw).collect()))
    dirty = sorted(map(tuple, histogram_sketch_quantiles(nulled, **kw).collect()))
    assert clean == dirty
    # n must be the non-null count.
    assert all(r[2] == 100 for r in clean)


def test_ab_test_null_values_match_oracle(spark, tmp_path):
    """Run the events_ab_test entry AND its DuckDB oracle over an
    events table where `value` is NULL for some rows: cohort sizes
    must count rows (oracle semantics), not non-null values. This is
    the exact latent divergence ADVICE r7 #4 flagged — fixtures are
    non-null so only a nullable input can prove it."""
    from spark_tsne_spark.plans.queries import catalog

    q = catalog()["events_ab_test"]
    pdf = pd.DataFrame(
        {
            "event_id": range(200),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": [i % 37 for i in range(200)],
            "event_type": ["click" if i % 2 else "view" for i in range(200)],
            "value": [None if i % 5 == 0 else float(i % 11) for i in range(200)],
            "props": "{}",
        }
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/events.parquet")
    got = (
        q.fn(spark, sf_dir)
        .toPandas()
        .reindex(sorted(["event_type", "n_a", "n_b", "mean_a", "mean_b",
                         "var_a", "var_b", "welch_t"]), axis=1)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(q.sql).df().reindex(sorted(got.columns), axis=1)
    got = got.sort_values("event_type").reset_index(drop=True)
    want = want.sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # And the cohort sizes really are row counts: n_a + n_b == rows/type.
    sizes = got.set_index("event_type")[["n_a", "n_b"]].sum(axis=1)
    assert sizes["click"] == 100 and sizes["view"] == 100
