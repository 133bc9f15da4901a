"""X2P golden + invariant tests (FIXTURES.md F1; reference
``X2PSuite.scala:14-18``)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.operators.knn import knn_exact_block, knn_exact_sql
from spark_tsne_spark.operators.x2p import calibrate, calibrated_neighbors, hbeta, mean_sigma, x2p


@pytest.fixture(scope="module")
def points4(spark):
    rows = [(i, [1.0 + 3 * i, 2.0 + 3 * i, 3.0 + 3 * i]) for i in range(4)]
    return spark.createDataFrame(rows, "id long, features array<double>")


def test_hbeta_matches_definition():
    d = np.array([1.0, 4.0, 9.0])
    h, p = hbeta(d, 0.5)
    expected_p = np.exp(-d * 0.5)
    expected_p /= expected_p.sum()
    assert np.allclose(p, expected_p)
    # H = -Σ p log p for the normalized distribution (shannon entropy in nats)
    assert abs(h - (-(expected_p * np.log(expected_p)).sum())) < 1e-12


def test_hbeta_zero_guard():
    # exp underflow path returns (0, zeros) like X2PHelper.scala:20-21
    d = np.array([1e6, 2e6])
    h, p = hbeta(d, 1e3)
    assert h == 0.0 and np.all(p == 0.0)


def test_knn_block_equals_sql(spark, points4):
    blk = knn_exact_block(points4, 3).collect()
    sql = knn_exact_sql(points4, 3).collect()
    flat_blk = {(r["i"], j): d for r in blk for j, d in zip(r["js"], r["ds"])}
    flat_sql = {(r["i"], r["j"]): r["dist"] for r in sql}
    assert set(flat_blk) == set(flat_sql)
    for k in flat_blk:
        assert abs(flat_blk[k] - flat_sql[k]) < 1e-9


def test_x2p_golden_4x3(spark, points4):
    """The reference's X2PSuite case: equidistant collinear rows with
    perplexity 2 → each row ≈ uniform over its 2 nearest neighbors."""
    out = x2p(points4, tol=1e-5, perplexity=2.0).collect()
    P = {}
    for r in out:
        P[(r["i"], r["j"])] = r["p"]
    for i in range(4):
        row = {j: p for (ii, j), p in P.items() if ii == i}
        assert abs(sum(row.values()) - 1.0) < 1e-6  # Σ_j p_{j|i} = 1
        assert all(p >= 0 for p in row.values())
        # entropy ≈ log(perplexity)
        ps = np.array([p for p in row.values() if p > 0])
        h = -(ps * np.log(ps)).sum()
        assert abs(h - math.log(2.0)) < 1e-3
        # the nearest neighbor carries the largest probability; for the
        # middle rows (two equidistant nearest neighbors) both get ≈ 0.5
        nearest = min((j for j in range(4) if j != i), key=lambda j: abs(j - i))
        assert row[nearest] == max(row.values())
        if i in (1, 2):
            two_near = [j for j in range(4) if abs(j - i) == 1]
            for j in two_near:
                assert row[j] > 0.4


def test_x2p_matches_golden_parquet(spark):
    """The distributed X2P pipeline (knn_exact_block + calibrate +
    COO emit) must reproduce, value-for-value at 6 decimals, the
    golden affinities computed by the independent dense driver path
    (scripts/make_x2p_golden.py) — the same comparison the
    correctness driver's DuckDB oracle runs. A failure here usually
    means the sf0.01 fixture changed: regenerate the golden and
    re-check before the driver does."""
    import os

    import duckdb

    from spark_tsne_spark.plans.queries import x2p_affinities

    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "x2p_affinities_sf001.parquet",
    )
    got = (
        x2p_affinities(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT i, j, p FROM read_parquet('{golden_path}') ORDER BY i, j"
    ).df()
    assert len(got) == len(want)
    assert got["i"].tolist() == want["i"].tolist()
    assert got["j"].tolist() == want["j"].tolist()
    assert got["p"].tolist() == want["p"].tolist()


def test_x2p_embeddings_invariants(spark, embeddings):
    cal = calibrated_neighbors(
        embeddings, perplexity=10.0, id_col="vec_id", features="embedding"
    ).cache()
    rows = cal.collect()
    assert len(rows) == embeddings.count()
    log_u = math.log(10.0)
    bad = 0
    for r in rows:
        ps = np.array(r["ps"])
        assert abs(ps.sum() - 1.0) < 1e-6
        h = -(ps[ps > 0] * np.log(ps[ps > 0])).sum()
        if abs(h - log_u) > 1e-3:
            bad += 1
    assert bad <= len(rows) * 0.01  # ≤1% rows may hit the 50-try cap
    assert mean_sigma(cal) > 0.0
