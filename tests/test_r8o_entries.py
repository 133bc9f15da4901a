"""Property tests for the round-8o operator: orthogonal Procrustes
embedding alignment."""

import os

import numpy as np
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _planted_rotation(d):
    rng = np.random.default_rng(20240815)
    A = rng.standard_normal((d, d))
    Q, Rq = np.linalg.qr(A)
    return Q * np.sign(np.diag(Rq))


def test_procrustes_recovers_planted_rotation(spark):
    """The catalog entry plants a known rotation; the recovered
    long-form matrix must equal it entrywise (6-decimal grid) and be
    orthogonal."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["embedding_procrustes_align"].fn(spark, SF).collect()
    d = int(max(r["i"] for r in rows)) + 1
    R = np.zeros((d, d))
    for r in rows:
        R[r["i"], r["j"]] = r["r"]
    R0 = _planted_rotation(d)
    assert np.max(np.abs(R - np.round(R0, 6))) < 2e-6
    assert np.max(np.abs(R @ R.T - np.eye(d))) < 1e-4  # rounded entries


def test_procrustes_operator_handles_arbitrary_rotation(spark):
    """Direct operator check on a tiny synthetic set: for Y = X R0
    with a DIFFERENT rotation, the recovered R still matches."""
    from spark_tsne_spark.operators.preprocess import procrustes_rotation

    rng = np.random.default_rng(7)
    X = rng.standard_normal((50, 8))
    A = rng.standard_normal((8, 8))
    Q, Rq = np.linalg.qr(A)
    R0 = Q * np.sign(np.diag(Rq))
    Y = X @ R0
    xdf = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(50)], ["id", "v"]
    )
    ydf = spark.createDataFrame(
        [(i, Y[i].tolist()) for i in range(50)], ["id", "v"]
    )
    R, S = procrustes_rotation(xdf, ydf, "id", "v", "v")
    assert np.max(np.abs(R - R0)) < 1e-9
    # singular values of X^T X R0 = eigenvalues of X^T X: all positive
    assert (S > 0).all()


def test_procrustes_alignment_reduces_frobenius_error(spark):
    """For a noisy Y (rotation + additive noise), ||X R - Y|| must be
    no larger than ||X Q - Y|| for any other tested orthogonal Q —
    spot-checked against the identity and a random rotation."""
    from spark_tsne_spark.operators.preprocess import procrustes_rotation

    rng = np.random.default_rng(11)
    X = rng.standard_normal((80, 6))
    A = rng.standard_normal((6, 6))
    Q0, Rq = np.linalg.qr(A)
    R0 = Q0 * np.sign(np.diag(Rq))
    Y = X @ R0 + 0.01 * rng.standard_normal((80, 6))
    xdf = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(80)], ["id", "v"]
    )
    ydf = spark.createDataFrame(
        [(i, Y[i].tolist()) for i in range(80)], ["id", "v"]
    )
    R, _ = procrustes_rotation(xdf, ydf, "id", "v", "v")
    err_opt = np.linalg.norm(X @ R - Y)
    assert err_opt <= np.linalg.norm(X - Y) + 1e-12
    B = rng.standard_normal((6, 6))
    Q1, Rq1 = np.linalg.qr(B)
    Q1 = Q1 * np.sign(np.diag(Rq1))
    assert err_opt <= np.linalg.norm(X @ Q1 - Y) + 1e-12
