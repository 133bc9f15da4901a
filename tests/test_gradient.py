"""Gradient kernel tests: the F2 numerator golden case, the fused
one-pass decomposition vs a direct dense computation, and the
optimizer update semantics (D3-D4)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.gradient import assemble, exact_gradient_pass
from spark_tsne_spark.params import TSNEParam
from spark_tsne_spark.update import update


def numerator_block(Y, idx):
    """Direct form of the F2 fixture: num[r,c] = 1/(1+||Y[idx[r]]-Y[c]||²),
    diagonal zeroed (reference TSNEGradient.computeNumerator)."""
    d2 = ((Y[idx][:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    num = 1.0 / (1.0 + d2)
    for r, i in enumerate(idx):
        num[r, i] = 0.0
    return num


def test_numerator_golden_f2():
    # FIXTURES.md F2: Y = 3×2 column-major [1..6], idx = (0, 2)
    Y = np.arange(1.0, 7.0).reshape(3, 2, order="F")
    num = numerator_block(Y, [0, 2])
    for r, i in enumerate([0, 2]):
        for c in range(3):
            expected = 0.0 if c == i else 1.0 / (1.0 + ((Y[i] - Y[c]) ** 2).sum())
            assert abs(num[r, c] - expected) < 1e-12


def dense_reference_gradient(Y, P, exaggeration):
    """Straight dense implementation of dY = 4·Σ(p−q)·num·(y_i−y_j)
    and loss = Σ p·log(p/q) (no q clamp, matching the fused kernel)."""
    n = Y.shape[0]
    d2 = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    num = 1.0 / (1.0 + d2)
    np.fill_diagonal(num, 0.0)
    Z = num.sum()
    q = num / Z
    Px = P * exaggeration
    dY = 4.0 * np.einsum("ij,ijk->ik", (Px - q) * num, Y[:, None, :] - Y[None, :, :])
    mask = Px > 0
    loss = (Px[mask] * np.log(Px[mask] / q[mask])).sum()
    return dY, Z, loss


@pytest.mark.parametrize("exaggeration", [1.0, 4.0])
def test_fused_pass_matches_dense(spark, exaggeration):
    rng = np.random.default_rng(3)
    n = 40
    Y = rng.standard_normal((n, 2))
    # random sparse symmetric P
    P = np.zeros((n, n))
    for i in range(n):
        js = rng.choice([j for j in range(n) if j != i], size=8, replace=False)
        P[i, js] = rng.random(8)
    P = (P + P.T) / (2 * P.sum())
    rows = [
        (i, [int(j) for j in np.nonzero(P[i])[0]], [float(v) for v in P[i][P[i] > 0]])
        for i in range(n)
    ]
    adjacency = spark.createDataFrame(
        rows, "i long, js array<long>, ps array<double>"
    ).coalesce(2)
    sc = spark.sparkContext
    ids = np.arange(n, dtype=np.int64)
    bc_Y, bc_ids = sc.broadcast((Y, None)), sc.broadcast(ids)
    out = exact_gradient_pass(adjacency, bc_Y, bc_ids, exaggeration).toPandas()
    dY, Z, loss = assemble(out, ids, n, 2, "exact")
    dY_ref, Z_ref, loss_ref = dense_reference_gradient(Y, P, exaggeration)
    assert abs(Z - Z_ref) / Z_ref < 1e-9
    assert np.abs(dY - dY_ref).max() < 1e-9
    assert abs(loss - loss_ref) < 1e-8
    bc_Y.destroy(); bc_ids.destroy()


def test_update_semantics():
    """D3: gains +0.2 on sign flip else ×0.8 (floor 0.01); momentum
    switch after t_momentum; D4 recenter."""
    param = TSNEParam()
    Y = np.zeros((2, 2))
    dY = np.array([[1.0, -1.0], [0.5, 0.0]])
    iY = np.array([[1.0, 1.0], [-0.5, 0.0]])
    gains = np.ones((2, 2))
    update(Y, dY, iY, gains, iteration=1, param=param)
    # (dY>0)!=(iY>0): [[F,T],[T,F]] → gains [[0.8,1.2],[1.2,0.8]]
    assert np.allclose(gains, [[0.8, 1.2], [1.2, 0.8]])
    # momentum = initial (iter 1 <= 25)
    exp_iY = 0.5 * np.array([[1.0, 1.0], [-0.5, 0.0]]) - 500.0 * gains * dY
    assert np.allclose(iY, exp_iY)
    # Y recentered
    assert np.allclose(Y.mean(axis=0), 0.0, atol=1e-12)
    # min_gain floor
    g2 = np.full((1, 1), 0.01)
    update(np.zeros((1, 1)), np.ones((1, 1)), np.ones((1, 1)), g2, 1, param)
    assert g2[0, 0] >= param.min_gain


def test_lbfgs_tsne_smoke(spark, embeddings):
    from spark_tsne_spark.api import lbfgs_tsne

    res = lbfgs_tsne(
        embeddings, max_num_iterations=12, perplexity=10.0, seed=1,
        id_col="vec_id", features="embedding",
    )
    assert res.Y.shape[1] == 2
    assert np.all(np.isfinite(res.Y))
    ls = [l for _, l in res.losses]
    # (the optimizer may converge in very few steps at this scale —
    # the reference's own L-BFGS variant is self-declared broken; this
    # asserts the machinery runs and never diverges)
    assert len(ls) >= 1 and all(np.isfinite(v) for v in ls)
    assert ls[-1] <= ls[0] * 1.01
