"""Per-iteration distributed gradient kernels (exact + Barnes-Hut).

Executor-side numpy over Arrow batches (``mapInPandas``) — the Spark
translation of the reference's ``.glom()`` block kernels
(``TSNEGradient.scala``). One job per iteration (the reference runs
two: a numerator/Z pass then a gradient pass, ``SimpleTSNE.scala:44-58``;
the BH loss pass is a third, ``BHTSNE.scala:70-77``). Fusing is
possible because the gradient decomposes:

    dY_i = 4·Σ_j (p−q)·num·(y_i−y_j)
         = 4·( Σ_j p·num·(y_i−y_j)  −  (1/Z)·Σ_j num²·(y_i−y_j) )
         = 4·( posF_i − negF_i / Z )

so each partition emits per-row (posF, negF) plus partial scalars
(Z, Σ p·log(p/num), Σ p) and the driver finishes with
``loss = Σ ploss + log(Z)·Σp``. Deviation from the reference: the
reference clamps q = num/Z at 1e-12 before the subtraction
(``TSNEGradient.scala:48``); the fused form applies no clamp. The
clamp only bites when num/Z < 1e-12 (ultra-far pairs) where both terms
are numerically negligible; the BH path (which the reference treats as
the production path) never clamps forces at all.

Row identity: embeddings carry explicit ids (quirk Q1); kernels map
ids → positions in the broadcast Y via a broadcast lookup.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from spark_tsne_spark.sptree import SPTree, non_edge_forces

GRAD_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("posF", T.ArrayType(T.DoubleType())),
        T.StructField("negF", T.ArrayType(T.DoubleType())),
        T.StructField("znum", T.DoubleType()),
        T.StructField("ploss", T.DoubleType()),
        T.StructField("psum", T.DoubleType()),
    ]
)


def exact_gradient_pass(
    adjacency: DataFrame,
    bc_Y,
    bc_pos,
    exaggeration: float,
) -> DataFrame:
    """Exact-gradient map pass over the cached adjacency table.

    Fuses the reference's numerator (``TSNEGradient.computeNumerator``,
    ``TSNEGradient.scala:18-29``) and gradient/loss
    (``TSNEGradient.compute``, ``:40-76``) kernels into one block
    computation: for a block B,
    ``num = 1/(1 + (‖y_b‖² + ‖y‖² − 2·Y_B·Yᵀ))`` with the diagonal
    zeroed, then sparse positive forces over the P-neighbors and dense
    negative forces over all columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Y = bc_Y.value
        pos = bc_pos.value
        sumY = (Y * Y).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["i"].to_numpy()
            bi = np.array([pos[v] for v in ids])
            Yb = Y[bi]
            # Student-t numerator block (diagonal zeroed)
            num = 1.0 / (
                1.0 + (sumY[None, :] + (Yb * Yb).sum(axis=1)[:, None] - 2.0 * (Yb @ Y.T))
            )
            num[np.arange(len(bi)), bi] = 0.0
            znum = num.sum(axis=1)
            # dense negative term: Σ_j num²·(y_i − y_j)
            num2 = num * num
            negF = num2.sum(axis=1)[:, None] * Yb - num2 @ Y
            posF = np.empty_like(negF)
            ploss = np.empty(len(bi))
            psum = np.empty(len(bi))
            for r in range(len(bi)):
                js = np.array([pos[v] for v in pdf["js"].iloc[r]])
                p = np.asarray(pdf["ps"].iloc[r], dtype=np.float64) * exaggeration
                pn = p * num[r, js]
                posF[r] = pn.sum() * Yb[r] - pn @ Y[js]
                with np.errstate(divide="ignore", invalid="ignore"):
                    lrow = p * np.log(p / num[r, js])
                ploss[r] = np.nan_to_num(lrow, nan=0.0, posinf=0.0).sum()
                psum[r] = p.sum()
            yield pd.DataFrame(
                {
                    "i": ids,
                    "posF": list(posF),
                    "negF": list(negF),
                    "znum": znum,
                    "ploss": ploss,
                    "psum": psum,
                }
            )

    return adjacency.mapInPandas(run, GRAD_SCHEMA)


def bh_gradient_pass(
    adjacency: DataFrame,
    bc_Y,
    bc_pos,
    bc_tree,
    theta: float,
    exaggeration: float,
) -> DataFrame:
    """Barnes-Hut map pass: sparse edge forces + tree-walk non-edge
    forces + sumQ partials, one job per iteration.

    Edge forces follow ``TSNEGradient.computeEdgeForces``
    (``TSNEGradient.scala:86-97``): posF_i = Σ_j p/(1+‖Δ‖²)·(y_i−y_j)
    over the sparse neighbors. Non-edge forces + sumQ follow the θ-walk
    (``:99-137``) via :func:`spark_tsne_spark.sptree.non_edge_forces`.
    The KL partials (Σ p·log(p/qnum), Σ p) ride along so the driver can
    report loss every iteration without the reference's separate loss
    job (``BHTSNE.scala:70-77``); clamp caveat as in the module doc.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Y = bc_Y.value
        pos = bc_pos.value
        tree = bc_tree.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["i"].to_numpy()
            bi = np.array([pos[v] for v in ids])
            Yb = Y[bi]
            negF, sumQ = non_edge_forces(tree, Yb, theta)
            posF = np.zeros_like(Yb)
            ploss = np.empty(len(bi))
            psum = np.empty(len(bi))
            for r in range(len(bi)):
                js = np.array([pos[v] for v in pdf["js"].iloc[r]])
                p = np.asarray(pdf["ps"].iloc[r], dtype=np.float64) * exaggeration
                diff = Yb[r] - Y[js]
                qnum = 1.0 / (1.0 + (diff * diff).sum(axis=1))
                posF[r] = (p * qnum) @ diff
                with np.errstate(divide="ignore", invalid="ignore"):
                    lrow = p * np.log(p / qnum)
                ploss[r] = np.nan_to_num(lrow, nan=0.0, posinf=0.0).sum()
                psum[r] = p.sum()
            yield pd.DataFrame(
                {
                    "i": ids,
                    "posF": list(posF),
                    "negF": list(negF),
                    "znum": sumQ,
                    "ploss": ploss,
                    "psum": psum,
                }
            )

    return adjacency.mapInPandas(run, GRAD_SCHEMA)


def assemble(
    rows: list,
    pos: dict,
    n: int,
    d: int,
    mode: str,
) -> tuple[np.ndarray, float, float]:
    """Driver-side assembly of the collected per-row force rows.

    Exact: dY = 4·(posF − negF/Z); BH: dY = posF − negF/sumQ
    (``BHTSNE.scala:66``). Loss = Σ ploss + log(Z)·Σp.
    """
    posF = np.zeros((n, d))
    negF = np.zeros((n, d))
    Z = 0.0
    ploss = 0.0
    psum = 0.0
    for r in rows:
        p = pos[r["i"]]
        posF[p] = r["posF"]
        negF[p] = r["negF"]
        Z += r["znum"]
        ploss += r["ploss"]
        psum += r["psum"]
    if mode == "exact":
        dY = 4.0 * (posF - negF / Z)
    else:
        dY = posF - negF / Z
    loss = ploss + math.log(Z) * psum
    return dY, Z, loss
