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

Per-iteration state (Y and, for BH, the flattened tree) travels as
ONE broadcast tuple — a single torrent round per iteration.

so each partition emits per-row (posF, negF) plus partial scalars
(Z, Σ p·log(p/num), Σ p) and the driver finishes with
``loss = Σ ploss + log(Z)·Σp``. Deviation from the reference: the
reference clamps q = num/Z at 1e-12 before the subtraction
(``TSNEGradient.scala:48``); the fused form applies no clamp. The
clamp only bites when num/Z < 1e-12 (ultra-far pairs) where both terms
are numerically negligible; the BH path (which the reference treats as
the production path) never clamps forces at all.

Row identity: embeddings carry explicit ids (quirk Q1); kernels map
global ids → positions in the broadcast Y with ``np.searchsorted``
against the broadcast *sorted* id vector — no Python dict in the hot
path. Per-neighbor work (edge forces, KL partials) is flattened to
(edge,)-shaped arrays and reduced with ``np.bincount`` — no per-row
Python loop.
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


def _flatten_edges(pdf: pd.DataFrame, ids_sorted: np.ndarray, exaggeration: float):
    """Explode the per-row neighbor lists to flat edge arrays.

    Returns (row_of [E], jpos [E], p [E]): edge e belongs to block row
    ``row_of[e]``, points at embedding position ``jpos[e]``, with
    (exaggerated) probability ``p[e]``.
    """
    lens = np.fromiter((len(x) for x in pdf["js"]), dtype=np.int64, count=len(pdf))
    js_all = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["js"]])
    p_all = (
        np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["ps"]])
        * exaggeration
    )
    row_of = np.repeat(np.arange(len(pdf)), lens)
    jpos = np.searchsorted(ids_sorted, js_all)
    return row_of, jpos, p_all


def bh_forces(
    Y: np.ndarray,
    tree,
    bi: np.ndarray,
    row_of: np.ndarray,
    jpos: np.ndarray,
    p: np.ndarray,
    theta: float,
):
    """Array-level Barnes-Hut force core over a block.

    ``bi``: embedding positions of the block rows; ``(row_of, jpos,
    p)``: flattened (already exaggerated) edges. The flat edge form is
    loop-invariant, so the driver-local path precomputes it once and
    calls this every iteration with zero pandas churn.
    Returns (posF, negF, znum, ploss, psum) arrays.
    """
    k = len(bi)
    Yb = Y[bi]
    negF, sumQ = non_edge_forces(tree, Yb, theta)
    diff = Yb[row_of] - Y[jpos]
    qnum = 1.0 / (1.0 + (diff * diff).sum(axis=1))
    w = p * qnum
    posF = np.empty_like(Yb)
    for c in range(Y.shape[1]):
        posF[:, c] = _rowsum(row_of, w * diff[:, c], k)
    ploss, psum = _kl_partials(row_of, p, qnum, k)
    return posF, negF, sumQ, ploss, psum


def _rowsum(row_of: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    return np.bincount(row_of, weights=values, minlength=k)


def _kl_partials(
    row_of: np.ndarray, p: np.ndarray, qnum: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row Σ p·log(p/qnum) (NaN/inf→0, reference semantics) and Σ p."""
    with np.errstate(divide="ignore", invalid="ignore"):
        lrow = p * np.log(p / qnum)
    lrow = np.nan_to_num(lrow, nan=0.0, posinf=0.0, neginf=0.0)
    return _rowsum(row_of, lrow, k), _rowsum(row_of, p, k)


def exact_block(
    pdf: pd.DataFrame,
    Y: np.ndarray,
    ids_sorted: np.ndarray,
    exaggeration: float,
) -> pd.DataFrame:
    """Exact-gradient kernel over one adjacency block.

    Fuses the reference's numerator (``TSNEGradient.computeNumerator``,
    ``TSNEGradient.scala:18-29``) and gradient/loss
    (``TSNEGradient.compute``, ``:40-76``) kernels into one block
    computation: for a block B,
    ``num = 1/(1 + (‖y_b‖² + ‖y‖² − 2·Y_B·Yᵀ))`` with the diagonal
    zeroed, then sparse positive forces over the P-neighbors and dense
    negative forces over all columns. Shared verbatim by the
    distributed ``mapInPandas`` pass and the small-input local path.
    """
    sumY = (Y * Y).sum(axis=1)
    k = len(pdf)
    ids = pdf["i"].to_numpy()
    bi = np.searchsorted(ids_sorted, ids)
    Yb = Y[bi]
    # Student-t numerator block (diagonal zeroed)
    num = 1.0 / (
        1.0 + (sumY[None, :] + (Yb * Yb).sum(axis=1)[:, None] - 2.0 * (Yb @ Y.T))
    )
    num[np.arange(k), bi] = 0.0
    znum = num.sum(axis=1)
    # dense negative term: Σ_j num²·(y_i − y_j)
    num2 = num * num
    negF = num2.sum(axis=1)[:, None] * Yb - num2 @ Y
    # sparse positive term over the P-neighbors, fully flattened
    row_of, jpos, p = _flatten_edges(pdf, ids_sorted, exaggeration)
    pn = p * num[row_of, jpos]
    posF = _rowsum(row_of, pn, k)[:, None] * Yb
    for c in range(Y.shape[1]):
        posF[:, c] -= _rowsum(row_of, pn * Y[jpos, c], k)
    ploss, psum = _kl_partials(row_of, p, num[row_of, jpos], k)
    return pd.DataFrame(
        {
            "i": ids,
            "posF": list(posF),
            "negF": list(negF),
            "znum": znum,
            "ploss": ploss,
            "psum": psum,
        }
    )


def exact_gradient_pass(
    adjacency: DataFrame,
    bc_state,
    bc_ids,
    exaggeration: float,
) -> DataFrame:
    """Exact-gradient map pass over the cached adjacency table.

    One :func:`exact_block` per Arrow batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        Y, _ = bc_state.value
        ids_sorted = bc_ids.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield exact_block(pdf, Y, ids_sorted, exaggeration)

    return adjacency.mapInPandas(run, GRAD_SCHEMA)


def bh_gradient_pass(
    adjacency: DataFrame,
    bc_state,
    bc_ids,
    theta: float,
    exaggeration: float,
) -> DataFrame:
    """Barnes-Hut map pass: sparse edge forces + tree-walk non-edge
    forces + sumQ partials, one job per iteration. Arrow-native
    (``mapInArrow``, round 12): the neighbor lists flatten zero-copy
    from the ListArray values buffer instead of the per-row
    ``np.concatenate`` loop the pandas conversion forces — the numeric
    core (:func:`bh_forces`) and the emitted rows are identical.

    Edge forces follow ``TSNEGradient.computeEdgeForces``
    (``TSNEGradient.scala:86-97``): posF_i = Σ_j p/(1+‖Δ‖²)·(y_i−y_j)
    over the sparse neighbors. Non-edge forces + sumQ follow the θ-walk
    (``:99-137``) via :func:`spark_tsne_spark.sptree.non_edge_forces`.
    The KL partials (Σ p·log(p/qnum), Σ p) ride along so the driver can
    report loss every iteration without the reference's separate loss
    job (``BHTSNE.scala:70-77``); clamp caveat as in the module doc.
    """
    run = _make_bh_arrow_run(bc_state, bc_ids, theta, exaggeration)
    return adjacency.mapInArrow(run, GRAD_SCHEMA)


def _make_bh_arrow_run(bc_state, bc_ids, theta: float, exaggeration: float):
    """Kernel factory for :func:`bh_gradient_pass` — separate so tests
    can drive the Arrow batch path directly (``bc_*`` only need a
    ``.value`` attribute)."""

    def run(batches):
        import pyarrow as pa

        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        Y, tree = bc_state.value
        ids_sorted = bc_ids.value
        d = Y.shape[1]
        for rb in batches:
            k = rb.num_rows
            if k == 0:
                continue
            names = rb.schema.names
            js = rb.column(names.index("js"))
            ps = rb.column(names.index("ps"))
            if js.null_count or rb.column(names.index("i")).null_count:
                raise ValueError("null entries in adjacency js lists")
            ids = rb.column(names.index("i")).to_numpy()
            # Zero-copy flatten of the neighbor lists: values buffer +
            # lengths, replacing the per-row concatenate loop of
            # ``_flatten_edges`` (the dominant Python cost at 10⁶ rows).
            # flatten() honors slice offsets but silently drops NULL
            # list entries — adjacency lists are null-free by
            # construction; check null_count FIRST (a null list entry
            # would otherwise surface as an opaque numpy cast error
            # from value_lengths()/to_numpy() before the length check
            # below could fire), then the length check guards against
            # any other silent drop.
            lens = np.asarray(js.value_lengths(), dtype=np.int64)
            js_all = np.asarray(js.flatten(), dtype=np.int64)
            if len(js_all) != int(lens.sum()):
                raise ValueError("null entries in adjacency js lists")
            p_all = np.asarray(ps.flatten(), dtype=np.float64) * exaggeration
            row_of = np.repeat(np.arange(k), lens)
            jpos = np.searchsorted(ids_sorted, js_all)
            bi = np.searchsorted(ids_sorted, ids)
            posF, negF, sumQ, ploss, psum = bh_forces(
                Y, tree, bi, row_of, jpos, p_all, theta
            )
            offs = np.arange(0, (k + 1) * d, d, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.ListArray.from_arrays(
                        offs, pa.array(np.ascontiguousarray(posF).reshape(-1))
                    ),
                    pa.ListArray.from_arrays(
                        offs, pa.array(np.ascontiguousarray(negF).reshape(-1))
                    ),
                    pa.array(np.asarray(sumQ, dtype=np.float64)),
                    pa.array(np.asarray(ploss, dtype=np.float64)),
                    pa.array(np.asarray(psum, dtype=np.float64)),
                ],
                names=["i", "posF", "negF", "znum", "ploss", "psum"],
            )

    return run


def bh_block(
    pdf: pd.DataFrame,
    Y: np.ndarray,
    tree,
    ids_sorted: np.ndarray,
    theta: float,
    exaggeration: float,
) -> pd.DataFrame:
    """Barnes-Hut kernel over one adjacency block (see
    :func:`bh_gradient_pass`); shared by the distributed pass and the
    small-input local path."""
    ids = pdf["i"].to_numpy()
    bi = np.searchsorted(ids_sorted, ids)
    row_of, jpos, p = _flatten_edges(pdf, ids_sorted, exaggeration)
    posF, negF, sumQ, ploss, psum = bh_forces(Y, tree, bi, row_of, jpos, p, theta)
    return pd.DataFrame(
        {
            "i": ids,
            "posF": list(posF),
            "negF": list(negF),
            "znum": sumQ,
            "ploss": ploss,
            "psum": psum,
        }
    )


def assemble(
    pdf: pd.DataFrame,
    ids_sorted: np.ndarray,
    n: int,
    d: int,
    mode: str,
) -> tuple[np.ndarray, float, float]:
    """Driver-side assembly of the per-row force rows (one Arrow pull).

    Exact: dY = 4·(posF − negF/Z); BH: dY = posF − negF/sumQ
    (``BHTSNE.scala:66``). Loss = Σ ploss + log(Z)·Σp.
    """
    bi = np.searchsorted(ids_sorted, pdf["i"].to_numpy())
    posF = np.zeros((n, d))
    negF = np.zeros((n, d))
    posF[bi] = np.array(pdf["posF"].tolist(), dtype=np.float64)
    negF[bi] = np.array(pdf["negF"].tolist(), dtype=np.float64)
    Z = float(pdf["znum"].sum())
    ploss = float(pdf["ploss"].sum())
    psum = float(pdf["psum"].sum())
    if mode == "exact":
        dY = 4.0 * (posF - negF / Z)
    else:
        dY = posF - negF / Z
    loss = ploss + math.log(Z) * psum
    return dY, Z, loss


def assemble_arrow(
    tbl,
    ids_sorted: np.ndarray,
    n: int,
    d: int,
    mode: str,
) -> tuple[np.ndarray, float, float]:
    """:func:`assemble` over a ``DataFrame.toArrow()`` result.

    The pandas collect spends ~58 ms/iteration at the 50k flagship
    shape building object cells for the two force-list columns and
    tearing them back apart with ``.tolist()``; the Arrow table's
    ListArray values buffer reshapes into the (rows, d) force block
    zero-copy instead (guide §4.2: lists are one values buffer plus
    offsets — re-slice, don't copy rows). Bit-identity: the force
    values are the same doubles either way (offsets are uniform d, so
    ``flatten().reshape(-1, d)`` is exactly the row-major block), and
    the three scalar reductions go through the same
    ``pd.Series(...).sum()`` pairwise path the pandas collect used —
    pinned by ``test_assemble_arrow_matches_pandas``.
    """
    bi = np.searchsorted(
        ids_sorted, tbl.column("i").combine_chunks().to_numpy()
    )
    posF = np.zeros((n, d))
    negF = np.zeros((n, d))
    pf = tbl.column("posF").combine_chunks()
    nf = tbl.column("negF").combine_chunks()
    # reshape(len(bi), d) (not -1): errors loudly if a null list entry
    # were ever silently dropped by flatten() instead of scrambling rows.
    posF[bi] = np.asarray(pf.flatten(), dtype=np.float64).reshape(len(bi), d)
    negF[bi] = np.asarray(nf.flatten(), dtype=np.float64).reshape(len(bi), d)
    Z = float(pd.Series(tbl.column("znum").combine_chunks().to_numpy()).sum())
    ploss = float(
        pd.Series(tbl.column("ploss").combine_chunks().to_numpy()).sum()
    )
    psum = float(
        pd.Series(tbl.column("psum").combine_chunks().to_numpy()).sum()
    )
    if mode == "exact":
        dY = 4.0 * (posF - negF / Z)
    else:
        dY = posF - negF / Z
    loss = ploss + math.log(Z) * psum
    return dY, Z, loss
