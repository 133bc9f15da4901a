"""Public t-SNE drivers: exact (SimpleTSNE) and Barnes-Hut (BHTSNE).

API twins of the reference entry points
(``SimpleTSNE.scala:15-21``, ``BHTSNE.scala:16-25``): take a points
table, run X2P affinity calibration, then the gradient-descent loop
with per-iteration callback. Differences by design (SURVEY.md §4, §7):

- input is a DataFrame with explicit ids (quirk Q1), not an unindexed
  RowMatrix;
- one Spark job per iteration (fused kernels, ``gradient.py``) instead
  of two/three;
- early exaggeration is applied at use-time as a multiplier gated on
  the iteration (the safe SimpleTSNE scheme), never by mutating the
  cached P (quirk Q4 — the reference's BH path mutates its cached RDD
  in place at iter 100, which silently un-reverts if a partition is
  recomputed from lineage);
- seeded determinism is within-engine; cross-engine checks are
  statistical (quirk Q8).

Scale note: like the reference, optimizer state Y/iY/gains is
driver-held and broadcast per iteration — O(n·d) doubles on the
driver. That is the algorithm's global synchronization point and holds
to ~10⁷ points; the distributed work (X2P kNN, per-iteration force
pass) is the part that scales with cluster size.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from spark_tsne_spark.gradient import (
    assemble,
    assemble_arrow,
    bh_block,
    bh_gradient_pass,
    exact_block,
    exact_gradient_pass,
)
from spark_tsne_spark.operators.affinities import P_CLAMP, compute_p
from spark_tsne_spark.params import TSNEParam
from spark_tsne_spark.sptree import FlatTree, SPTree
from spark_tsne_spark.update import update

logger = logging.getLogger(__name__)

Callback = Callable[[int, np.ndarray, "float | None"], None]

# Adaptive local execution: below these row counts the whole pipeline
# (kNN, calibration, per-iteration force pass) runs driver-side with
# the SAME kernel functions the distributed path uses — launching a
# cluster job per iteration for data that fits in one task is pure
# overhead (the same adaptivity principle AQE applies when it converts
# a shuffle join to a broadcast join at runtime). The exact threshold
# is lower because its kernel materializes an n×n numerator.
LOCAL_THRESHOLD_BH = 16384
LOCAL_THRESHOLD_EXACT = 4096
# Above this n, the per-iteration driver tree is built with coarse
# leaves (≤ TREE_LEAF_SIZE points per leaf; θ-rejected leaves expand
# EXACTLY in the walk — accuracy ≥ the fine tree's, sptree.FlatTree).
# Measured at 10M 2-D points (SCALE.md r11): build 52.7 s fine →
# 44.3 s coarse (the level-synchronous passes, not node count,
# dominate build time) and — the real win — the per-iteration
# broadcast shrinks ~4.4× (17.2M nodes / ~870 MB → 0.88M nodes +
# packed leaf points / 200 MB). Below the threshold the
# reference-exact structure is kept bit-for-bit.
TREE_COARSE_MIN_N = 2_000_000
TREE_LEAF_SIZE = 32
# 'auto' kNN picks 'block' while the broadcast n×d double matrix fits
# this budget, 'lsh' beyond it (~4M rows at d=64).
KNN_BROADCAST_BUDGET_BYTES = 2 << 30


@dataclass
class TSNEResult:
    ids: np.ndarray
    Y: np.ndarray
    losses: list  # [(iteration, loss)]

    def to_df(self, spark) -> DataFrame:
        """Embedding as ``(id long, y array<double>)``."""
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("y", T.ArrayType(T.DoubleType())),
            ]
        )
        # One Arrow conversion, not n Row objects — at 10⁵+ rows the
        # Row-list path spends seconds in per-object construction. The y
        # cells must be plain-Python floats: the non-Arrow
        # _createFromLocal verifier rejects numpy.float64 elements for
        # ArrayType(DoubleType), and sessions without Arrow (or with a
        # failed Arrow fallback) take that path.
        pdf = pd.DataFrame(
            {
                "id": np.asarray(self.ids, dtype=np.int64),
                "y": np.asarray(self.Y, dtype=np.float64).tolist(),
            }
        )
        return spark.createDataFrame(pdf, schema)


def _local_adjacency(pdf_points: pd.DataFrame, perplexity: float, tol: float):
    """Driver-local X2P + symmetrize for sub-threshold inputs.

    Same math as the distributed path end to end: chunked exact kNN
    (the ``knn_exact_block`` distance expansion), per-row β bisection
    (``_calibrate_row``), and the clamped Y1 symmetrization
    (``affinities.symmetrize``). Returns ``(adjacency (i, js, ps),
    ids_sorted)`` with neighbors sorted by j as ``to_adjacency`` does.
    """
    from spark_tsne_spark.operators.x2p import _calibrate_rows

    ids = pdf_points["i"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = np.array(pdf_points["f"].tolist(), dtype=np.float64)[order]
    n = len(ids)
    mu = min(int(3 * perplexity), n - 1)
    log_u = math.log(perplexity)
    sq = (X * X).sum(axis=1)
    chunk = max(256, min(n, (64 * 2**20) // (8 * max(1, n))))
    jpos_all = np.empty((n, mu), dtype=np.int64)
    ps_all = np.empty((n, mu), dtype=np.float64)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        d = sq[lo:hi, None] + sq[None, :] - 2.0 * (X[lo:hi] @ X.T)
        np.maximum(d, 0.0, out=d)
        d[np.arange(hi - lo), np.arange(lo, hi)] = np.inf  # exclude self
        # row-loop 1-D argpartition: bit-identical selection to the
        # axis=1 form (same introselect per row), ~4x faster — see
        # knn_exact_block
        idx = np.empty((hi - lo, mu), dtype=np.intp)
        for r in range(hi - lo):
            idx[r] = np.argpartition(d[r], mu - 1)[:mu]
        # batched β bisection — bit-identical to the per-row scalar
        # loop (pinned in tests/test_r9_fixes.py) and what the
        # distributed kernel already uses; the scalar loop spent
        # ~0.5 s/2000 rows in numpy call dispatch (profiled r13 pt 2)
        _, ps = _calibrate_rows(
            np.take_along_axis(d, idx, axis=1), log_u, tol
        )
        jpos_all[lo:hi] = idx
        ps_all[lo:hi] = ps
    # Y1 symmetrization on positions: p_ij = max((p_ji+p_ij)/2n, clamp)
    ipos = np.repeat(np.arange(n, dtype=np.int64), mu)
    jpos = jpos_all.ravel()
    key = np.concatenate([ipos * n + jpos, jpos * n + ipos])
    val = np.concatenate([ps_all.ravel(), ps_all.ravel()])
    uk, inv = np.unique(key, return_inverse=True)
    pj = np.maximum(np.bincount(inv, weights=val) / (2.0 * n), P_CLAMP)
    si = (uk // n).astype(np.int64)
    sj = (uk % n).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(np.bincount(si, minlength=n))])
    adjacency = pd.DataFrame(
        {
            "i": ids,
            "js": [ids[sj[offs[r] : offs[r + 1]]].tolist() for r in range(n)],
            "ps": [pj[offs[r] : offs[r + 1]].tolist() for r in range(n)],
        }
    )
    return adjacency, ids


def _resolve_knn_method(method: str, n: int, d: int) -> str:
    """Pick the kNN path from the data, not hope.

    'block' broadcasts the full n×d double matrix to every executor
    (and first collects it on the driver) — exact and fast while it
    fits, a driver OOM when it doesn't. 'auto' chooses 'block' under
    :data:`KNN_BROADCAST_BUDGET_BYTES` and 'lsh_banded' above (the
    band-amplified bucket join with a hot-bucket cap — see
    ``operators/knn.knn_lsh_banded`` for why MLlib's single-projection
    ``approxSimilarityJoin`` is not usable at that size); an explicit
    'block' above budget is honored but warned about.
    """
    est = n * d * 8
    if method == "auto":
        if est > KNN_BROADCAST_BUDGET_BYTES:
            logger.info(
                "knn auto: n*d*8 = %.1f GB exceeds broadcast budget; "
                "using 'lsh_banded'",
                est / 2**30,
            )
            return "lsh_banded"
        return "block"
    if method == "block" and est > KNN_BROADCAST_BUDGET_BYTES:
        logger.warning(
            "knn_method='block' broadcasts ~%.1f GB (n=%d, d=%d) — above the "
            "%.1f GB budget; expect driver/executor memory pressure. "
            "Use knn_method='auto' or 'lsh_banded'.",
            est / 2**30, n, d, KNN_BROADCAST_BUDGET_BYTES / 2**30,
        )
    return method


def _prepare(
    df, perplexity, id_col, features, method, mode, local_threshold=None,
    profile=None,
):
    """X2P + symmetrize + adjacency, cached for the loop.

    Inputs at or below the local threshold (see module constants) run
    the whole affinity pipeline driver-side and return a pandas
    adjacency — ``_loop`` then iterates without launching jobs.

    Partition sizing: per-iteration task overhead dominates when
    blocks are tiny, and the exact kernel materializes a k×n double
    block per task, so blocks are sized for ~64 MB of numerator in
    exact mode (capped at 2× parallelism for balance) and ≥256 rows
    in BH mode (capped at 1× parallelism — the pass is latency-bound,
    see the BH branch below).
    """
    from spark_tsne_spark.shipping import ship_package

    import time as _time

    ship_package(df.sparkSession)
    if df.storageLevel.useMemory is False and df.storageLevel.useDisk is False:
        logger.warning("Input is not persisted and performance could be bad")
    t0 = _time.time()
    n = df.count()
    first = df.select(F.size(F.col(features)).alias("d")).first()
    d = int(first["d"]) if first is not None else 0
    if profile is not None:
        profile["input_count_sec"] = round(_time.time() - t0, 3)
    method = _resolve_knn_method(method, n, d)
    if local_threshold is None:
        local_threshold = LOCAL_THRESHOLD_BH if mode == "bh" else LOCAL_THRESHOLD_EXACT
    if method == "block" and 1 < n <= local_threshold:
        pdf_points = df.select(
            F.col(id_col).alias("i"),
            F.col(features).cast("array<double>").alias("f"),
        ).toPandas()
        adjacency, ids = _local_adjacency(pdf_points, perplexity, tol=1e-5)
        if profile is not None:
            profile["affinity_sec"] = round(_time.time() - t0, 3)
            profile["affinity_path"] = "local"
        return adjacency, ids, n
    par = df.sparkSession.sparkContext.defaultParallelism
    if mode == "exact":
        rows_per_block = max(1, (64 * 2**20) // (8 * max(1, n)))
        parts = max(1, min(2 * par, -(-n // rows_per_block)))
    else:
        # BH: cheap per-row work (vectorized tree walk ~µs/row). One
        # task per core, not 2× — the per-iteration pass is latency-
        # bound, so a second task wave costs a full extra round of
        # scheduler + Python-worker round-trips for no balance win on
        # near-uniform blocks. Blocks still ≥256 rows.
        parts = max(1, min(par, -(-n // 256)))
    t0 = _time.time()
    from spark_tsne_spark.operators.x2p import calibrated_neighbors

    resources: list = []
    cal = calibrated_neighbors(
        df, tol=1e-5, perplexity=perplexity, id_col=id_col,
        features=features, method=method, resources=resources,
    )
    # Symmetrize via the explode-both → single-hash-partition →
    # tungsten-sum → regroup chain. MEASURED CHOICE (rounds 11 AND
    # 12): the array-packed alternative
    # (affinities.adjacency_from_calibrated — half the shuffle rows,
    # one aggregation) loses at BOTH measured shapes — 1.2 s vs 2.0 s
    # at 50k flagship shape (scripts/ab_symmetrize.py, r11) and
    # 42.8 s vs 91.7 s at 1M rows / 180M thin rows
    # (scripts/ab_affinity_1m.py, r12, the row-bound regime the r11
    # note said to revisit): whole-stage-codegen HashAggregate over
    # thin rows beats ObjectHashAggregate + per-row map building even
    # when the packed path's shuffle is half the rows. The chain is
    # one exchange end-to-end (HashPartitioning(i) satisfies both
    # aggregations — verified in the executed plan).
    p_ji = cal.select(
        "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
    ).select("i", F.col("e.js").alias("j"), F.col("e.ps").alias("p"))
    adjacency = compute_p(p_ji, n, parts).cache()
    ids = np.sort(adjacency.select("i").toPandas()["i"].to_numpy(dtype=np.int64))
    # kNN-path intermediates (the banded-LSH projection cache) are
    # consumed now that the adjacency is materialized — release them
    # instead of pinning executor storage for the whole loop (ADVICE
    # r10).
    for r in resources:
        r.unpersist()
    if len(ids) < n:
        # approximate kNN can drop rows whose every bucket assignment
        # is a singleton — surface it (free: n and ids exist anyway)
        # instead of silently shrinking the affinity matrix.
        logger.warning(
            "%d of %d input rows produced no neighbors (%s kNN coverage "
            "gap) and are absent from the embedding",
            n - len(ids), n, method,
        )
    if profile is not None:
        # One fused job in production (kNN → β calibration → symmetrize
        # → cache), so it is timed as one stage — splitting it would
        # mean materializing intermediates the real plan doesn't.
        profile["affinity_sec"] = round(_time.time() - t0, 3)
        profile["affinity_path"] = f"distributed/{method}"
    return adjacency, ids, len(ids)


def _loop(
    adjacency,
    ids,
    n,
    no_dims,
    max_iterations,
    param,
    mode,
    theta,
    report_loss,
    callback,
    seed,
    y_scale,
    profile=None,
):
    """AQE-scoping wrapper over :func:`_loop_impl` (round 13,
    VERDICT r12 #4): the distributed per-iteration job is a fixed
    shuffle-less plan (mapInPandas/mapInArrow over the cached
    adjacency + driver collect), so AdaptiveSparkPlan wrapping buys
    nothing and costs real per-job re-planning — measured ABBA at the
    50k flagship shape (`scripts/ab_iter_floor.py`, min-of-6):
    0.618 s/iter with AQE vs 0.528 s without (means 0.74 → 0.59);
    the leaf-plan (localCheckpoint) variant saved a further ~0.03-
    0.05 s/iter but costs 0.57 s up front — not worth it at 10
    iterations, rejected. AQE changes physical planning only, never
    results; the conf is restored even on failure. Note for callbacks:
    user code inside ``callback`` runs with AQE off for the loop's
    duration."""
    if isinstance(adjacency, pd.DataFrame):
        return _loop_impl(
            adjacency, ids, n, no_dims, max_iterations, param, mode,
            theta, report_loss, callback, seed, y_scale, profile,
        )
    spark = adjacency.sparkSession
    try:
        prev = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:  # pragma: no cover - conf unavailable
        prev = None
    if prev != "true":
        return _loop_impl(
            adjacency, ids, n, no_dims, max_iterations, param, mode,
            theta, report_loss, callback, seed, y_scale, profile,
        )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _loop_impl(
            adjacency, ids, n, no_dims, max_iterations, param, mode,
            theta, report_loss, callback, seed, y_scale, profile,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def _loop_impl(
    adjacency,
    ids,
    n,
    no_dims,
    max_iterations,
    param,
    mode,
    theta,
    report_loss,
    callback,
    seed,
    y_scale,
    profile=None,
):
    import time as _time

    local = isinstance(adjacency, pd.DataFrame)
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, no_dims)) * y_scale
    iY = np.zeros((n, no_dims))
    gains = np.ones((n, no_dims))
    if not local:
        sc = adjacency.sparkSession.sparkContext
        bc_ids = sc.broadcast(ids)
    elif mode == "bh":
        # The flat edge arrays are loop-invariant: flatten ONCE, then
        # every iteration is pure array kernels with no pandas churn.
        from spark_tsne_spark.gradient import _flatten_edges, bh_forces

        bi_l = np.searchsorted(ids, adjacency["i"].to_numpy())
        row_of_l, jpos_l, p_base = _flatten_edges(adjacency, ids, 1.0)
    losses = []
    iter_secs = [] if profile is not None else None
    for iteration in range(1, max_iterations + 1):
        it0 = _time.time()
        exaggeration = (
            param.exaggeration_factor if iteration <= param.early_exaggeration else 1.0
        )
        if local:
            # Sub-threshold input: identical kernels, no job launch.
            if mode == "exact":
                res = exact_block(adjacency, Y, ids, exaggeration)
            else:
                posF, negF, sumQ, ploss, psum = bh_forces(
                    Y,
                    FlatTree.from_matrix(Y),
                    bi_l,
                    row_of_l,
                    jpos_l,
                    p_base * exaggeration,
                    theta,
                )
                Z = float(sumQ.sum())
                dY = np.zeros((n, no_dims))
                dY[bi_l] = posF - negF / Z
                loss = float(ploss.sum()) + math.log(Z) * float(psum.sum())
                update(Y, dY, iY, gains, iteration, param)
                want_loss = report_loss(iteration) if callable(report_loss) else True
                if want_loss:
                    losses.append((iteration, loss))
                if callback is not None:
                    callback(iteration, Y.copy(), loss if want_loss else None)
                if iter_secs is not None:
                    iter_secs.append(round(_time.time() - it0, 3))
                continue
        else:
            # First-iteration sub-stage attribution (verdict r8 #6):
            # iteration 1 historically ran ~2-3x the steady-state mean;
            # these timers say whether that is tree build, broadcast
            # first-ship, or the first force-pass job (Python-worker /
            # Arrow warmup) — recorded once, zero cost afterwards.
            attribute = profile is not None and iteration == 1
            if mode == "exact":
                bc_state = sc.broadcast((Y, None))
                pass_df = exact_gradient_pass(adjacency, bc_state, bc_ids, exaggeration)
            else:
                tb0 = _time.time()
                tree = FlatTree.build(
                    Y,
                    leaf_size=TREE_LEAF_SIZE if n >= TREE_COARSE_MIN_N else 1,
                )
                if attribute:
                    profile["iter1_tree_build_sec"] = round(_time.time() - tb0, 3)
                bb0 = _time.time()
                bc_state = sc.broadcast((Y, tree))
                if attribute:
                    profile["iter1_broadcast_sec"] = round(_time.time() - bb0, 3)
                pass_df = bh_gradient_pass(
                    adjacency, bc_state, bc_ids, theta, exaggeration
                )
            fp0 = _time.time()
            import os as _os

            arrow_collect = (
                _os.environ.get("SPARK_GRAFT_TSNE_ARROW_COLLECT", "1") != "0"
            )
            res = pass_df.toArrow() if arrow_collect else pass_df.toPandas()
            if attribute:
                profile["iter1_force_pass_sec"] = round(_time.time() - fp0, 3)
        if local:
            dY, Z, loss = assemble(res, ids, n, no_dims, mode)
        elif arrow_collect:
            dY, Z, loss = assemble_arrow(res, ids, n, no_dims, mode)
        else:
            dY, Z, loss = assemble(res, ids, n, no_dims, mode)
        update(Y, dY, iY, gains, iteration, param)
        if not local:
            bc_state.destroy()
        want_loss = report_loss(iteration) if callable(report_loss) else True
        if want_loss:
            losses.append((iteration, loss))
        if callback is not None:
            callback(iteration, Y.copy(), loss if want_loss else None)
        if iter_secs is not None:
            iter_secs.append(round(_time.time() - it0, 3))
    if not local:
        bc_ids.destroy()
    if profile is not None and iter_secs:
        profile["n_iters"] = len(iter_secs)
        profile["iter_sec_min"] = min(iter_secs)
        profile["iter_sec_max"] = max(iter_secs)
        profile["iter_sec_mean"] = round(sum(iter_secs) / len(iter_secs), 3)
        profile["iter_sec_first"] = iter_secs[0]
        profile["iter_sec_total"] = round(sum(iter_secs), 3)
    return TSNEResult(ids=ids, Y=Y, losses=losses)


def simple_tsne(
    df: DataFrame,
    no_dims: int = 2,
    max_iterations: int = 1000,
    perplexity: float = 30.0,
    callback: Callback | None = None,
    seed: int | None = None,
    param: TSNEParam = TSNEParam(),
    id_col: str = "id",
    features: str = "features",
    knn_method: str = "auto",
    local_threshold: int | None = None,
) -> TSNEResult:
    """Exact-gradient t-SNE (reference ``SimpleTSNE.tsne``).

    Y ~ N(0,1) seeded init (``SimpleTSNE.scala:26,32``); loss reported
    every iteration. ``local_threshold``: row count at or below which
    the identical kernels run driver-side with no per-iteration job
    (None → ``LOCAL_THRESHOLD_EXACT``; 0 forces the distributed path).
    """
    adjacency, ids, n = _prepare(
        df, perplexity, id_col, features, knn_method, "exact", local_threshold
    )
    return _loop(
        adjacency, ids, n, no_dims, max_iterations, param,
        mode="exact", theta=0.0, report_loss=lambda i: True,
        callback=callback, seed=seed, y_scale=1.0,
    )


def lbfgs_tsne(
    df: DataFrame,
    no_dims: int = 2,
    max_num_iterations: int = 1000,
    num_corrections: int = 10,
    convergence_tol: float = 1e-4,
    perplexity: float = 30.0,
    seed: int | None = None,
    param: TSNEParam = TSNEParam(),
    id_col: str = "id",
    features: str = "features",
    knn_method: str = "auto",
) -> TSNEResult:
    """L-BFGS t-SNE (reference ``LBFGSTSNE.tsne``, ``LBFGSTSNE.scala:20``).

    The reference flags its version "doesn't work at all"
    (``LBFGSTSNE.scala:15``); this one runs the same two-phase scheme
    (exaggerated P, then plain P) over the distributed KL
    objective/gradient, optimized by a pure-numpy L-BFGS
    (``optim.lbfgs_minimize``; breeze's LBFGS in the reference).
    Y flattens column-major (order='F'), matching the reference's
    reshape convention (``LBFGSTSNE.scala:97-99``). Experimental, as
    in the reference: momentum gradient descent (simple/bh) remains
    the production path.
    """
    from spark_tsne_spark.optim import lbfgs_minimize

    # L-BFGS stays on the distributed pass (experimental path; its
    # objective closure is built around broadcast state).
    adjacency, ids, n = _prepare(
        df, perplexity, id_col, features, knn_method, "exact", local_threshold=0
    )
    sc = adjacency.sparkSession.sparkContext
    rng = np.random.default_rng(seed)
    Y0 = rng.standard_normal((n, no_dims)) * 1e-4
    bc_ids = sc.broadcast(ids)
    losses: list = []

    def make_fg(exaggeration: float):
        def fg(x: np.ndarray):
            Y = x.reshape(n, no_dims, order="F")
            bc_state = sc.broadcast((np.ascontiguousarray(Y), None))
            pdf = exact_gradient_pass(adjacency, bc_state, bc_ids, exaggeration).toPandas()
            dY, _Z, loss = assemble(pdf, ids, n, no_dims, "exact")
            bc_state.destroy()
            return loss, dY.flatten(order="F")

        return fg

    # phase 1: exaggerated P; phase 2: plain P (LBFGSTSNE.scala:58-95).
    # Phase 1 gets at most half the budget: at the near-zero init the
    # exaggerated objective is nearly flat and L-BFGS converges (or
    # stalls) in a handful of steps.
    phase1 = min(param.early_exaggeration, max_num_iterations // 2)
    x = Y0.flatten(order="F")
    if phase1 > 0:
        x, f = lbfgs_minimize(
            make_fg(param.exaggeration_factor), x,
            max_iter=phase1, m=num_corrections, tol=convergence_tol,
            callback=lambda i, _x, fv: losses.append((i, fv)),
        )
    if max_num_iterations > phase1:
        off = len(losses)
        x, f = lbfgs_minimize(
            make_fg(1.0), x,
            max_iter=max_num_iterations - phase1, m=num_corrections,
            tol=convergence_tol,
            callback=lambda i, _x, fv: losses.append((off + i, fv)),
        )
    bc_ids.destroy()
    Y = x.reshape(n, no_dims, order="F")
    return TSNEResult(ids=ids, Y=Y, losses=losses)


def bh_tsne(
    df: DataFrame,
    no_dims: int = 2,
    max_iterations: int = 1000,
    perplexity: float = 30.0,
    theta: float = 0.5,
    report_loss: Callable[[int], bool] = lambda i: i % 10 == 0,
    callback: Callback | None = None,
    seed: int | None = None,
    param: TSNEParam = TSNEParam(),
    id_col: str = "id",
    features: str = "features",
    knn_method: str = "auto",
    local_threshold: int | None = None,
    profile: dict | None = None,
) -> TSNEResult:
    """Barnes-Hut t-SNE (reference ``BHTSNE.tsne``).

    Init Y ~ N(0,1)/1e4 (``BHTSNE.scala:36``); θ-criterion tree walk for
    negative forces; loss cadence every 10 iterations by default
    (``BHTSNE.scala:22``). Unlike the reference the loss costs nothing
    extra (it rides the gradient pass), but the cadence contract is
    kept. ``local_threshold``: row count at or below which the
    identical kernels run driver-side with no per-iteration job
    (None → ``LOCAL_THRESHOLD_BH``; 0 forces the distributed path).
    ``profile``: pass a dict to collect wall-clock stage timings
    (input count, fused affinity job, per-iteration min/mean/max) —
    purely observational, it never changes the plan.
    """
    adjacency, ids, n = _prepare(
        df, perplexity, id_col, features, knn_method, "bh", local_threshold,
        profile=profile,
    )
    return _loop(
        adjacency, ids, n, no_dims, max_iterations, param,
        mode="bh", theta=theta, report_loss=report_loss,
        callback=callback, seed=seed, y_scale=1e-4,
        profile=profile,
    )
