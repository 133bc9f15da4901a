"""X2P — perplexity→probability affinity calibration.

Re-implements the reference's most "relational" query
(``X2P.scala:14-74``): for each row, find the μ = ⌊3·perplexity⌋
nearest neighbors, then binary-search a precision β_i so the entropy
of ``P_i = softmax(−D_i·β_i)`` equals ``log(perplexity)``, and emit
the sparse conditional probabilities ``p_{j|i}`` in COO form.

Spark mapping (SURVEY.md §2.3):
- X1-X6 (norms, pairs, distances, top-k): ``operators.knn``
- X7-X8 (per-row bisection + Hbeta entropy kernel): a vectorized
  numpy loop inside ``mapInPandas`` — embarrassingly parallel, one
  narrow stage, no shuffle.
- X9 (COO re-emit): ``explode(arrays_zip(js, ps))``.

Numerical semantics preserved from the reference:
- ≤ 50 bisection steps, doubling/halving while the bracket is
  unbounded (``X2P.scala:36-70``)
- ``Hbeta`` with **no max-subtraction** before exp; an all-zero row
  yields (H=0, P=0) (``X2PHelper.scala:17-26``, quirk Q6 — underflow
  risk documented, behavior replicated)
"""

from __future__ import annotations

import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from spark_tsne_spark.operators.knn import knn_exact_block, knn_lsh

CALIBRATED_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("js", T.ArrayType(T.LongType())),
        T.StructField("ps", T.ArrayType(T.DoubleType())),
        T.StructField("beta", T.DoubleType()),
    ]
)


def hbeta(d: np.ndarray, beta: float) -> tuple[float, np.ndarray]:
    """Entropy + normalized Gaussian kernel row (``X2PHelper.scala:17-26``).

    P = exp(−D·β); H = log ΣP + β·Σ(D∘P)/ΣP; returns (H, P/ΣP).
    Zero-sum guard returns (0, zeros) exactly like the reference.
    No max-subtraction (quirk Q6) — replicated for parity.
    """
    p = np.exp(-d * beta)
    sum_p = p.sum()
    if sum_p == 0.0:
        return 0.0, np.zeros_like(d)
    h = math.log(sum_p) + beta * float((d * p).sum()) / sum_p
    return h, p / sum_p


def _calibrate_row(d: np.ndarray, log_u: float, tol: float, max_tries: int = 50):
    """Per-row bisection on β until H(β) ≈ log(perplexity).

    Doubling/halving while the bracket is one-sided, then bisection —
    the exact search scheme of ``X2P.scala:36-70`` (≤50 tries).
    """
    beta = 1.0
    beta_min, beta_max = -math.inf, math.inf
    h, p = hbeta(d, beta)
    h_diff = h - log_u
    tries = 0
    while abs(h_diff) > tol and tries < max_tries:
        if h_diff > 0:
            beta_min = beta
            beta = beta * 2.0 if math.isinf(beta_max) else (beta + beta_max) / 2.0
        else:
            beta_max = beta
            beta = beta / 2.0 if math.isinf(beta_min) else (beta + beta_min) / 2.0
        h, p = hbeta(d, beta)
        h_diff = h - log_u
        tries += 1
    return beta, p


_CAL_WS: dict = {}


def _calibrate_rows(
    D: np.ndarray, log_u: float, tol: float, max_tries: int = 50
) -> tuple[np.ndarray, np.ndarray]:
    """Batch form of :func:`_calibrate_row` over an (m, k) distance
    matrix — bit-identical outputs, one vectorized bisection.

    The per-row scalar loop spent most of its time in numpy call
    dispatch (90-element arrays, ~30 ufunc calls per bisection step);
    here every row advances one bisection step per pass with
    matrix-wide ``exp``/row-sums. Bit-identity with the scalar path
    holds because numpy's ``exp``, last-axis pairwise row sums, and
    elementwise multiplication/division produce identical floats for
    identical row data regardless of batch shape (pinned by
    ``tests/test_r9_fixes.py``); the one op where the vector path
    diverges from the scalar one — ``np.log`` vs ``math.log`` — stays
    a scalar ``math.log`` per row, exactly as in ``hbeta``.

    Allocation discipline (this host's private-anon page faults run
    ~6 MB/s — runtime.py): the two (m, k) work matrices live in a
    process-cached :func:`shared_empty` workspace and every matrix op
    lands in them via ``out=``; NO per-iteration compaction (shrinking
    fancy-index copies re-fault fresh heap every pass — the first
    version of this function lost 5x more to page faults than it
    saved in dispatch). Finished rows simply stop having their β/P
    overwritten; the extra masked flops on a 256×90 block are noise.
    """
    D = np.ascontiguousarray(D, dtype=np.float64)
    m, k = D.shape
    ws = _CAL_WS.get("buf")
    if ws is None or ws[0].shape[0] < m or ws[0].shape[1] != k:
        from spark_tsne_spark.runtime import shared_empty

        rows = max(m, 256)
        ws = (shared_empty((rows, k)), shared_empty((rows, k)))
        _CAL_WS["buf"] = ws
    P = ws[0][:m]
    T = ws[1][:m]

    beta = np.ones(m, dtype=np.float64)
    beta_min = np.full(m, -math.inf)
    beta_max = np.full(m, math.inf)
    beta_out = np.empty(m, dtype=np.float64)
    P_out = np.empty((m, k), dtype=np.float64)
    h_diff = np.empty(m, dtype=np.float64)
    open_rows = np.ones(m, dtype=bool)  # not yet converged/capped

    def _eval_rows(rows_idx) -> None:
        # hbeta for the given rows: P=exp(−D·β) into the workspace;
        # h−log_u into h_diff. Zero-sum rows get h=0 (scalar guard).
        np.multiply(D, beta[:, None], out=T)
        np.negative(T, out=T)
        np.exp(T, out=P)
        sum_p = P.sum(axis=1)
        np.multiply(D, P, out=T)
        dp = T.sum(axis=1)
        for r in rows_idx:
            sp = sum_p[r]
            if sp == 0.0:
                h = 0.0
            else:
                h = math.log(sp) + beta[r] * dp[r] / sp
            h_diff[r] = h - log_u

    def _freeze(rows_idx) -> None:
        # capture a row's (β, normalized P) at ITS exit iteration
        sum_p = P.sum(axis=1)
        for r in rows_idx:
            beta_out[r] = beta[r]
            sp = sum_p[r]
            P_out[r] = P[r] / sp if sp != 0.0 else 0.0

    all_rows = np.arange(m)
    _eval_rows(all_rows)
    tries = 0
    while True:
        with np.errstate(invalid="ignore"):
            newly_done = open_rows & ~(
                (np.abs(h_diff) > tol) & (tries < max_tries)
            )
        if newly_done.any():
            _freeze(np.flatnonzero(newly_done))
            open_rows &= ~newly_done
            if not open_rows.any():
                break
        up = h_diff > 0
        beta_min = np.where(open_rows & up, beta, beta_min)
        beta_max = np.where(open_rows & ~up, beta, beta_max)
        # doubling/halving while one-sided, else midpoint — same update
        # rule as the scalar path (X2P.scala:36-70)
        step = np.where(
            up,
            np.where(np.isinf(beta_max), beta * 2.0, (beta + beta_max) / 2.0),
            np.where(np.isinf(beta_min), beta / 2.0, (beta + beta_min) / 2.0),
        )
        beta = np.where(open_rows, step, beta)
        _eval_rows(np.flatnonzero(open_rows))
        tries += 1
    return beta_out, P_out


def calibrate(
    neighbors: DataFrame, perplexity: float = 30.0, tol: float = 1e-5
) -> DataFrame:
    """Run the β bisection over a ``(i, js, ds)`` neighbor-list table.

    Returns ``(i, js, ps, beta)`` — one row per point, conditional
    probabilities aligned with ``js``.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(neighbors.sparkSession)
    log_u = math.log(perplexity)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = {len(x) for x in pdf["ds"]}
            if len(lens) == 1:
                # rectangular neighbor lists (the usual case): one
                # batched bisection over the whole Arrow batch
                D = np.array(pdf["ds"].tolist(), dtype=np.float64)
                betas_a, P = _calibrate_rows(D, log_u, tol)
                betas = betas_a.tolist()
                ps_out = list(P)
                yield pd.DataFrame(
                    {"i": pdf["i"], "js": pdf["js"], "ps": ps_out, "beta": betas}
                )
                continue
            betas, ps_out = [], []
            for ds in pdf["ds"]:
                d = np.asarray(ds, dtype=np.float64)
                beta, p = _calibrate_row(d, log_u, tol)
                betas.append(beta)
                ps_out.append(p.tolist())
            yield pd.DataFrame(
                {"i": pdf["i"], "js": pdf["js"], "ps": ps_out, "beta": betas}
            )

    return neighbors.mapInPandas(run, CALIBRATED_SCHEMA)


def x2p(
    df: DataFrame,
    tol: float = 1e-5,
    perplexity: float = 30.0,
    id_col: str = "id",
    features: str = "features",
    method: str = "block",
) -> DataFrame:
    """Affinity calibration: ``points → (i, j, p)`` sparse conditional P.

    Public-API twin of reference ``X2P.apply`` (``X2P.scala:14``).
    μ = ⌊3·perplexity⌋ neighbors are kept per row (``X2P.scala:18``).
    ``method``: 'block' (exact, broadcast-matrix numpy), or 'lsh'
    (approximate, for very large n).

    The reference runs an eager mean-σ diagnostic job inside X2P
    (``X2P.scala:72``, quirk Q2) — here diagnostics are opt-in via
    :func:`mean_sigma` to keep the plan lazy.
    """
    cal = calibrated_neighbors(df, tol, perplexity, id_col, features, method)
    return cal.select(
        "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
    ).select(
        F.col("i"),
        F.col("e.js").alias("j"),
        F.col("e.ps").alias("p"),
    )


def _probe_tau_from_env() -> float | None:
    """Parse ``SPARK_GRAFT_LSH_AFFINITY_PROBETAU``.

    Only unset/empty restores the ungated (round-11) behavior.
    Anything else must be a positive float: tau=0 would gate out
    EVERY probe row (``d < 0`` is never true), silently degrading
    multiprobe to single-probe, and a malformed value used to raise
    an uncontextualized ValueError (ADVICE r12).
    """
    tau_env = os.environ.get("SPARK_GRAFT_LSH_AFFINITY_PROBETAU")
    if tau_env in (None, ""):
        return None
    try:
        tau = float(tau_env)
    except ValueError:
        raise ValueError(
            "SPARK_GRAFT_LSH_AFFINITY_PROBETAU must be a positive "
            f"float, got {tau_env!r}"
        ) from None
    if tau <= 0:
        raise ValueError(
            "SPARK_GRAFT_LSH_AFFINITY_PROBETAU must be a positive "
            f"float, got {tau_env!r}"
        )
    return tau


def calibrated_neighbors(
    df: DataFrame,
    tol: float = 1e-5,
    perplexity: float = 30.0,
    id_col: str = "id",
    features: str = "features",
    method: str = "block",
    resources: list | None = None,
) -> DataFrame:
    """Neighbor-list form of :func:`x2p`: ``(i, js, ps, beta)``.

    ``resources``: optional list that receives any DataFrames the
    chosen kNN path persisted (the banded-LSH projections) so the
    caller can unpersist them once the calibrated output is
    materialized.
    """
    mu = int(3 * perplexity)
    if method == "block":
        # Fused kNN + β bisection: one Python-worker pass, no Arrow
        # round-trip of the (i, js, ds) table between the two steps.
        # Bit-identical to knn_exact_block → calibrate (same
        # _calibrate_row on the same float64 distances).
        return knn_exact_block(
            df, mu, id_col, features, calibrate=(perplexity, tol)
        )
    elif method == "lsh_banded":
        from spark_tsne_spark.operators.knn import (
            LSH_AFFINITY_N_PROBE,
            LSH_AFFINITY_TABLES,
            knn_lsh_banded_lists,
        )

        # list-form output: skips a full n·k flat-row regroup shuffle
        # (the banded kernel already merges per-row neighbor lists).
        # Dials are the measured 1M cost/recall knee (SCALE.md r11),
        # not the operator defaults the golden pins. probe_tau (the
        # r12 boundary-gated probe dial, SCALE.md r12 grid: tau=0.2
        # keeps recall 0.95 at ~2/3 the probe population) is exposed
        # as an env dial for scale runs; unset = ungated r11 behavior.
        nn = knn_lsh_banded_lists(
            df, mu, id_col, features,
            num_tables=LSH_AFFINITY_TABLES,
            n_probe=LSH_AFFINITY_N_PROBE,
            probe_tau=_probe_tau_from_env(),
            resources=resources,
        )
    elif method == "lsh":
        flat = knn_lsh(df, mu, id_col, features)
        # ONE collect_list of structs: two parallel collect_lists have
        # no contractual ordering guarantee relative to each other.
        nn = flat.groupBy("i").agg(
            F.collect_list(F.struct("j", "dist")).alias("nbr")
        ).select(
            "i",
            F.col("nbr.j").alias("js"),
            F.col("nbr.dist").alias("ds"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return calibrate(nn, perplexity, tol)


def mean_sigma(calibrated: DataFrame) -> float:
    """Diagnostic: mean σ = mean(sqrt(1/β)) (reference ``X2P.scala:72``)."""
    row = calibrated.agg(F.avg(F.sqrt(1.0 / F.col("beta"))).alias("s")).first()
    return float(row["s"])
