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
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
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


def calibrated_neighbors(
    df: DataFrame,
    tol: float = 1e-5,
    perplexity: float = 30.0,
    id_col: str = "id",
    features: str = "features",
    method: str = "block",
) -> DataFrame:
    """Neighbor-list form of :func:`x2p`: ``(i, js, ps, beta)``."""
    mu = int(3 * perplexity)
    if method == "block":
        # Fused kNN + β bisection: one Python-worker pass, no Arrow
        # round-trip of the (i, js, ds) table between the two steps.
        # Bit-identical to knn_exact_block → calibrate (same
        # _calibrate_row on the same float64 distances).
        return knn_exact_block(
            df, mu, id_col, features, calibrate=(perplexity, tol)
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
