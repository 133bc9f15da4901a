"""Vector column expressions (JVM-side, whole-stage-codegen friendly).

These build pure ``pyspark.sql.functions`` expressions over
``array<double>`` columns — no Python UDFs — so Catalyst keeps them
inside WholeStageCodegen and parquet scans stay prunable.

Reference kernels covered:
- L2 norm per row (reference ``X2P.scala:20``)
- squared Euclidean distance via the ``‖u‖² + ‖v‖² − 2·u·v`` expansion
  with precomputed norms (reference ``X2PHelper.scala:13-15``)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _arr(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    # Normalize float arrays to double so arithmetic is double-precision
    # end-to-end (matches the oracle, which computes in DOUBLE).
    return col.cast("array<double>")


def dot(u: Column | str, v: Column | str) -> Column:
    """Dot product of two array<double> columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(_arr(u), _arr(v), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(u: Column | str) -> Column:
    """L2 norm of an array column. Reference: ``X2P.scala:20``."""
    return F.sqrt(dot(u, u))


def sq_dist(u: Column | str, v: Column | str) -> Column:
    """Squared Euclidean distance, direct form Σ(u−v)²."""
    return F.aggregate(
        F.zip_with(_arr(u), _arr(v), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_dist_from_norms(
    u: Column | str, v: Column | str, norm_u: Column | str, norm_v: Column | str
) -> Column:
    """Squared distance via norm expansion: ‖u‖² + ‖v‖² − 2·u·v.

    Avoids re-summing squares when norms are precomputed once per row
    (reference ``X2PHelper.fastDistance``, ``X2PHelper.scala:13-15``).
    Clamped at 0 to absorb the catastrophic-cancellation case the
    reference guards with MLUtils' precision fallback.
    """
    nu = F.col(norm_u) if isinstance(norm_u, str) else norm_u
    nv = F.col(norm_v) if isinstance(norm_v, str) else norm_v
    return F.greatest(F.lit(0.0), nu * nu + nv * nv - 2.0 * dot(u, v))


def cosine_sim(u: Column | str, v: Column | str) -> Column:
    """Cosine similarity of two array columns."""
    return dot(u, v) / (l2_norm(u) * l2_norm(v))
