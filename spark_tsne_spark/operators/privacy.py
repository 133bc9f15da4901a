"""Privacy audits over tabular data: k-anonymity risk reporting.

A record is k-anonymous when at least k rows share its combination
of quasi-identifiers (QI) — attributes that are individually benign
but jointly re-identifying (Sweeney, IJUFKS 2002). Before releasing
or training on user-adjacent tables, a pipeline wants the audit:
how many equivalence classes exist, how many rows sit in classes
smaller than k, and the class-size distribution.

Scale shape: ONE groupBy over the QI tuple collapses N rows to the
equivalence-class table (bounded by the QI domain, not by N; map-side
combine does the heavy lifting), then a second |classes|-sized
aggregation folds the report. Everything is exact integer counting —
no float crosses an engine boundary except the final at-risk ratio,
which is one division of two exact longs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Class-size bands for the distribution report: singletons are
# outright identifying, 2..k-1 are below threshold, then comfort
# tiers. Upper bounds are inclusive; None = unbounded.
_BANDS = ((1, 1), (2, 4), (5, 9), (10, 49), (50, None))


def _band(size: Column) -> Column:
    out = F.lit("50+")
    for lo, hi in reversed(_BANDS[:-1]):
        label = f"{lo}" if lo == hi else f"{lo}-{hi}"
        out = F.when(size <= hi, F.lit(label)).otherwise(out)
    return out


def k_anonymity_report(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Class-size-band report for the quasi-identifier tuple.

    Output: one row per occupied band — ``(size_band, n_classes,
    n_rows, n_rows_below_k, pct_rows)`` where ``n_rows_below_k``
    counts the band's rows living in classes of size < k (so the
    at-risk total is readable off any row subset) and ``pct_rows``
    is the band's share of all rows rounded to 6 (one exact-int
    division).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("need at least one quasi-identifier column")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").alias("sz")
    )
    total = classes.agg(F.sum("sz").alias("n_total"))
    return (
        classes.groupBy(_band(F.col("sz")).alias("size_band"))
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("n_rows_below_k"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "size_band",
            "n_classes",
            "n_rows",
            "n_rows_below_k",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("pct_rows"),
        )
    )
