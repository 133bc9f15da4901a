"""Survival analysis: the Kaplan–Meier product-limit estimator.

The time-to-event question a product/pipeline team actually asks —
"how long until a user converts / a document is first re-crawled /
a job first fails", with subjects that HAVEN'T seen the event yet
counted correctly (censored) instead of dropped or treated as
converted-at-infinity. Dropping censored subjects biases the curve
down; ignoring censoring biases it up; KM is the standard unbiased
estimator (Kaplan & Meier, JASA 1958).

Definitions, with integer duration ``t`` per subject and event flag
``e`` (1 = event observed at t, 0 = censored at t):

- ``d_t``  = subjects with an observed event at exactly t
- ``n_t``  = subjects still at risk at t (duration >= t; the
  standard convention keeps same-time censored subjects in the risk
  set)
- ``S(t)`` = prod over event times u <= t of (1 - d_u / n_u)

Scale shape: one groupBy(duration) collapses N subjects to at most
``max_duration`` rows — for day-grained lifetimes that is thousands
of rows no matter how many subjects, so the descending-cumulative
risk window and the product fold both run on a bounded table. The
cumulative PRODUCT is the one piece Spark has no aggregate for;
``exp(sum(ln))`` would work but walks libm, whose last-ulp behavior
differs across engines. Instead the bounded curve is folded with a
strict left-to-right ``aggregate`` HOF over the factor array —
DuckDB's ``list_reduce`` performs the identical IEEE multiply
sequence, so the oracle replays the survival column bit-for-bit
before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def km_curve(
    subjects: DataFrame,
    duration_col: str = "t",
    event_col: str = "e",
    decimals: int = 6,
) -> DataFrame:
    """Kaplan–Meier curve over one-subject-per-row input.

    Input: ``duration_col`` (non-negative integer time units),
    ``event_col`` (1 = event at that time, 0 = right-censored).
    Output: one row per EVENT time t — ``(t, n_risk, d_events,
    km)`` with ``km`` = S(t) rounded to ``decimals``.

    The risk-set window and product fold run over the collapsed
    per-duration table (<= max duration rows), so the deliberate
    single-partition window is bounded regardless of subject count.
    """
    per_t = subjects.groupBy(
        F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.count("*").alias("m"),
        F.sum(F.col(event_col).cast("long")).alias("d"),
    )
    # at-risk at t = subjects with duration >= t: descending cumsum.
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        per_t.withColumn("n", F.sum("m").over(w_desc).cast("long"))
        .where(F.col("d") > 0)
        .select("t", "d", "n")
    )
    # Left-to-right product fold over the (sorted) factor array; the
    # oracle's list_reduce walks the same multiply sequence, so the
    # doubles agree exactly (see module docstring). 1.0 * f1 == f1,
    # so the explicit init matches DuckDB's init-less reduce.
    one = curve.agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "n"))
        ).alias("arr")
    )
    return (
        one.select(
            F.explode(
                F.expr(
                    "transform(arr, (x, i) -> struct("
                    "  x.t AS t, x.n AS n, x.d AS d,"
                    "  aggregate("
                    "    slice("
                    "      transform(arr, y ->"
                    "        CAST(y.n - y.d AS DOUBLE) / CAST(y.n AS DOUBLE)),"
                    "      1, i + 1),"
                    "    CAST(1.0 AS DOUBLE), (a, b) -> a * b) AS s))"
                )
            ).alias("r")
        )
        .select(
            F.col("r.t").alias("t"),
            F.col("r.n").alias("n_risk"),
            F.col("r.d").alias("d_events"),
            F.round(F.col("r.s"), decimals).alias("km"),
        )
    )
