"""Feature-engineering operators for model-training pipelines:
weight-of-evidence (WOE) binning with information value, and
leakage-safe leave-one-out / m-estimate target encoding.

Both are classic supervised-encoding steps that run over the FULL
training corpus, so they are built as single-pass aggregations whose
driver state is O(|bins|) / O(|categories|) — never O(rows):

- WOE bins by equal-frequency ntile (engine-stable: ordered by the
  binned measure with an integer tie-break), then ONE groupBy
  produces per-bin positive/negative counts; WOE and the IV terms
  are scalar expressions of those exact integer counts.
- Target encoding never materializes a per-row encoded column for
  the audit: with a binary target the leave-one-out value takes only
  TWO distinct values per category ((pos-1)/(n-1) for positive rows,
  pos/(n-1) for negative rows), so the closed form is exact and the
  output is |categories| rows. The m-estimate variant
  (pos + m·prior)/(n + m) shrinks rare categories toward the global
  prior — the standard high-cardinality-safe form.

Float discipline (hash-stable across engines): all ratios are single
scalar expressions over exact BIGINT counts — one IEEE division /
log per output cell, never a float accumulation across rows — then
rounded once. At 100 TB both are one shuffle on the bin/category key
with map-side partial aggregation; the ntile window for binning uses
the same global-rank shape as the green quantile/deciles entries
(repartitionByRange + partition offsets is the cluster-scale rank
path, see operators/quantiles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def woe_iv(
    df: DataFrame,
    measure_col: str,
    target_col: str,
    tie_col: str,
    n_bins: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """Equal-frequency WOE binning of ``measure_col`` against the
    binary ``target_col`` (0/1 ints). Returns one row per bin:
    ``bin, n, n_pos, n_neg, woe, iv_term`` plus the constant
    ``iv_total`` column (sum of ROUNDED iv terms — bounded-cardinality
    sum over n_bins values, rounded again on the same grid).

    WOE_i = ln(pos_i·neg_tot / (neg_i·pos_tot)) — the argument is an
    exact integer rational (products stay under 2^53 for corpora up
    to ~90M positives × negatives per bin), so both engines take the
    log of the IDENTICAL double.
    """
    w = Window.orderBy(F.col(measure_col).asc(), F.col(tie_col).asc())
    binned = df.select(
        F.ntile(n_bins).over(w).alias("bin"),
        F.col(target_col).cast("long").alias("y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = per_bin.agg(
        F.sum("n_pos").cast("long").alias("pos_tot"),
        F.sum("n_neg").cast("long").alias("neg_tot"),
    )
    scored = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        "n_neg",
        F.round(
            F.log(
                (F.col("n_pos") * F.col("neg_tot")).cast("double")
                / (F.col("n_neg") * F.col("pos_tot")).cast("double")
            ),
            decimals,
        ).alias("woe"),
        F.round(
            (
                (
                    F.col("n_pos") * F.col("neg_tot")
                    - F.col("n_neg") * F.col("pos_tot")
                ).cast("double")
                / (F.col("pos_tot") * F.col("neg_tot")).cast("double")
            )
            * F.log(
                (F.col("n_pos") * F.col("neg_tot")).cast("double")
                / (F.col("n_neg") * F.col("pos_tot")).cast("double")
            ),
            decimals,
        ).alias("iv_term"),
    )
    wsum = Window.partitionBy(F.lit(1))
    return scored.select(
        "*",
        F.round(F.sum("iv_term").over(wsum), decimals).alias("iv_total"),
    ).orderBy("bin")


def target_encoding_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    m: float = 10.0,
    decimals: int = 6,
) -> DataFrame:
    """Leave-one-out + m-estimate target encoding audit for a binary
    target. One row per category: ``category, n, n_pos, enc_if_pos,
    enc_if_neg, enc_smoothed`` — the two closed-form LOO values a row
    of each class receives (leakage-safe: a row's own label never
    feeds its encoding) and the m-estimate shrinkage toward the
    global prior. All from ONE groupBy over exact integer counts.

    Categories with n == 1 get NULL LOO values (the 0/0 case) — the
    smoothed column is the defined fallback, which is exactly why the
    m-estimate form exists.
    """
    per_cat = (
        df.select(
            F.col(category_col).alias("category"),
            F.col(target_col).cast("long").alias("y"),
        )
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    tot = per_cat.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("n_pos").cast("long").alias("pos_tot"),
    )
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            "n_pos",
            F.when(
                F.col("n") > 1,
                F.round(
                    (F.col("n_pos") - 1).cast("double")
                    / (F.col("n") - 1).cast("double"),
                    decimals,
                ),
            ).alias("enc_if_pos"),
            F.when(
                F.col("n") > 1,
                F.round(
                    F.col("n_pos").cast("double")
                    / (F.col("n") - 1).cast("double"),
                    decimals,
                ),
            ).alias("enc_if_neg"),
            F.round(
                (
                    F.col("n_pos").cast("double")
                    + F.lit(m)
                    * (
                        F.col("pos_tot").cast("double")
                        / F.col("n_tot").cast("double")
                    )
                )
                / (F.col("n").cast("double") + F.lit(m)),
                decimals,
            ).alias("enc_smoothed"),
        )
        .orderBy("category")
    )
