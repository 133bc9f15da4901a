"""Record-linkage scoring: blocked multi-field agreement with
Fellegi–Sunter-shaped additive weights.

Candidate generation (blocking, fuzzy joins, LSH) answers "which
pairs might match"; linkage SCORING answers "how strongly does the
field evidence say they do". Fellegi & Sunter (JASA 1969) weight
each field's agreement by log(m/u) — m = P(agree | match), u =
P(agree | non-match) — and sum: agreements on selective fields add
a lot, agreements on common fields add a little, disagreements
subtract. This module implements the comparison-vector + additive
weight machinery with caller-supplied integer weights (log-odds
pre-binned to integers, the practice in production linkers like
Splink's default levels), keeping every score an exact BIGINT sum —
no float crosses an engine boundary.

Scale shape: pairs come from an equi-join on the blocking key
(shuffle on block, never all-pairs); per-pair field comparisons are
codegen'd CASE/array expressions. Skewed blocks are the classic
failure — cap them upstream with the same windowed hot-key cap the
dedup family uses if the blocking key can go hot.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class FieldRule:
    """One comparison-vector entry: ``agree(a_col, b_col)`` is a
    boolean Column over the pair's two sides; ``w_agree``/``w_disagree``
    are the (integer) Fellegi–Sunter weights added to the score."""

    name: str
    agree: Callable[[Column, Column], Column]
    w_agree: int
    w_disagree: int


def linkage_score_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    rules: Sequence[FieldRule],
    min_score: int,
) -> DataFrame:
    """Score all within-block pairs (a < b by id) and keep those
    with total weight >= ``min_score``.

    Output: ``(a, b, <name>_agree ... per rule, score)`` — the
    agreement pattern ships with the score so reviewers can see WHY
    a pair matched (the comparison vector, not just the verdict).
    """
    if not rules:
        raise ValueError("need at least one FieldRule")
    # Project to the columns the join + rules touch (column pruning
    # would do this anyway, but the explicit projection keeps the
    # pair schema readable in explain output).
    used = list(
        dict.fromkeys([id_col, *block_cols, *(r.name for r in rules)])
    )
    left = df.select(*[F.col(c).alias(f"l_{c}") for c in used])
    right = df.select(*[F.col(c).alias(f"r_{c}") for c in used])
    cond = [
        left[f"l_{c}"] == right[f"r_{c}"] for c in block_cols
    ] + [left[f"l_{id_col}"] < right[f"r_{id_col}"]]
    pairs = left.join(right, cond)
    flags = [
        r.agree(F.col(f"l_{r.name}"), F.col(f"r_{r.name}"))
        .cast("long")
        .alias(f"{r.name}_agree")
        for r in rules
    ]
    scored = pairs.select(
        F.col(f"l_{id_col}").alias("a"),
        F.col(f"r_{id_col}").alias("b"),
        *flags,
    )
    score = None
    for r in rules:
        term = F.when(
            F.col(f"{r.name}_agree") == 1, F.lit(r.w_agree)
        ).otherwise(F.lit(r.w_disagree))
        score = term if score is None else score + term
    return scored.withColumn("score", score.cast("long")).where(
        F.col("score") >= min_score
    )
