"""P-matrix symmetrization + adjacency grouping.

Reference: ``TSNEHelper.computeP`` (``TSNEHelper.scala:10-19``) —
p_ij = max((p_{j|i} + p_{i|j}) / 2n, 1e-12), then group per row.

Spark mapping (SURVEY.md §2.4): union of both orientations →
groupBy(i, j).sum (Catalyst partial+final aggregation replaces
``reduceByKey``) → scale + clamp → ``collect_list(struct(j, p))``.
Of the reference's two inconsistent symmetrizations (quirk Q7), the
clamped Y1 variant used by both working drivers is the one kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P_CLAMP = 1e-12


def symmetrize(p_ji: DataFrame, n: int, num_partitions: int | None = None) -> DataFrame:
    """COO ``(i, j, p)`` conditional → symmetric joint ``(i, j, p)``.

    Scale-correct and shuffle-minimal: ONE explicit hash-partition on
    ``i`` — HashPartitioning(i) satisfies the ClusteredDistribution of
    BOTH the (i, j) aggregation here and the per-row grouping in
    :func:`to_adjacency`, so Catalyst inserts no further exchange for
    the whole symmetrize→adjacency chain (one shuffle of the edge set
    instead of three). No driver state.
    """
    # BOTH orientations from ONE pass over p_ji — a unionAll of two
    # selects would re-execute the whole upstream (kNN + calibration)
    # once per branch; the map-side explode doubles rows instead.
    both = p_ji.select(
        F.explode(
            F.array(
                F.struct("i", "j", "p"),
                F.struct(
                    F.col("j").alias("i"), F.col("i").alias("j"), F.col("p")
                ),
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    if num_partitions:
        both = both.repartition(num_partitions, "i")
    else:
        both = both.repartition("i")
    return (
        both.groupBy("i", "j")
        .agg(F.sum("p").alias("psum"))
        .select(
            "i",
            "j",
            F.greatest(F.lit(P_CLAMP), F.col("psum") / F.lit(2.0 * n)).alias("p"),
        )
    )


def to_adjacency(p_sym: DataFrame) -> DataFrame:
    """Group the symmetric COO into per-row neighbor lists.

    ``(i, js array<long>, ps array<double>)`` — the layout the
    per-iteration gradient kernels consume (reference
    ``TSNEHelper.scala:18`` adjacency + ``.glom()`` blocking; with
    ``mapInPandas`` Arrow batches are the blocks, so no explicit glom
    materialization is needed — SURVEY.md §2.4 Y3).

    Neighbors are sorted by j for deterministic output.
    """
    return (
        p_sym.groupBy("i")
        .agg(
            F.sort_array(F.collect_list(F.struct("j", "p"))).alias("nbr")
        )
        .select(
            "i",
            F.col("nbr.j").alias("js"),
            F.col("nbr.p").alias("ps"),
        )
    )


def compute_p(
    p_ji: DataFrame, n: int, num_partitions: int | None = None
) -> DataFrame:
    """Public-API twin of reference ``TSNEHelper.computeP``.

    ``(i, j, p)`` conditional COO → ``(i, js, ps)`` symmetric
    adjacency, hash-partitioned by ``i`` into ``num_partitions`` (one
    shuffle end to end — see :func:`symmetrize`).
    """
    return to_adjacency(symmetrize(p_ji, n, num_partitions))
