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


def adjacency_from_calibrated(
    cal: DataFrame, n: int, num_partitions: int | None = None
) -> DataFrame:
    """Fused symmetrize straight from CALIBRATED NEIGHBOR LISTS —
    ``(i, js, ps)`` conditional → ``(i, js, ps)`` symmetric adjacency,
    numerically identical to ``compute_p(explode(cal), n)`` (pinned by
    tests/test_r11_fixes.py).

    MEASURED REJECTION (rounds 11 and 12) — kept as a correct, pinned
    alternative but NOT used by the affinity pipeline: at flagship
    shape (50k rows, k=90) the interleaved ABBA A/B from cached
    calibrated lists (scripts/ab_symmetrize.py) measures this path at
    ~2.0 s steady-state vs ~1.2 s for explode-both + ``compute_p``,
    and at 1M rows / 180M thin rows — the row-bound regime round 11
    deferred to — the same ABBA (scripts/ab_affinity_1m.py) measures
    **91.7 s vs 42.8 s**, a >2× loss with the halved-shuffle-rows
    byte advantage fully in play. Halving the shuffle rows does not
    pay for leaving whole-stage codegen at ANY measured local shape:
    the thin-row chain runs a tungsten ``HashAggregate(sum)`` while
    this one pays ``ObjectHashAggregate`` (first-over-arrays +
    collect_list-of-structs) plus per-row map construction whose CPU
    cost scales with the very rows it saves. The remaining
    hypothetical is a network-bound REAL cluster where shuffle bytes,
    not CPU, gate — the byte argument below is still true there.

    The construction it was built on:

    - shuffle rows drop from 2·n·k flat COO rows to n·(k+1): each
      input row emits its FORWARD orientation as ONE array-packed row
      plus k thin reverse rows (the reverse direction inherently needs
      per-neighbor routing; the forward direction never did — the old
      path exploded both). Halves the dominant shuffle's row count
      and its per-row overhead.
    - the ``groupBy(i, j).sum`` pass disappears: after the single
      hash-partition on the target id, one aggregation collects the
      reverse entries and the merge ``(p_{j|i} + p_{i|j}) / 2n`` with
      the 1e-12 clamp runs as JVM ``map_zip_with`` over the row's own
      forward map — no second aggregation, no per-pair rows ever
      materialized again.

    Both orientations come from ONE pass over ``cal`` (a union of two
    selects would re-execute the upstream kNN + calibration per
    branch — same trap :func:`symmetrize` documents). Addition of the
    two orientations is a 2-term IEEE sum, so values match
    ``F.sum``'s arrival-order result bit-for-bit.
    """
    fwd = F.array(
        F.struct(
            F.col("i").alias("key"),
            F.lit(None).cast("long").alias("j"),
            F.lit(None).cast("double").alias("p"),
            F.col("js").alias("fjs"),
            F.col("ps").alias("fps"),
        )
    )
    rev = F.transform(
        F.arrays_zip("js", "ps"),
        lambda e: F.struct(
            e["js"].alias("key"),
            F.col("i").alias("j"),
            e["ps"].alias("p"),
            F.lit(None).cast("array<long>").alias("fjs"),
            F.lit(None).cast("array<double>").alias("fps"),
        ),
    )
    rows = cal.select(F.explode(F.concat(fwd, rev)).alias("e")).select("e.*")
    if num_partitions:
        rows = rows.repartition(num_partitions, "key")
    else:
        rows = rows.repartition("key")
    agg = rows.groupBy("key").agg(
        # exactly one forward row exists per key (keys are input ids)
        F.first("fjs", ignorenulls=True).alias("fjs"),
        F.first("fps", ignorenulls=True).alias("fps"),
        # when() without otherwise → null for the forward row, which
        # collect_list skips (a bare struct(j, p) would collect a
        # (null, null) entry)
        F.collect_list(
            F.when(F.col("j").isNotNull(), F.struct("j", "p"))
        ).alias("rev"),
    )
    merged = F.map_zip_with(
        F.map_from_arrays(
            F.coalesce(F.col("fjs"), F.array().cast("array<long>")),
            F.coalesce(F.col("fps"), F.array().cast("array<double>")),
        ),
        F.map_from_entries(F.col("rev")),
        lambda _, v1, v2: F.greatest(
            F.lit(P_CLAMP),
            (F.coalesce(v1, F.lit(0.0)) + F.coalesce(v2, F.lit(0.0)))
            / F.lit(2.0 * n),
        ),
    )
    entries = F.array_sort(F.map_entries(merged))
    return agg.select(
        F.col("key").alias("i"),
        entries.getField("key").alias("js"),
        entries.getField("value").alias("ps"),
    )
