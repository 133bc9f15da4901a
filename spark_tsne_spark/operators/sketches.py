"""Mergeable distinct-count sketch: explicit HyperLogLog registers.

``approx_count_distinct`` answers "how many distinct" inside one
query, but a 100 TB pipeline wants the SKETCH, not just the number:
per-shard register vectors that persist, merge by element-wise MAX
(daily shards → monthly rollup without re-reading history), and
union across tables. This module materializes the registers as a
``(register, max_rho)`` DataFrame — groupBy(register).max() IS the
merge, exactly like ``histogram_sketch_quantiles``'s add-mergeable
bin counts — and evaluates the Flajolet et al. (AofA 2007) HLL
estimate from them.

Hash discipline (the cross-engine parity trick): the register index
comes from the shared ``hash_bucket`` md5 primitive, and rho (the
leading-zero rank) is read off md5 hex characters 16..28 — bits
DISJOINT from the 60 index bits, scanned with plain string ops both
engines have (``regexp_replace('^0+')`` + a 4-way CASE on the first
nonzero hex digit). The harmonic denominator is kept EXACT by
integer scaling: sum(2^(53-rho)) is a BIGINT (rho <= 53, <= 2^63
total), so no float addition order crosses an engine boundary; the
estimate is then literal-alpha * m^2 * 2^53 / that integer — one
deterministic division. Only the small-range linear-counting branch
(m*ln(m/V), taken when many registers are empty) touches libm; its
last-ulp spread is ~1e-13 relative, invisible at the 3-decimal
output grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Max rho: 13 hex chars = 52 bits, all-zero window reads as 53.
_MAX_RHO = 53


def _alpha(m: int) -> float:
    # Flajolet et al.'s bias correction for m >= 128.
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, key, p: int = 9, salt: str = "hll:"
) -> DataFrame:
    """(register, max_rho) sketch rows for the keys in ``key``.

    One groupBy(register) over the hashed keys — map-side combine
    reduces every partition to <= 2^p rows before the shuffle, and
    re-aggregating unions of sketches with the same groupBy.max IS
    the HLL merge.
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    from spark_tsne_spark.operators.sampling import hash_bucket

    m = 1 << p
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    stripped = F.regexp_replace(F.substring(h, 16, 13), "^0+", "")
    z = F.lit(13) - F.length(stripped)  # leading zero hex digits
    d = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("long")
    extra = (
        F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    )
    rho = F.when(
        F.length(stripped) == 0, F.lit(_MAX_RHO)
    ).otherwise((z * 4 + extra + 1).cast("long"))
    return (
        df.where(F.col(key).isNotNull())
        .select(
            (hash_bucket(F.col(key).cast("string"), salt) % m).alias(
                "register"
            ),
            rho.alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """One-row HLL readout from a register sketch.

    Output: ``(m, v_empty, denom_scaled, est)`` — ``denom_scaled``
    is the exact-integer harmonic denominator sum(2^(53-rho)) +
    V*2^53 (the auditable sketch state), ``est`` the corrected
    estimate rounded to 3.
    """
    m = 1 << p
    alpha = _alpha(m)
    scale = float(1 << _MAX_RHO)
    agg = registers.agg(
        F.count("*").cast("long").alias("n_regs"),
        F.coalesce(
            F.sum(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(53 - max_rho AS INT))"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("present_scaled"),
    )
    v = (F.lit(m) - F.col("n_regs")).cast("long")
    denom = (
        F.col("present_scaled") + v * F.lit(1 << _MAX_RHO).cast("long")
    ).cast("long")
    raw = (
        F.lit(alpha * m * m)
        * F.lit(scale)
        / F.col("denom_scaled").cast("double")
    )
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("v_empty").cast("double")
    )
    return (
        agg.select(
            F.lit(m).cast("long").alias("m"),
            v.alias("v_empty"),
            denom.alias("denom_scaled"),
        )
        .select(
            "m",
            "v_empty",
            "denom_scaled",
            F.round(
                F.when(
                    (F.col("v_empty") > 0)
                    & (raw <= F.lit(2.5 * m)),
                    lin,
                ).otherwise(raw),
                3,
            ).alias("est"),
        )
    )


def kmv_sketches(
    df: DataFrame, group: str, key, k: int = 256, salt: str = "kmv:"
) -> DataFrame:
    """Per-group KMV (k minimum values / bottom-k) distinct sketch:
    the k smallest md5 hash values of the group's distinct keys.

    The complement to HLL: HLL registers merge (union) but cannot
    INTERSECT; KMV sketches support both — the bottom-k of a union
    is the bottom-k of the combined sketches, and because every
    sketch retains actual hash VALUES, set membership across
    sketches is observable, giving the Beyer et al. (SIGMOD 2007)
    intersection estimator (see ``kmv_pair_estimates``). Sketch size
    is k rows per group regardless of cardinality; build cost is one
    distinct + one bounded window.

    Everything is deterministic (md5 order), so the sketch — not
    just its estimate — is value-checkable in plain SQL.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from spark_tsne_spark.operators.sampling import hash_bucket

    hashed = (
        df.where(F.col(key).isNotNull())
        .select(
            F.col(group).alias("grp"),
            hash_bucket(F.col(key).cast("string"), salt).alias("h"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashed.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("grp", "h")
    )


# 60-bit hash space of the shared md5 hash_bucket primitive.
_KMV_SPACE = float(1 << 60)


def kmv_pair_estimates(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-union and distinct-intersection estimates for every
    unordered group pair from their KMV sketches.

    For a pair (a, b): pool both sketches, keep the k smallest
    distinct hashes U (identical keys hash identically, so the pool
    dedups by hash). If the pool holds fewer than k distinct hashes,
    BOTH sets were exhaustively sketched and the numbers are exact.
    Otherwise with kth = max(U):

        union_est = (k - 1) * SPACE / kth        (KMV cardinality)
        inter_est = (c / k) * union_est          (Jaccard c/k scaled)

    where c = |{h in U : h in sketch(a) AND h in sketch(b)}| (Beyer
    et al., SIGMOD 2007). All set math is exact integers; each
    estimate is ONE division of exact values, so both engines emit
    identical doubles.

    Plan shape: every sketch row fans out to the |groups|-1 pairs it
    participates in (a |groups|-bounded broadcast fan-out, NOT a
    data-sized join), membership flags max-merge in one groupBy, and
    the bottom-k window runs over <= 2k rows per pair.

    Output: ``(grp_a, grp_b, k_used, n_common, union_est,
    inter_est)`` rounded to 3.
    """
    from pyspark.sql import Window

    groups = sketches.select(F.col("grp").alias("other")).distinct()
    fan = sketches.crossJoin(F.broadcast(groups)).where(
        F.col("grp") != F.col("other")
    )
    tagged = fan.select(
        F.least("grp", "other").alias("grp_a"),
        F.greatest("grp", "other").alias("grp_b"),
        "h",
        F.when(F.col("grp") < F.col("other"), 1).otherwise(0).alias("ia"),
        F.when(F.col("grp") > F.col("other"), 1).otherwise(0).alias("ib"),
    )
    pooled = tagged.groupBy("grp_a", "grp_b", "h").agg(
        F.max("ia").alias("in_a"), F.max("ib").alias("in_b")
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    u = pooled.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= k
    )
    agg = u.groupBy("grp_a", "grp_b").agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").cast("long").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_common"),
    )
    exact_regime = F.col("k_used") < k
    union_raw = (
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("kth").cast("double")
    )
    union_est = F.when(
        exact_regime, F.col("k_used").cast("double")
    ).otherwise(union_raw)
    inter_est = F.when(
        exact_regime, F.col("n_common").cast("double")
    ).otherwise(
        F.col("n_common").cast("double") / F.lit(float(k)) * union_raw
    )
    return agg.select(
        "grp_a",
        "grp_b",
        "k_used",
        "n_common",
        F.round(union_est, 3).alias("union_est"),
        F.round(inter_est, 3).alias("inter_est"),
    )
