"""Exact order statistics over integer-valued columns WITHOUT
collecting values: iterative histogram narrowing.

Spark's exact ``percentile`` aggregate buffers every value of the
group in executor memory — exact but O(n) state, the thing that
falls over first on a 100 TB column. ``approx_percentile`` bounds
the state but gives up exactness. This module gets BOTH for integer
domains (money-in-cents, token counts, byte sizes — the columns a
curation pipeline actually ranks): selection by iterative range
narrowing, the classic external k-th-smallest algorithm.

Per round: ONE map-side-combined aggregation bucketing the in-range
rows into ``n_buckets`` equal-width bins (driver receives ≤
``n_buckets`` counts — O(1) for the cluster), then the bracket
containing the target rank becomes the next round's range. The
integer domain shrinks ≥ ``n_buckets``× per round, so a 64-bit range
closes in ≤ ⌈64/log2(buckets)⌉ ≈ 7 scans — and real money/count
columns (range ~1e7) close in 2-3. The last round's brackets have
width ≤ ``n_buckets``, so every bin is a single value and each rank
resolves exactly inside the regular histogram pass — no separate
per-value pass.

No reference counterpart (extension operator, SURVEY §2 scope:
training-data pipeline statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_span(lo: int, hi: int) -> None:
    """The bin expression computes ``value - lo`` in int64; a domain
    spanning ≥ 2^62 could overflow it (non-ANSI Spark would WRAP, not
    error). No real cents/token/byte column comes near this; refuse
    loudly rather than narrow on wrapped bins."""
    if hi - lo >= 1 << 62:
        raise ValueError(
            f"domain span {hi - lo} ≥ 2^62: value - lo could overflow "
            "int64 in the bin expression"
        )


def exact_kth_smallest(
    df: DataFrame,
    col: str,
    ks: list[int] | None = None,
    n_buckets: int = 1024,
    weight_col: str | None = None,
    rank_fn=None,
) -> dict[int, int]:
    """Exact k-th smallest (1-based ranks ``ks``) of integer column
    ``col``. Returns {k: value}. Driver state is O(n_buckets) per
    round; the data is scanned ≤ ~3 times per distinct bracket chain
    (ranks that land in the same bracket share scans).

    With ``weight_col`` (a non-negative integer column — token
    counts, byte sizes), rank k means: the smallest value whose
    cumulative WEIGHT over the value-sorted rows reaches k. Ranks
    then live in 1..sum(weight); the narrowing is identical with
    per-bin count replaced by per-bin weight sum.

    ``rank_fn`` (exclusive with ``ks``): callable ``n -> list[int]``
    resolving the ranks AFTER the bounds scan reveals the total
    count/weight ``n`` — quantile callers would otherwise need their
    own full ``count()``/``sum()`` pass just to compute ``ceil(q*n)``,
    one extra corpus scan for a number the bounds aggregate already
    holds.
    """
    if (ks is None) == (rank_fn is None):
        raise ValueError("pass exactly one of ks / rank_fn")
    if ks is not None and not ks:
        return {}
    if weight_col is not None:
        # Fractional weights would be FLOORED per bin by the long
        # cast, making bracket counts sum below the bounds total and
        # ranks silently unreachable — refuse up front instead.
        wt = df.schema[weight_col].dataType.simpleString()
        if wt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col {weight_col!r} must be integer-typed "
                f"(got {wt}): cumulative-weight ranks need exact "
                "integer bin sums"
            )
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    bounds = df.agg(
        F.min(col).cast("long").alias("lo"),
        F.max(col).cast("long").alias("hi"),
        F.sum(F.when(F.col(col).isNotNull(), w).otherwise(0))
        .cast("long")
        .alias("n"),
        F.min(w).cast("long").alias("w_min"),
    ).collect()[0]
    if bounds["n"] is None or bounds["n"] == 0:
        raise ValueError("exact_kth_smallest: empty column")
    if weight_col is not None and (bounds["w_min"] or 0) < 0:
        raise ValueError(
            f"negative weights in {weight_col!r} (min {bounds['w_min']}):"
            " cumulative-weight ranks are undefined"
        )
    _check_span(int(bounds["lo"]), int(bounds["hi"]))
    if rank_fn is not None:
        ks = list(rank_fn(int(bounds["n"])))
        if not ks:
            return {}
    bad = [k for k in ks if not (1 <= k <= bounds["n"])]
    if bad:
        raise ValueError(f"ranks out of range 1..{bounds['n']}: {bad}")

    out: dict[int, int] = {}
    # Each rank narrows independently but shares the per-round scan:
    # all still-open ranks' brackets are counted in ONE aggregation
    # per round (a rank's bracket is disjoint or shared; the bucket
    # expression is global so one groupBy serves every open rank).
    open_ranks = {k: (int(bounds["lo"]), int(bounds["hi"]), k) for k in ks}
    # (lo, hi, r) per rank: r = rank within [lo, hi] after discarding
    # the rows below lo in earlier rounds.
    while open_ranks:
        # One shared bucketing pass over the union of open brackets.
        # Brackets from different ranks may differ; tag rows by which
        # bracket they fall in (ranks with the same bracket share).
        brackets = {}
        for k, (lo, hi, r) in open_ranks.items():
            brackets.setdefault((lo, hi), []).append((k, r))
        conds = None
        c = F.col(col).cast("long")
        for bi, (lo, hi) in enumerate(brackets):
            width = max(1, (hi - lo + n_buckets) // n_buckets)
            # Integer bin id — true integer `div`, not float `/`:
            # a float bin id drifts past the 2^53 double boundary on
            # a full 64-bit domain.
            bin_id = F.expr(
                f"(CAST(`{col}` AS BIGINT) - {lo}L) div {width}L"
            )
            val = F.struct(F.lit(bi).alias("b"), bin_id.alias("g"))
            cond = c.between(lo, hi)
            # Distinct open brackets are DISJOINT by construction
            # (all descend from disjoint bins of the same parent),
            # so when-chain order is immaterial.
            conds = (
                F.when(cond, val) if conds is None else conds.when(cond, val)
            )
        hist = {
            (row["key"]["b"], row["key"]["g"]): row["cnt"]
            for row in df.select(conds.alias("key"), w.alias("w"))
            .where(F.col("key").isNotNull())
            .groupBy("key")
            .agg(F.sum("w").cast("long").alias("cnt"))
            .collect()
        }
        nxt: dict[int, tuple[int, int, int]] = {}
        for bi, (lo, hi) in enumerate(brackets):
            width = max(1, (hi - lo + n_buckets) // n_buckets)
            n_bins = (hi - lo) // width + 1
            counts = [hist.get((bi, g), 0) for g in range(n_bins)]
            for k, r in brackets[(lo, hi)]:
                acc = 0
                for g, cnt in enumerate(counts):
                    if acc + cnt >= r:
                        b_lo = lo + g * width
                        b_hi = min(hi, b_lo + width - 1)
                        if b_lo == b_hi:
                            out[k] = b_lo
                        else:
                            nxt[k] = (b_lo, b_hi, r - acc)
                        break
                    acc += cnt
                else:  # no bin reached rank r: invariant broken
                    raise RuntimeError(
                        f"rank {k} unresolved in bracket [{lo}, {hi}] "
                        f"(bin sum {acc} < {r}): input mutated between "
                        "scans?"
                    )
        open_ranks = nxt
    return out


def exact_group_quantile(
    df: DataFrame,
    group_col: str,
    col: str,
    q: float = 0.5,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact per-group lower quantile (rank ``ceil(q*n_g)`` within
    each group) of integer column ``col``, for a LOW-CARDINALITY
    ``group_col`` (sources, priorities, languages — ≤ a few hundred
    values; the when-chain and driver state are O(groups)).

    Every group's bracket narrows in the SAME shared scan per round
    (one aggregation keyed by (group, bin)), so total cluster cost
    stays ~2-3 aggregation-only passes regardless of group count —
    unlike a per-group ``percentile`` whose executor state is the
    largest group's row count, or a row_number window whose sort
    shuffles the full table.

    Rows with a NULL group (or all-NULL values within a group) are
    skipped — they cannot be addressed by the equality routing and
    have no defined quantile; callers wanting them must bucket NULL
    to a sentinel first.
    """
    g = F.col(group_col)
    c = F.col(col).cast("long")
    base = df.groupBy(g.alias("grp")).agg(
        F.min(c).alias("lo"),
        F.max(c).alias("hi"),
        F.count(col).alias("n"),
    ).collect()
    qm = int(round(q * 1000))
    if not (0 < qm <= 1000):
        raise ValueError(f"q out of (0, 1]: {q}")
    # group → (lo, hi, rank-within-bracket)
    open_groups = {
        row["grp"]: (
            int(row["lo"]),
            int(row["hi"]),
            max(1, -(-qm * int(row["n"]) // 1000)),  # ceil(q*n) exactly
        )
        for row in base
        if row["grp"] is not None and row["n"] > 0
    }
    for lo, hi, _r in open_groups.values():
        _check_span(lo, hi)
    out: dict = {}
    while open_groups:
        conds = None
        widths = {}
        for gv, (lo, hi, _r) in open_groups.items():
            width = max(1, (hi - lo + n_buckets) // n_buckets)
            widths[gv] = width
            bin_id = F.expr(
                f"(CAST(`{col}` AS BIGINT) - {lo}L) div {width}L"
            )
            cond = (g == F.lit(gv)) & c.between(lo, hi)
            conds = (
                F.when(cond, bin_id)
                if conds is None
                else conds.when(cond, bin_id)
            )
        hist = {
            (row["grp"], row["g"]): row["cnt"]
            for row in df.select(g.alias("grp"), conds.alias("g"))
            .where(F.col("g").isNotNull())
            .groupBy("grp", "g")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        nxt = {}
        for gv, (lo, hi, r) in open_groups.items():
            width = widths[gv]
            acc = 0
            for b in range((hi - lo) // width + 1):
                cnt = hist.get((gv, b), 0)
                if acc + cnt >= r:
                    b_lo = lo + b * width
                    b_hi = min(hi, b_lo + width - 1)
                    if b_lo == b_hi:
                        out[gv] = b_lo
                    else:
                        nxt[gv] = (b_lo, b_hi, r - acc)
                    break
                acc += cnt
            else:
                raise RuntimeError(
                    f"group {gv!r}: rank {r} unresolved in bracket "
                    f"[{lo}, {hi}] (bin sum {acc}): input mutated "
                    "between scans?"
                )
        open_groups = nxt
    spark = df.sparkSession
    rows = [(gv, out[gv]) for gv in sorted(out)]
    # Explicit schema: with every group NULL (all skipped) or an
    # empty input, `rows` is empty and names-only inference raises
    # CANNOT_INFER_EMPTY_SCHEMA — return an empty, correctly-typed
    # frame instead.
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("q_value", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def quantile_summary(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """One-row DataFrame of EXACT lower-quantile values (rank
    ``ceil(q*n)``, the smallest value with cume_dist ≥ q — integer
    in, integer out, no interpolation) for each q in ``qs``.

    All quantiles share the narrowing scans; total cluster-side cost
    is ~2-3 aggregation-only passes regardless of row count (the
    total count rides the bounds scan via ``rank_fn`` — no separate
    ``count()`` pass).
    """
    # round(), not int(): truncation under-reads q at permille values
    # that are not exactly representable (0.29 * 1000 → 289.999…).
    # After the permille snap, ceil(q*n) is pure integer math.
    qms = [round(q * 1000) for q in qs]
    bad_q = [q for q, qm in zip(qs, qms) if not (0 < qm <= 1000)]
    if bad_q:
        raise ValueError(f"q out of (0, 1]: {bad_q}")
    # Label from the SAME permille snap the rank uses — int(q*100)
    # would both truncate (0.29 → "p28") and collide (0.999 and 0.99
    # → "p99"). Whole percents keep the familiar pXX; sub-percent
    # quantiles get an explicit permille suffix (0.999 → "p999m").
    names = [
        f"p{qm // 10:02d}" if qm % 10 == 0 else f"p{qm:03d}m"
        for qm in qms
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles after permille snap: {qs}")
    resolved: dict[str, list[int]] = {}

    def rank_fn(n: int) -> list[int]:
        resolved["ks"] = [max(1, -(-qm * n // 1000)) for qm in qms]
        return sorted(set(resolved["ks"]))

    vals = exact_kth_smallest(
        df, col, n_buckets=n_buckets, rank_fn=rank_fn
    )
    spark = df.sparkSession
    row = {name: vals[k] for name, k in zip(names, resolved["ks"])}
    cols = sorted(row)
    return spark.createDataFrame([tuple(row[c] for c in cols)], cols).select(
        *[F.col(c).cast("long").alias(c) for c in cols]
    )


def histogram_sketch_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs_permille: list[int],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """SINGLE-pass mergeable quantile sketch: fixed-bin histogram with
    in-bin linear interpolation.

    The complement to ``exact_kth_smallest``'s iterative narrowing:
    where that trades 2-3 full scans for exactness, this reads the
    column ONCE and answers every quantile with bounded error
    ``(hi - lo) / bins`` — and, crucially for a 100 TB pipeline, the
    sketch STATE is just per-(group, bin) counts, which merge by
    addition. That makes it shard-parallel and incremental for free:
    Spark's map-side partial aggregation IS the merge, and daily
    shards can be summed into a running sketch without re-reading
    history (same contract as ``incremental_agg_merge``).

    ``lo``/``hi`` are domain bounds supplied by the caller (the
    monitoring-system convention — e.g. Prometheus histograms);
    out-of-range values clamp into the edge bins, biasing those
    estimates toward the bounds rather than erroring. NULL values are
    EXCLUDED before binning (they carry no rank information; counting
    them would inflate n and — because Spark windows sort NULLS FIRST
    while other engines sort NULLS LAST — shift every estimate by an
    engine-dependent amount). Estimate for
    quantile q: with t = ceil(q·n) (integer permille math, no float
    rank), find the covering bin b (first with cum ≥ t) and
    interpolate ``lo + w·(b + (t - cum_prev)/cnt_b)``. All math is
    plain relational expressions on doubles, so a SQL oracle replays
    it bit-for-bit.

    Cost: one map-side-combined groupBy to ≤ |groups|·bins rows, one
    bounded window over that tiny table, one broadcast of the
    |qs|-row quantile list. Driver state: none.
    """
    if not qs_permille or any(not 0 < q <= 1000 for q in qs_permille):
        raise ValueError(f"qs_permille must be in (0, 1000]: {qs_permille}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if bins < 2:
        raise ValueError(f"need >= 2 bins, got {bins}")
    from pyspark.sql import Window

    w = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), b.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )
    cum = counts.withColumn(
        "cum", F.sum("cnt").over(Window.partitionBy("grp").orderBy("bin"))
    ).withColumn("n", F.sum("cnt").over(Window.partitionBy("grp")))
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(int(q),) for q in sorted(qs_permille)], ["q_permille"]
    ).select(F.col("q_permille").cast("long").alias("q_permille"))
    # integer ceil(q*n/1000): (q*n + 999) div 1000 — no float rank
    t = F.expr("(q_permille * n + 999) div 1000")
    est = F.round(
        F.lit(float(lo))
        + F.lit(w)
        * (
            F.col("bin").cast("double")
            + (F.col("t") - (F.col("cum") - F.col("cnt")))
            / F.col("cnt").cast("double")
        ),
        6,
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("t", t)
        .where((F.col("cum") >= F.col("t")) & (F.col("cum") - F.col("cnt") < F.col("t")))
        .select(
            F.col("grp").alias(group_col),
            "q_permille",
            F.col("n").cast("long").alias("n"),
            est.alias("est"),
        )
    )
