"""Time-series operators Spark has no built-in for: as-of join,
bounded range join, hypertable-style gap-fill.

These are the event-table counterparts of the dedup/ANN extension
family — operators a telemetry or training-data pipeline needs that
neither vanilla Spark SQL nor the reference engine (a t-SNE library;
no temporal ops) provides. Each is expressed as a composition of
built-in DataFrame ops so Catalyst keeps pushdown/pruning/AQE, and
each keeps a DuckDB-expressible contract for the correctness gate.

Scale notes (the reason these shapes were chosen):

- ``asof_join`` is ONE shuffle on the equi key — a union + ordered
  window, never a range join. At 100 TB the alternative (theta join
  on ``r.ts <= l.ts``) is a cross product per key; the union-window
  form is linear in rows and AQE-skew-splittable.
- ``range_join_buckets`` turns a pure time-proximity predicate (no
  equi key at all — the genuinely hard case) into an equi join on a
  time bucket with bounded fan-out ``ceil(window/bucket)+1`` per row,
  then an exact residual filter. Bucket width ≈ window width keeps
  the fan-out ≤ 2-3×.
- ``gapfill_locf`` materializes the dense grid with ``sequence`` +
  ``explode`` per series (never a driver loop) and fills with one
  ordered window per series — two shuffles total (agg + window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _micros(ts: str) -> Column:
    """Epoch microseconds as BIGINT. ``unix_micros`` rejects the
    TIMESTAMP_NTZ that parquet scans produce; the cast pins NTZ to the
    session timezone (UTC in this engine's sessions), and every use
    below is a *difference* or a bucket id, both invariant to the
    constant epoch offset."""
    return F.unix_micros(F.col(ts).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_cols: list[str],
    right_order: str | None = None,
    tolerance_s: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, the most recent right row with
    ``right.ts <= left.ts`` in the same ``by`` group (inclusive; ties
    on ``ts`` broken by the largest ``right_order``).

    Implementation: tag both sides, union, ONE window ordered by
    ``(ts, side, right_order)`` with the right payload packed in a
    struct, ``last(..., ignorenulls=True)`` carries the latest right
    row forward, then keep left rows. Right rows sort before left
    rows at equal ``ts`` so the match is inclusive. Linear, one
    shuffle on ``by`` — no range join, no per-key cross product.

    ``tolerance_s`` (optional) voids matches older than the window:
    rows whose carried right ``ts`` is more than that many seconds
    behind come back NULL, like pandas ``merge_asof(tolerance=...)``.

    Output: every left column plus ``prefix + c`` for each
    ``right_cols`` entry (NULL when no right row qualifies).
    """
    if right_order is None:
        right_order = right_cols[0]
    pay_cols = list(dict.fromkeys([*right_cols, ts]))
    payload = F.struct(*[F.col(c).alias(c) for c in pay_cols])
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(right.select(payload).schema[0].dataType)
    ).withColumn("_ro", F.lit(None).cast("long"))
    r_tag = (
        right.select(by, ts, *[c for c in right_cols if c not in (by, ts)])
        .withColumn("_side", F.lit(0))
        .withColumn("_rv", payload)
        .withColumn("_ro", F.col(right_order).cast("long"))
    )
    cols = [by, ts, "_side", "_rv", "_ro"]
    extra = [c for c in left.columns if c not in (by, ts)]
    u = l_tag.select(*cols, *extra).unionByName(
        r_tag.select(*cols).withColumns({c: F.lit(None) for c in extra}),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_ro").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_last", F.last("_rv", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    if tolerance_s is not None:
        out = out.withColumn(
            "_last",
            F.when(
                _micros(ts) - F.unix_micros(F.col("_last")[ts].cast("timestamp"))
                <= int(tolerance_s * 1_000_000),
                F.col("_last"),
            ),
        )
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col("_last")[c])
    return out.drop("_side", "_rv", "_ro", "_last")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: float | None = None,
    by: str | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right.ts`` in
    ``[left.ts + lower_s, left.ts + upper_s]`` — no equi key required
    (``by`` adds an optional equi key, shrinking each bucket to one
    key's rows: the keyed variant attribution/asof-window analytics
    need).

    The naive plan is a cartesian product with a theta filter; this
    one buckets time instead: each left row explodes to the buckets
    its window covers (``sequence`` over bucket ids — bounded fan-out
    ``ceil((upper-lower)/bucket)+1``), the right side computes its
    single bucket, and the pair space collapses to an equi join on
    the bucket id plus an exact microsecond residual filter. Bucket
    width defaults to the window width (fan-out ≤ 2). Time-clustered
    data makes hot buckets; AQE skew-join splits them.

    Output: all left columns + all right columns (caller aliases any
    collisions beforehand).
    """
    if upper_s < lower_s:
        raise ValueError(f"upper_s {upper_s} < lower_s {lower_s}")
    if bucket_s is None:
        bucket_s = max(upper_s - lower_s, 1e-6)
    bus = int(bucket_s * 1_000_000)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    l_us = _micros(left_ts)
    r_us = _micros(right_ts)
    l_exp = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(bus)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(bus)),
            )
        ),
    )
    r_b = right.withColumn("_bkt", F.floor(r_us / F.lit(bus)))
    keys = ["_bkt"] if by is None else [by, "_bkt"]
    joined = l_exp.join(r_b, on=keys).where(
        (r_us >= l_us + F.lit(lo_us)) & (r_us <= l_us + F.lit(hi_us))
    )
    return joined.drop("_bkt")


def gapfill_locf(
    df: DataFrame,
    series: str,
    ts: str,
    value: str,
    bucket: str = "hour",
    round_to: int = 4,
) -> DataFrame:
    """Hypertable-style dense time grid per series with
    last-observation-carried-forward fill.

    Aggregates ``value`` per (series, date_trunc(bucket, ts)), builds
    the full bucket grid from the GLOBAL min/max bucket (a 1-row agg
    the planner broadcasts, then ``sequence`` + ``explode`` — the
    grid never exists on the driver), left-joins the aggregate, and
    fills: ``n_events`` → 0, ``sum_value_locf`` → last non-null
    ordered by bucket within the series, ``gap_filled`` marks
    synthesized rows. Two shuffles (agg, per-series window).

    Output: ``(series, hour_ts, n_events, gap_filled,
    sum_value_locf)``.
    """
    b = F.date_trunc(bucket, F.col(ts))
    agg = df.groupBy(F.col(series).alias("_s"), b.alias("_h")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(value), round_to).alias("_sum"),
    )
    bounds = df.agg(
        F.min(b).alias("_lo"), F.max(b).alias("_hi")
    )
    grid = (
        agg.select("_s")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "_s",
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")
            ).alias("_h"),
        )
    )
    filled = grid.join(agg, on=["_s", "_h"], how="left")
    w = (
        Window.partitionBy("_s")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        F.col("_s").alias(series),
        F.col("_h").alias(f"{bucket}_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("gap_filled"),
        F.last("_sum", ignorenulls=True).over(w).alias("sum_value_locf"),
    )


def gapfill_interp(
    df: DataFrame,
    series: str,
    ts: str,
    value: str,
    bucket: str = "hour",
    round_to: int = 4,
) -> DataFrame:
    """Gap-fill with LINEAR interpolation between the nearest
    observed buckets (TimescaleDB ``interpolate()`` semantics).

    Same dense-grid construction as :func:`gapfill_locf`; each missing
    bucket then lerps between the previous and next non-null sums
    using two ordered windows per series (last-non-null looking back,
    first-non-null looking forward — both carried as (value, bucket)
    structs so the slope uses the true bucket distance). Buckets
    before the first / after the last observation stay NULL, like the
    reference semantics. Three shuffles total (agg + two windows share
    one partitioning).

    Output: ``(series, <bucket>_ts, n_events, gap_filled,
    sum_value_interp)``.
    """
    b = F.date_trunc(bucket, F.col(ts))
    agg = df.groupBy(F.col(series).alias("_s"), b.alias("_h")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(value), round_to).alias("_sum"),
    )
    bounds = df.agg(F.min(b).alias("_lo"), F.max(b).alias("_hi"))
    grid = (
        agg.select("_s")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "_s",
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")
            ).alias("_h"),
        )
    )
    filled = grid.join(agg, on=["_s", "_h"], how="left")
    obs = F.when(
        F.col("_sum").isNotNull(),
        F.struct(F.col("_sum").alias("v"), F.col("_h").alias("h")),
    )
    w_prev = (
        Window.partitionBy("_s")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("_s")
        .orderBy("_h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    # Fixed-point lerp: float interpolation of round_to-decimal
    # endpoints lands EXACTLY on rounding-grid midpoints whenever the
    # gap is 2 buckets (frac = 1/2), where engines' round() rules
    # diverge. Scaling the endpoints to integers and flooring the
    # exact rational a·(den−num)/den + b·num/den keeps every value on
    # the 10^-round_to grid with no half-point anywhere.
    scale = 10**round_to
    bucket_us = {
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[bucket]

    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    a = F.round(prev["v"] * scale).cast("long")
    bb = F.round(nxt["v"] * scale).cast("long")
    num = ((_us(F.col("_h")) - _us(prev["h"])) / bucket_us).cast("long")
    den = ((_us(nxt["h"]) - _us(prev["h"])) / bucket_us).cast("long")
    # den NULL (no prev or no next observation) must yield NULL, not
    # fall into an otherwise() — edges beyond the observed range stay
    # unfilled by contract.
    interp_fp = F.when(
        den > 0, F.floor((a * (den - num) + bb * num) / den)
    ).when(den == 0, a)
    return filled.select(
        F.col("_s").alias(series),
        F.col("_h").alias(f"{bucket}_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("gap_filled"),
        (interp_fp / scale).alias("sum_value_interp"),
    )


def ewma_smooth(
    df: DataFrame,
    by: str,
    ts: str,
    value: str,
    tiebreak: str,
    window: int = 16,
    alpha: float = 0.2,
    decimals: int = 6,
) -> DataFrame:
    """Windowed exponential smoothing per series: for each row, the
    exponentially weighted mean of the trailing ``window`` values in
    (``ts``, ``tiebreak``) order — weight ``(1-alpha)^age``,
    normalized over the weights actually present (so early rows with
    short history are means of what exists, not biased toward an
    arbitrary zero init).

    NULL values neither contribute nor receive weight: the frame is
    ROWS-based, but weighting runs over the frame's NON-NULL values
    in order (Spark's collect_list drops NULLs; the oracle mirrors
    with list_filter), so a NULL-heavy stretch shortens the
    effective history instead of poisoning the mean.

    The *finite* window is deliberate: the textbook recursive EWMA
    needs running state per series (a window cumsum of
    ``x_j*(1-a)^-j`` overflows for long series), while a bounded
    window is ONE window-function pass — fully declarative, engine-
    parallel over series, and expressible in plain SQL for the
    oracle. ``window`` in the dozens captures >99% of the recursive
    EWMA's mass at typical alphas.

    Scale: one shuffle on ``by``; frame is ROWS-bounded, so state per
    row is O(window) — no unbounded-preceding scan, no skew beyond
    the series-size distribution itself.

    Output: ``(by, tiebreak, ewma)``.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keep = 1.0 - alpha
    w = (
        Window.partitionBy(by)
        .orderBy(ts, tiebreak)
        .rowsBetween(-(window - 1), 0)
    )
    vals = F.collect_list(value).over(w)
    d = df.select(
        F.col(by), F.col(tiebreak), vals.alias("_w")
    )
    n = F.size("_w")
    idx = F.sequence(F.lit(1), n)
    # weight for slot i (1-based, oldest first): keep^(n - i)
    num = F.aggregate(
        F.zip_with(
            F.col("_w"),
            idx,
            lambda v, i: v * F.pow(F.lit(keep), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(idx, lambda i: F.pow(F.lit(keep), (n - i).cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        by, tiebreak, F.round(num / den, decimals).alias("ewma")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_id: str,
    left_ts: str,
    right_id: str,
    right_ts: str,
    tolerance_s: float,
) -> DataFrame:
    """Nearest-event temporal join: for each left row, the single
    right row in the same ``by`` group minimizing ``|right.ts -
    left.ts|`` within ``±tolerance_s`` — the two-sided sibling of
    ``asof_join`` (which only looks backward). Ties break on the
    earlier right timestamp, then the smaller ``right_id``.

    Plan shape: left rows explode to the ≤3 tolerance-width time
    buckets their window touches, the right side computes its single
    bucket, and the pair space collapses to an equi join on
    ``(by, bucket)`` + an exact microsecond residual filter — never a
    per-key cartesian. The best candidate per left row is one
    ROW_NUMBER window over the (bounded) candidate set.

    Output: ``(by, left_id, right_id, dt_s)`` with ``dt_s`` the
    signed right-minus-left offset in seconds (exact: integer
    microseconds over 10^6).
    """
    tol_us = int(tolerance_s * 1_000_000)
    if tol_us < 1:
        raise ValueError(
            f"tolerance_s must be >= 1 microsecond, got {tolerance_s}"
        )
    l = left.select(
        F.col(by).alias("_by"),
        F.col(left_id).alias("_lid"),
        _micros(left_ts).alias("_lus"),
    )
    r = right.select(
        F.col(by).alias("_by"),
        F.col(right_id).alias("_rid"),
        _micros(right_ts).alias("_rus"),
    )
    l_exp = l.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("_lus") - F.lit(tol_us)) / F.lit(tol_us)),
                F.floor((F.col("_lus") + F.lit(tol_us)) / F.lit(tol_us)),
            )
        ),
    )
    r_b = r.withColumn("_bkt", F.floor(F.col("_rus") / F.lit(tol_us)))
    cand = l_exp.join(r_b, on=["_by", "_bkt"]).where(
        F.abs(F.col("_rus") - F.col("_lus")) <= F.lit(tol_us)
    )
    pick = Window.partitionBy("_by", "_lid").orderBy(
        F.abs(F.col("_rus") - F.col("_lus")), F.col("_rus"), F.col("_rid")
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
    )
    return best.select(
        F.col("_by").alias(by),
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        ((F.col("_rus") - F.col("_lus")) / F.lit(1_000_000.0)).alias("dt_s"),
    )


def holt_linear(
    df: DataFrame,
    by: str,
    ts: str,
    value: str,
    horizon: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per series,
    with alpha = beta = 0.5 and the l1 = y1, b1 = 0 initialization:

        l_t = 0.5*y_t + 0.5*(l_{t-1} + b_{t-1})
        b_t = 0.5*(l_t - l_{t-1}) + 0.5*b_{t-1}

    the level-plus-trend upgrade of ``ewma_smooth`` — EWMA lags a
    trending series by design; Holt tracks the slope and can
    extrapolate, which is what a volume-forecast alert actually
    needs. Forecast at horizon h is ``l_T + h*b_T``.

    The recursion is inherently sequential PER SERIES, so the engine
    parallelism is across series (one shuffle on ``by``), and each
    series folds its ordered value array with a strict left-to-right
    ``aggregate`` HOF. The smoothing constants are fixed at 0.5 —
    a dyadic multiplier, so every fold step is exact-double
    reproducible and DuckDB's ``list_reduce`` replays the identical
    IEEE sequence (same trick as the Kaplan-Meier product fold; a
    tunable alpha would also work, it just weakens the bit-parity
    argument to "same rounding" rather than "mostly exact ops").
    State per fold step is the [level, trend] pair, encoded as a
    2-element array because a fold's accumulator must match the
    element type in both engines' HOFs.

    Output per series: ``(by, n_obs, level, trend, fc_1..fc_h)``.
    Series with fewer than 2 observations are dropped (no trend to
    estimate).
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    ordered = (
        df.groupBy(F.col(by).alias("series"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts).alias("o"), F.col(value).alias("y"))
                )
            ).alias("pts")
        )
        .where(F.size("pts") >= 2)
        .select(
            "series",
            F.size("pts").cast("long").alias("n_obs"),
            F.expr(
                "aggregate("
                "  slice(transform(pts, p -> CAST(p.y AS DOUBLE)), 2,"
                "        size(pts) - 1),"
                "  array(CAST(element_at(pts, 1).y AS DOUBLE),"
                "        CAST(0.0 AS DOUBLE)),"
                "  (acc, y) -> array("
                "    0.5D * y + 0.5D * (element_at(acc, 1)"
                "                       + element_at(acc, 2)),"
                "    0.5D * ((0.5D * y + 0.5D * (element_at(acc, 1)"
                "                                + element_at(acc, 2)))"
                "            - element_at(acc, 1))"
                "    + 0.5D * element_at(acc, 2)))"
            ).alias("st"),
        )
    )
    out = ordered.select(
        F.col("series").alias(by),
        "n_obs",
        F.round(F.element_at("st", 1), decimals).alias("level"),
        F.round(F.element_at("st", 2), decimals).alias("trend"),
        *[
            F.round(
                F.element_at("st", 1)
                + F.lit(float(h)) * F.element_at("st", 2),
                decimals,
            ).alias(f"fc_{h}")
            for h in range(1, horizon + 1)
        ],
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_s: float = 3600.0,
    by: str | None = None,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP:
    ``l_start < r_end AND r_start < l_end`` (half-open convention) —
    the interval-x-interval upgrade of ``range_join_buckets``'s
    point-in-window shape. The canonical use: sessions vs incident
    windows, uptime vs maintenance, contract validity vs billing
    periods.

    Plan: BOTH sides explode to the ``bucket_s``-wide time buckets
    their interval covers (bounded fan-out ceil(len/bucket)+1 per
    row), pairs meet in an equi join on the bucket id, and the exact
    theta predicate filters the survivors. Because two overlapping
    intervals can share SEVERAL buckets, each pair elects ONE
    responsibility bucket — max(first bucket of each side) is
    covered by both by construction — so every pair is emitted
    exactly once with no distinct pass. Never a cartesian; skewed
    (hot) buckets are AQE's skew-join case.

    Output: all left + right columns plus ``overlap_us`` (exact
    integer microseconds of overlap). Caller aliases collisions.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be > 0, got {bucket_s}")
    bus = int(bucket_s * 1_000_000)
    ls, le = _micros(l_start), _micros(l_end)
    rs, re = _micros(r_start), _micros(r_end)
    # half-open intervals: the end instant belongs to the NEXT bucket
    # only if the interval actually extends into it, hence (end-1).
    l_exp = left.withColumn("_lb0", F.floor(ls / F.lit(bus))).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.col("_lb0"), F.floor((le - F.lit(1)) / F.lit(bus))
            )
        ),
    )
    r_exp = right.withColumn("_rb0", F.floor(rs / F.lit(bus))).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.col("_rb0"), F.floor((re - F.lit(1)) / F.lit(bus))
            )
        ),
    )
    keys = ["_bkt"] if by is None else [by, "_bkt"]
    joined = (
        l_exp.join(r_exp, on=keys)
        .where((ls < re) & (rs < le))
        .where(F.col("_bkt") == F.greatest("_lb0", "_rb0"))
    )
    overlap = F.least(le, re) - F.greatest(ls, rs)
    return joined.withColumn(
        "overlap_us", overlap.cast("long")
    ).drop("_bkt", "_lb0", "_rb0")
