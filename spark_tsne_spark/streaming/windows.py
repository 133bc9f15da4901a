"""Structured Streaming operators over the events stream.

The reference has no streaming layer (SURVEY.md §1); its closest
artifact is the per-iteration callback "event stream". This module is
the engine's native stream surface: the same windowed/sessionized
aggregations as the batch catalog queries, expressed as Structured
Streaming plans with watermarked event-time state.

Scale notes: tumbling-window aggregation is the canonical streaming
shuffle (state keyed by (window, type)); the watermark bounds state.
``session_window`` is Spark's built-in gap-session operator — state
per (user, open session), closed by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events directory.

    ``max_files_per_trigger`` throttles micro-batch size for live
    tailing. Leave it None when draining a bounded directory whose
    files are NOT time-ordered: each micro-batch advances the
    watermark to max(ts)−delay, so events in later files that are
    older than that are dropped as late — correct streaming semantics,
    but surprising when replaying an unordered backfill.
    """
    reader = spark.readStream.format(fmt).schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts + value sums per event type.

    Streaming twin of the batch catalog query ``events_tumbling_agg``;
    the watermark lets Spark drop state for closed windows (late data
    beyond it is discarded, the standard contract).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (streaming twin of the
    batch ``events_sessionize``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def purchase_view_join(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream self interval join: each purchase paired with
    every view by the same user in the ``window`` before it.

    The canonical streaming enrichment: both sides are watermarked and
    the join condition carries an event-time interval, so Spark can
    bound the buffered state on each side (views older than
    ``purchase watermark − window`` are evicted). Inner join →
    append-mode output. The batch twin is a plain theta join, which is
    this operator's DuckDB oracle.
    """
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    v = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    cond = F.expr(
        f"p_user = v_user AND v_ts >= p_ts - interval {window} AND v_ts <= p_ts"
    )
    return p.join(v, cond, "inner").select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("v_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drain a (bounded) file-source stream into a memory sink —
    test/debug helper using availableNow (process everything, stop).
    Aggregations use ``complete``; stream-stream joins only support
    ``append``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_with_profile(
    stream: DataFrame, profile: DataFrame, decimals: int = 6
) -> DataFrame:
    """Stream-static enrichment join: each incoming event against a
    precomputed per-user profile table (historical mean value) —
    the standard realtime feature-lookup/anomaly shape.

    The static side is a plain DataFrame: Spark re-plans it per
    micro-batch (picking up table updates between batches) and
    broadcasts it when small — stream-static joins are STATELESS
    (no watermark, no buffered state), so this scales with the
    micro-batch size, not the stream history. Output appends
    ``(event_id, user_id, value, user_avg, delta)``.
    """
    return stream.join(profile, "user_id").select(
        "event_id",
        "user_id",
        "value",
        "user_avg",
        F.round(F.col("value") - F.col("user_avg"), decimals).alias("delta"),
    )


def user_daily_counts(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Tumbling DAILY window counts per (event type, user).

    The incremental state a streaming leaderboard needs: one count
    per (day, type, user), merged order-insensitively across
    micro-batches, so any decay-weighted finisher over the sink is
    exactly reproducible from batch (weights depend only on the day,
    never on arrival order). Watermark bounds state to the open day
    plus the allowed lateness.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("event_type"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("day_ts"),
            "event_type",
            "user_id",
            "n_events",
        )
    )
