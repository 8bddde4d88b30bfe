"""Event-time windowing — batch and streaming forms.

``tumbling_counts`` uses ``F.window`` which is identical in batch and
streaming plans; the streaming variant adds a watermark for state eviction.
``sessionize_batch`` is the classic gaps-and-islands sessionization (lag +
cumulative sum over a per-user window); the streaming equivalent uses
``F.session_window``.

Scale: both shuffle once on the grouping key (user_id), which is also the
natural partitioning of an event stream — at 100 TB/day you'd pre-bucket the
events table by user_id so these windows run shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.money import exact_sum


def tumbling_counts_batch(events: DataFrame, duration: str = "5 minutes",
                          ts_col: str = "ts") -> DataFrame:
    """Tumbling-window aggregate (batch plan; same expression streams)."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

def sliding_counts_batch(events: DataFrame, duration: str = "10 minutes",
                         slide: str = "5 minutes",
                         ts_col: str = "ts") -> DataFrame:
    """Sliding-window aggregate (batch plan; the same expression streams
    with a watermark).  Each event lands in ``duration / slide`` windows —
    Spark's ``window(ts, duration, slide)`` expands them BEFORE the
    aggregate, so the shuffle carries the replication factor but state per
    window stays one row (never per-event buffers).  Deterministic values
    via ``exact_sum``."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def tumbling_counts_stream(events_stream: DataFrame, duration: str = "5 minutes",
                           ts_col: str = "ts", watermark: str = "10 minutes") -> DataFrame:
    """Streaming variant: watermark bounds state so late data older than the
    horizon is dropped and window state is evicted — the knob the reference's
    '>=' month-reopen (P6) approximates in batch."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )


def sliding_counts_stream(events_stream: DataFrame,
                          duration: str = "10 minutes",
                          slide: str = "5 minutes", ts_col: str = "ts",
                          watermark: str = "20 minutes") -> DataFrame:
    """Streaming twin of ``sliding_counts_batch``: the watermark bounds
    per-window state to ``(watermark + duration) / slide`` live windows per
    key group — without it every slide ever seen stays resident."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def session_window_stream(events_stream: DataFrame, gap: str = "30 minutes",
                          ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization via the built-in ``session_window`` (dynamic
    gap-merged windows with watermark-driven state eviction) — the streaming
    twin of ``sessionize_batch``'s gaps-and-islands logic."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: float = 30.0,
                     user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Assign session ids per user with an inactivity gap: new session when
    the gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    # explicit ROWS frame: Spark's default cumulative frame is RANGE, which
    # includes timestamp-tied peers and would disagree with ROWS semantics
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(cum)
    ).drop("__new")


def session_stats_batch(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Per-session rollup over the sessionized stream."""
    s = sessionize_batch(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        exact_sum("value", 6).alias("session_value"),
    )
