"""Event-time streaming operators (SURVEY.md §2.9 ST3 generalized).

The reference's point-in-time window + "one late overhang segment" rule
(RestoreCommitLogsOperation.java:115-146) generalizes to Structured
Streaming's event-time machinery: tumbling/sliding windows with watermarks
for bounded lateness, and ``dropDuplicatesWithinWatermark`` for streaming
exact dedup (the streaming analog of the content-addressed upload skip).

These helpers take any streaming DataFrame with an event-time column, so the
same code runs against a file source, Kafka, or a rate source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts; late data beyond the watermark is
    dropped, mirroring the reference's bounded-lateness admission rule."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows: per-user sessions closed after ``gap`` of
    inactivity (the streaming counterpart of operators.analytics.sessionize;
    see streaming.stateful for the applyInPandasWithState custom variant)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: duplicates arriving within the watermark are
    dropped without unbounded state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
