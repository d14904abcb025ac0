"""Streaming windowed aggregations over the events stream — the streaming
twins of the batch rollup/sessionization queries (new capability beyond the
reference, SURVEY.md §2.9 T5: the reference is processing-time only; these
add event-time + watermark semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window x event_type counts/sums with late-data
    watermark — streaming twin of inventory.events_hourly_rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("hour_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (T2's session-window alternative):
    F.session_window handles merge-on-overlap in the state store."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("start_ms"),
            F.unix_millis(F.col("w.end")).alias("end_ms"),
            "n_events",
        )
    )
