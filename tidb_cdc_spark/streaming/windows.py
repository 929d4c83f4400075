"""Watermarked streaming operators (SURVEY §2.1 "streaming" row —
absent in the reference, which parses ``ts`` and never uses it,
``cdc_utils.go:18``).

Each builder takes an event-time stream and returns a streaming
DataFrame; watermarks bound state so these run indefinitely at any
scale (state size ∝ windows-in-flight × keys, not history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) windowed count+sum with
    late-data tolerance ``watermark``."""
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (streaming twin of
    ``operators.windows.sessionize``)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key event stream within the watermark horizon
    — state is bounded by the watermark (dropDuplicatesWithinWatermark),
    the only dedup that survives an unbounded stream."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
