"""Watermarked windowed stream statistics (reference A1/A3 analog).

The reference publishes live progress as thread-safe running counters
(exiter/exiter.go:34-67) and a 2-second CSV row count
(core_logic.py:181-189). The streaming-native form is an event-time
windowed aggregation with a watermark: per (window, source) event and
distinct-key counts that tolerate late arrivals up to the watermark
delay and then finalize — the state store drops windows older than the
watermark, so state is O(open windows), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 minute",
    late_tolerance: str = "2 minutes",
    ts_col: str = "ts",
    source_col: str = "source",
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
) -> DataFrame:
    """Per event-time window and source: event count, distinct-key
    estimate, and max lsn. On a streaming DataFrame the watermark bounds
    state and admits late events up to ``late_tolerance``; output mode
    ``append`` emits each window once, when the watermark passes it.
    Works identically on a batch DataFrame (watermark is a no-op there),
    which is what the DuckDB-free unit test exploits for value checks.
    """
    return (
        events.withWatermark(ts_col, late_tolerance)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(source_col))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct(key_col).alias("approx_keys"),
            F.max(lsn_col).alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            source_col,
            "events",
            "approx_keys",
            "max_lsn",
        )
    )
