"""Event-time windowed aggregation with a watermark — the Structured
Streaming shape a 100 TB crawl-ingest pipeline uses for rollups.

The reference has no streaming (SURVEY §2.8), so this is the additive
scale-path operator: pages/events arrive late and out of order; the
watermark bounds state (windows older than the watermark are finalized
and dropped from the state store), the tumbling window aggregates by
event time, and `append` output only emits FINALIZED windows — so a
downstream Iceberg sink never sees a window twice.

Batch equivalence: run the same aggregation with `availableNow` over a
file source and compare against the plain groupBy — pinned in
tests/test_streaming_stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """stream(ts, event_type, value) → per-(window, key) count + avg.

    - ``withWatermark`` bounds the state store: events later than
      ``watermark_delay`` behind the max seen event time are dropped,
      and windows fully below the watermark finalize (append-mode emit).
    - The aggregation itself is a plain groupBy(window(...)) — partial
      aggregation happens map-side per micro-batch, the shuffle key is
      (window, key), and AQE sizes the post-shuffle partitions.

    Works identically on a batch DataFrame (window() is not
    streaming-specific), which is what the equivalence test pins.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "avg_value",
        )
    )
