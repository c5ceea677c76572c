"""Event-time windowed aggregation with a late-data watermark.

The frontier loop itself has no event time (SURVEY.md §2.6 — waves are
processing-time tumbling batches), but the warehouse's analytics side does:
the `events` table carries real timestamps, and its hourly rollup
(q14_hourly_window) has a natural streaming form. This module is that form —
`readStream` over the same parquet layout, `withWatermark` bounding how long
window state waits for stragglers, tumbling `window()` aggregation, append
output so ONLY finalized (watermark-passed) windows emit. State per window is
a handful of aggregates, so at design scale the state store stays small no
matter how many events flow through; the watermark bounds it in time.

Semantics (pinned by tests/test_streaming_window.py): a row later than the
watermark but whose window is still open IS aggregated; a row arriving after
the watermark passed its window's end is DROPPED; a window emits exactly once,
when the watermark passes its end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = "ts timestamp, event_type string, value double"


def hourly_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema: str = EVENTS_STREAM_SCHEMA,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming hourly per-type counts/sums over a growing events directory.

    Returns the unstarted streaming DataFrame; callers pick the sink. Output
    columns mirror q14_hourly_window (hour, event_type, n, sum_value) so the
    batch query is the oracle for the finalized windows."""
    events = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
        "sum_value",
    )
