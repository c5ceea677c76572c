"""Watermark semantics for the streaming hourly rollup (driver mandate:
watermarks + windowed aggs for late data).

Deterministic late-data protocol: feed file batches in a controlled order and
processAllAvailable() between them, so the watermark advances at known points:

  batch 1: H0 rows + an H1 row            → watermark 00:15, nothing emits
  batch 2: H2 row + a LATE-BUT-IN-TIME H0 row (00:40 > watermark 00:15,
           H0 still open → aggregated)    → watermark 01:30, H0 finalizes
  batch 3: a TOO-LATE H0 row (dropped: watermark 01:30 passed H0's end) +
           an 04:00 row                   → watermark 03:00, H1+H2 finalize

The emitted (append-mode) rows must equal the BATCH hourly aggregate over
exactly the on-time + late-but-in-time rows — the 04:00 row's own window never
finalizes and must be absent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawlingathome_worker_spark.streaming.windowed import (
    EVENTS_STREAM_SCHEMA,
    hourly_event_counts_stream,
)


def _write_batch(spark, path, rows, n):
    df = spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, f"b{n}"))


def test_watermark_accepts_in_time_late_rows_and_drops_too_late(spark, tmp_path):
    import datetime as dt

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    in_dir = str(tmp_path / "events_in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(T(0, 10), "click", 1.0), (T(0, 20), "view", 2.0), (T(1, 15), "click", 3.0)]
    late_in_time = (T(0, 40), "click", 4.0)  # behind watermark 00:15, H0 still open
    batch2 = [(T(2, 30), "view", 5.0), late_in_time]
    too_late = (T(0, 5), "click", 100.0)  # H0 finalized at watermark 01:30 — dropped
    batch3 = [too_late, (T(4, 0), "view", 6.0)]

    _write_batch(spark, in_dir, batch1, 1)
    q = (
        hourly_event_counts_stream(spark, os.path.join(in_dir, "*"))
        .writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("hourly_stream").count() == 0  # no window finalized yet

        _write_batch(spark, in_dir, batch2, 2)
        q.processAllAvailable()
        h0 = {
            (r["hour"], r["event_type"], r["n"], r["sum_value"])
            for r in spark.table("hourly_stream").collect()
        }
        # H0 finalized WITH the late-but-in-time row; H1/H2 still open
        assert h0 == {
            ("2024-01-01 00:00:00", "click", 2, 5.0),
            ("2024-01-01 00:00:00", "view", 1, 2.0),
        }

        _write_batch(spark, in_dir, batch3, 3)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["hour"], r["event_type"], r["n"], r["sum_value"])
        for r in spark.table("hourly_stream").collect()
    )
    # batch oracle over exactly the rows that should count: everything except
    # the too-late row; windows H0-H2 finalized, the 04:00 row's window never
    kept = batch1 + batch2
    oracle_df = spark.createDataFrame(kept, EVENTS_STREAM_SCHEMA)
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    want = sorted(
        (r["hour"], r["event_type"], r["n"], r["sum_value"])
        for r in (
            oracle_df.groupBy(hour.alias("hour"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .collect()
        )
    )
    assert got == want
    assert all(h < "2024-01-01 03:00:00" for h, *_ in got)  # 04:00 window absent
