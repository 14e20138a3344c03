"""Watermarked windowed streaming rollup (streaming/windows.py):
complete-mode parity with the batch aggregation, and append-mode
late-data dropping across two checkpointed availableNow runs."""

from __future__ import annotations

import datetime as dt
import os

EVENTS = "/root/testdata/sf0.001/events.parquet"

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")


def _rows(df):
    return sorted(
        (r["win_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in df.collect())


class TestCompleteModeParity:
    def test_stream_equals_batch(self, spark):
        from colly_spark.streaming.windows import (run_streaming_rollup,
                                                   windowed_event_rollup)

        from pyspark.sql import functions as F

        got = run_streaming_rollup(spark, EVENTS, mode="complete")
        want = windowed_event_rollup(
            spark.read.parquet(EVENTS)
            .withColumn("ts", F.col("ts").cast("timestamp")))
        assert _rows(got) == _rows(want)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


class TestAppendModeLateData:
    def test_late_rows_dropped_after_watermark(self, spark, tmp_path):
        from colly_spark.streaming.windows import run_streaming_rollup

        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        t = dt.datetime(2024, 1, 1, 10, 0, 0)

        # run 1: rows in the 10:00 window, max ts 13:30 → watermark
        # 11:30 (2h) closes the 10:00 window; its agg is emitted final
        _write_events(spark, src, [
            (1, t, 1, "click", 1.0, "{}"),
            (2, t.replace(minute=30), 2, "click", 2.0, "{}"),
            (3, t.replace(hour=13, minute=30), 3, "click", 4.0, "{}"),
        ])
        out1 = run_streaming_rollup(spark, src, watermark="2 hours",
                                    mode="append", checkpoint_dir=ckpt,
                                    output_dir=out)
        got1 = {(r["win_start"], r["n_events"], r["sum_value"])
                for r in out1.collect()}
        assert (t, 2, 3.0) in got1                 # 10:00 window final
        assert all(w != t.replace(hour=13) for w, _, _ in got1)  # open

        # run 2: a LATE row for the already-closed 10:00 window plus a
        # fresh row; the late row must be dropped, the 10:00 window
        # must NOT re-emit
        _write_events(spark, src, [
            (4, t.replace(minute=45), 4, "click", 100.0, "{}"),  # late
            (5, t.replace(hour=16), 5, "click", 8.0, "{}"),
        ])
        out2 = run_streaming_rollup(spark, src, watermark="2 hours",
                                    mode="append", checkpoint_dir=ckpt,
                                    output_dir=out)
        got2 = {(r["win_start"], r["n_events"], r["sum_value"])
                for r in out2.collect()}
        new2 = got2 - got1
        # the closed 10:00 window neither re-emits nor absorbs the
        # late row (no (10:00, 3, 103.0) and no duplicate of (2, 3.0))
        assert all(w != t for w, _, _ in new2)
        # the 13:00 window closes under the new watermark (14:00) and
        # emits with ONLY its original row — untouched by the late one
        assert (t.replace(hour=13), 1, 4.0) in new2
