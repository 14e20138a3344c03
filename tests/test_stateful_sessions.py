"""applyInPandasWithState sessionizer (streaming/stateful.py):
converged cumulative counts equal the batch lag-window sessionize, and
state demonstrably carries across micro-batches."""

from __future__ import annotations

import datetime as dt

EVENTS = "/root/testdata/sf0.001/events.parquet"

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")


def _batch_counts(spark, path):
    from pyspark.sql import Window, functions as F

    ev = spark.read.parquet(path)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ns = F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    return (ev.withColumn("ns", ns).groupBy("user_id")
            .agg(F.sum("ns").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events")))


def _rows(df):
    return sorted((r["user_id"], r["n_sessions"], r["n_events"])
                  for r in df.collect())


class TestStatefulEqualsBatch:
    def test_converged_equals_lag_window(self, spark):
        from colly_spark.streaming.stateful import (converged_sessions,
                                                    run_stateful_sessions)

        sink = run_stateful_sessions(spark, EVENTS)
        assert _rows(converged_sessions(sink)) == _rows(
            _batch_counts(spark, EVENTS))


class TestStateCarriesAcrossBatches:
    def test_two_microbatches_one_user(self, spark, tmp_path):
        from colly_spark.streaming.stateful import (converged_sessions,
                                                    run_stateful_sessions)

        src = str(tmp_path / "events")
        t = dt.datetime(2024, 1, 1, 10, 0, 0)

        def write(rows):
            spark.createDataFrame(rows, SCHEMA).coalesce(1) \
                .write.mode("append").parquet(src)

        # file 1: one session (10:00, 10:10); file 2: >30 min later →
        # a second session (11:30, 11:40)
        write([(1, t, 7, "click", 1.0, "{}"),
               (2, t.replace(minute=10), 7, "click", 1.0, "{}")])
        write([(3, t.replace(hour=11, minute=30), 7, "click", 1.0, "{}"),
               (4, t.replace(hour=11, minute=40), 7, "click", 1.0, "{}")])

        sink = run_stateful_sessions(spark, src, max_files_per_trigger=1)
        emissions = sorted((r["n_sessions"], r["n_events"])
                           for r in sink.collect())
        # one emission per micro-batch: the intermediate (1 session,
        # 2 events) PROVES the second batch started from carried state
        assert emissions == [(1, 2), (2, 4)]
        [final] = converged_sessions(sink).collect()
        assert (final["user_id"], final["n_sessions"],
                final["n_events"]) == (7, 2, 4)
