"""Watermarked windowed aggregation — the Structured Streaming
late-data surface (readStream → withWatermark → window agg →
writeStream), complementing the foreachBatch crawl drain in drain.py.

The rollup logic is ONE function applied to both the batch and the
streaming DataFrame, so stream-vs-batch equality is structural, not
re-implemented. In `complete` mode an availableNow pass over a static
table must equal the batch aggregation exactly (oracled as
`streaming_events_window`); in `append` mode only windows the
watermark has closed are emitted and late rows are dropped — pinned by
tests/test_streaming_windows.py across two checkpointed availableNow
runs.

Scale shape: the groupBy keys are (window, event_type) — state per
key, bounded by watermark eviction; at 100 TB the state store holds
only open windows, and the shuffle is the standard partial-agg
exchange on the window key.
"""

from __future__ import annotations

import itertools
import os
import tempfile

_QUERY_IDS = itertools.count()


def windowed_event_rollup(df, window: str = "1 hour"):
    """Per-(window, event_type) counts and DECIMAL-accumulated value
    sums — identical semantics for a batch or streaming input."""
    from pyspark.sql import functions as F

    return (df.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("win_start"), "event_type",
                    "n_events", "sum_value"))


def run_streaming_rollup(spark, events_path: str, window: str = "1 hour",
                         watermark: str = "2 hours", mode: str = "complete",
                         checkpoint_dir: str | None = None,
                         output_dir: str | None = None,
                         schema=None):
    """Run the rollup as a real streaming query (file source,
    availableNow trigger) and return the sink contents.
    `mode="complete"` re-emits everything to a memory sink
    (static-table parity); `mode="append"` emits only
    watermark-finalized windows and drops late rows — pass a
    persistent `checkpoint_dir` AND `output_dir` (parquet file sink,
    the checkpoint-recoverable one) to carry watermark state across
    successive calls (the resume/late-data path)."""
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(events_path).schema
    name = f"ev_win_{next(_QUERY_IDS)}_{os.getpid()}"
    glob_path = events_path
    if os.path.isfile(events_path):
        # the file source requires a directory or glob basePath;
        # bracketing the first basename char is a glob that matches
        # exactly this one file
        d, b = os.path.split(events_path)
        glob_path = os.path.join(d, f"[{b[0]}]{b[1:]}")
    src = spark.readStream.schema(schema).parquet(glob_path)
    # parquet TIMESTAMP_NTZ → TIMESTAMP: watermarks require an
    # instant-typed event time (session tz is pinned in the session
    # builder, so the cast is deterministic)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_event_rollup(src.withWatermark("ts", watermark), window)
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="colly_winckpt_")
    w = (agg.writeStream.outputMode(mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True))
    if output_dir is not None:
        q = w.format("parquet").option("path", output_dir).start()
        q.awaitTermination()
        return spark.read.parquet(output_dir)
    q = w.format("memory").queryName(name).start()
    q.awaitTermination()
    return spark.table(name)
