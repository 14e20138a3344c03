"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state Structured Streaming surface (alongside the
watermarked window aggs in windows.py and the foreachBatch drain in
drain.py).

The operator is gap-based sessionization (the stateful twin of the
batch `sessionize` lag-window query): per user, a session break is a
>gap_s silence; state carries (last event ts, cumulative session and
event counts) across micro-batches, and every batch emits the user's
updated cumulative counts (Update mode). With input files that
partition event time monotonically, the cumulative counts converge to
exactly the batch lag-window result — pinned by
tests/test_stateful_sessions.py, which also forces a multi-micro-batch
run (maxFilesPerTrigger=1) to prove state actually carries.

Scale shape: state is O(1) per user (three numbers); the shuffle is
the standard groupBy exchange on user_id; each micro-batch's rows
stream through Arrow into the pandas fold. No driver-side state, no
per-row Python outside the Arrow batch.
"""

from __future__ import annotations

import itertools
import os
import tempfile

_QUERY_IDS = itertools.count()

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"


def _session_fold(gap_s: int):
    def fold(key, pdf_iter, state):
        import pandas as pd

        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0))
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts_unix", "event_id"])
            for t in pdf["ts_unix"]:
                if last_ts is None or (t - last_ts) > gap_s:
                    n_sessions += 1
                last_ts = float(t)
            n_events += len(pdf)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    return fold


def run_stateful_sessions(spark, events_path: str, gap_s: int = 1800,
                          checkpoint_dir: str | None = None,
                          max_files_per_trigger: int | None = None,
                          schema=None):
    """Run the sessionizer as a streaming query (file source,
    availableNow, memory sink, Update mode) and return the sink table.
    Update mode re-emits a user's row each batch their state changes;
    cumulative counts are monotone, so the converged result per user
    is the row with max n_events."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    if schema is None:
        schema = spark.read.parquet(events_path).schema
    name = f"ev_sess_{next(_QUERY_IDS)}_{os.getpid()}"
    glob_path = events_path
    if os.path.isfile(events_path):
        d, b = os.path.split(events_path)
        glob_path = os.path.join(d, f"[{b[0]}]{b[1:]}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # epoch seconds computed JVM-side: the pandas fold then never
    # touches timezone-dependent Timestamp.timestamp() conversions
    src = (reader.parquet(glob_path)
           .withColumn("ts", F.col("ts").cast("timestamp"))
           .withColumn("ts_unix", F.unix_timestamp("ts")
                       .cast("double")))
    out = (src.groupBy("user_id")
           .applyInPandasWithState(_session_fold(gap_s), OUTPUT_SCHEMA,
                                   STATE_SCHEMA, "Update",
                                   GroupStateTimeout.NoTimeout))
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="colly_sessckpt_")
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(name).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def converged_sessions(sink_df):
    """Collapse Update-mode emissions to the final per-user row (the
    cumulative counts are monotone in n_events)."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (sink_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
