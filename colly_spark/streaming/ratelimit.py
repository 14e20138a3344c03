"""Stateful per-domain rate limiter — the applyInPandasWithState form
of the politeness window (ROADMAP round-4 candidate #4).

The batch drain enforces LimitRule semantics per micro-batch with a
window over (host, seq) (operators/politeness.py) and keeps deferred
rows in the pending checkpoint; the driver loop re-feeds them next
batch.  This operator moves that deferral INTO the Structured
Streaming state store, so politeness can run as one continuous query
with no driver loop:

- input is the pending-request stream ``(host, url, seq)``, grouped by
  host (the same exchange the batch window pays — per-domain FIFO *is*
  a partition-by-host ordering);
- state per host carries ``(window counter, deferred FIFO queue)``;
  each invocation sorts arrivals into the queue by ``seq``, emits the
  first ``cfg.domain_quota(host)`` rows stamped with the host's next
  window number, and buffers the rest;
- a ProcessingTimeTimeout re-invokes hosts that still hold deferred
  rows on subsequent triggers even when no new input arrives — the
  state-store twin of the driver loop's re-feed.  The reference
  semantics are LimitRule's per-rule semaphore held for the whole
  ``fetch + Delay + rand(RandomDelay)`` window
  (http_backend.go:53-149, 199-211): one trigger ≈ one simulated
  politeness window, exactly like the batch drain's foreachBatch tick.

Determinism: ``window_id`` is the per-host invocation count, NOT a
global trigger index — so wall-clock timing (which global trigger a
timeout fires in) can never change the assignment.  When a host's
whole backlog arrives in its first micro-batch, the emitted
``window_id`` equals the closed form

    floor((rank_by_seq - 1) / quota(host)) + 1

which is what the batch drain produces when the driver loop re-feeds
deferrals — and is pure SQL, so the whole stateful operator is
oracle-checkable (query ``stateful_rate_limit``).

Scale shape: state is O(deferred backlog) per host — the same rows the
batch form keeps in the pending checkpoint, moved into the state
store; emission is O(quota) per host per trigger.  One exchange on
host; Arrow-batched; no driver-side state.  Hot-domain skew parks one
host's backlog in one state partition, which is semantically required
(per-domain FIFO) and bounded work per trigger (quota rows).
"""

from __future__ import annotations

import tempfile

from colly_spark.config import CrawlConfig

OUTPUT_SCHEMA = "host string, url string, seq long, window_id int"
# deferred FIFO queue rides the state store as parallel arrays
STATE_SCHEMA = "window int, seqs array<long>, urls array<string>"


def rate_limit_fold(cfg: CrawlConfig):
    """Per-host fold: admit up to quota per invocation, buffer the rest
    in state, re-arm the timeout while a backlog remains."""

    def fold(key, pdf_iter, state):
        import pandas as pd

        host = key[0]
        window, seqs, urls = (state.get if state.exists else (0, [], []))
        pending = {int(s): u for s, u in zip(seqs, urls)}
        for pdf in pdf_iter:
            for s, u in zip(pdf["seq"], pdf["url"]):
                pending[int(s)] = u
        window += 1
        quota = cfg.domain_quota(host)
        order = sorted(pending)
        admit, defer = order[:quota], order[quota:]
        if defer:
            state.update((window, defer, [pending[s] for s in defer]))
            # any positive duration: the next trigger's batch timestamp
            # is always later than +1ms, so backlogged hosts re-fire
            # every trigger until drained
            state.setTimeoutDuration(1)
        else:
            state.remove()
        yield pd.DataFrame({
            "host": [host] * len(admit),
            "url": [pending[s] for s in admit],
            "seq": admit,
            "window_id": [window] * len(admit),
        })

    return fold


def rate_limited_stream(pending_stream, cfg: CrawlConfig):
    """Wire the fold onto a streaming DataFrame of pending requests
    ``(host, url, seq)``.  Append mode: an admitted row is final."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (pending_stream.groupBy("host")
            .applyInPandasWithState(rate_limit_fold(cfg), OUTPUT_SCHEMA,
                                    STATE_SCHEMA, "Append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


class RateLimitedDrain:
    """Drive the limiter over a STATIC pending set.

    With ProcessingTimeTimeout the engine self-schedules no-data
    micro-batches while the query runs (FlatMapGroupsWithState's
    shouldRunAnotherBatch), so after the single data batch every
    subsequent batch is a pure timeout tick — one politeness window
    each, no synthetic tick input needed.  The flip side is that an
    availableNow query never self-terminates (the timeout keeps
    requesting batches even with empty state), so the driver polls the
    state-store metrics in query progress — O(1) driver-side reads, no
    Spark jobs — and stops the query once all input was consumed and
    the buffered backlog (numRowsTotal) hits zero.

    The checkpoint + exactly-once parquet sink make the drain
    restartable mid-backlog: stop(), then start() again resumes the
    per-host window counters from the state store
    (tests/test_rate_limit.py::test_state_survives_restart).
    """

    def __init__(self, spark, pending_df, cfg: CrawlConfig,
                 checkpoint_dir: str | None = None, transform=None):
        from pyspark.sql import functions as F

        self.spark = spark
        self.cfg = cfg
        self.transform = transform  # post-admission streaming stages
        self.total = pending_df.count()
        self.stage = tempfile.mkdtemp(prefix="colly_rl_src_")
        self.ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="colly_rlckpt_")
        self.out = tempfile.mkdtemp(prefix="colly_rl_out_")
        (pending_df
         .select("host", "url", F.col("seq").cast("long").alias("seq"))
         .coalesce(1).write.mode("overwrite").parquet(self.stage))
        self.schema = spark.read.parquet(self.stage).schema
        self.query = None

    def start(self):
        src = self.spark.readStream.schema(self.schema).parquet(self.stage)
        admitted = rate_limited_stream(src, self.cfg)
        if self.transform is not None:
            admitted = self.transform(admitted)
        # exactly-once parquet sink: accumulates across query restarts
        self.query = (admitted
                      .writeStream.outputMode("append").format("parquet")
                      .option("path", self.out)
                      .option("checkpointLocation", self.ckpt)
                      .trigger(availableNow=True).start())
        return self.query

    def _progress(self):
        p = self.query.lastProgress if self.query else None
        if not p or not p.get("stateOperators"):
            return None, None
        consumed = p["batchId"] >= 1  # batch 0 carried the staged data
        return consumed, p["stateOperators"][0].get("numRowsTotal")

    def wait_drained(self, timeout_s: float = 600.0, poll_s: float = 0.2,
                     stop_at_emitted: int | None = None):
        """Poll progress until the backlog empties (or, for restart
        tests, until ≥ stop_at_emitted rows were admitted), then stop
        the query.  Returns the emitted row count."""
        import time

        deadline = time.time() + timeout_s
        while time.time() < deadline:
            consumed, backlog = self._progress()
            if stop_at_emitted is not None and consumed:
                if self.emitted_count() >= stop_at_emitted:
                    break
            elif consumed and backlog == 0:
                break
            time.sleep(poll_s)
        else:
            self.query.stop()
            raise RuntimeError(
                f"rate-limited drain stalled: "
                f"{self.emitted_count()}/{self.total} admitted "
                f"within {timeout_s}s")
        self.query.stop()
        return self.emitted_count()

    def emitted_count(self) -> int:
        try:
            return self.spark.read.parquet(self.out).count()
        except Exception:
            return 0  # no committed micro-batch yet

    def emitted(self):
        return self.spark.read.parquet(self.out)


def run_rate_limited_drain(spark, pending_df, cfg: CrawlConfig,
                           checkpoint_dir: str | None = None,
                           timeout_s: float = 600.0):
    """Drain a static pending set through the stateful limiter and
    return the admitted rows with their per-host window stamps."""
    drain = RateLimitedDrain(spark, pending_df, cfg, checkpoint_dir)
    drain.start()
    emitted = drain.wait_drained(timeout_s=timeout_s)
    if emitted < drain.total:
        raise RuntimeError(
            f"rate-limited drain incomplete: {emitted}/{drain.total}")
    return drain.emitted()


DEFAULT_MAX_BROADCAST_ROWS = 5_000_000


def guarded_broadcast(df, max_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
                      what: str = "corpus"):
    """Broadcast-hint ``df``, refusing above ``max_rows`` rows.

    Stream-static joins in streaming plans MUST broadcast (or
    row-materialize) the static side — a shuffled static parquet scan
    throws ClassCastException ColumnarBatchRow→UnsafeRow (no AQE
    columnar fix-up in streaming).  That makes the static side an
    executor-memory-resident table by construction, so its size is a
    hard engine constraint of the continuous path, not a tunable:
    raising here is the honest alternative to silently shipping a huge
    table to every task.  Corpora past the cap belong on the batch
    drain (plans/crawler.py) — Bloom/cuckoo seen segments + a
    pre-partitioned (non-broadcast) corpus join — which is the only
    10^10-frontier path.  Guard cost is BOUNDED regardless of source
    shape: ``limit(max_rows + 1).count()`` short-circuits the scan as
    soon as max_rows + 1 rows exist (a metadata-only lookup on plain
    parquet, an early-terminated scan on a filtered/computed source —
    never the full-corpus count a bare ``count()`` would run)."""
    from pyspark.sql import functions as F

    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"refusing to broadcast {what} with > {max_rows} rows "
            f"(max_broadcast_rows): the stream-static side "
            "must fit in executor memory. Use the batch drain "
            "(plans/crawler.py) at this scale, or raise "
            "max_broadcast_rows explicitly.")
    return F.broadcast(df)


def run_rate_limited_fetch(spark, pending_df, corpus_df, cfg: CrawlConfig,
                           checkpoint_dir: str | None = None,
                           timeout_s: float = 600.0,
                           max_broadcast_rows: int = DEFAULT_MAX_BROADCAST_ROWS):
    """Politeness + fetch as ONE continuous query — no driver loop:
    the stateful limiter admits per-host quota slices per micro-batch,
    and each slice flows straight into a stream-static join against
    the (pre-partitioned, broadcastable) fetch corpus.  This is the
    north-star drain shape for the no-feedback case (seed fetches /
    depth-0 / sitemap pulls); the full link-feedback loop stays on the
    foreachBatch drain, whose frontier UNION is inherently iterative.

    ``corpus_df`` must carry a ``url`` column; all its other columns
    ride along into the output (status, body metadata, ...).  Returns
    the fetched rows with their politeness window stamps.

    Scale shape: the join is stream-static and the static side is
    explicitly broadcast-hinted — the right plan (per-batch admissions
    are quota-bounded and tiny against any corpus) AND a correctness
    requirement here: letting the streaming planner shuffle the static
    parquet scan emits columnar batches straight into the row-based
    shuffle serializer (ClassCastException ColumnarBatchRow →
    UnsafeRow; streaming plans skip AQE's columnar transition fix-up).
    The broadcast is therefore size-guarded (``max_broadcast_rows``,
    see ``guarded_broadcast``): past the cap this raises instead of
    silently shipping the table to every task — a corpus that big
    belongs on the batch drain's pre-partitioned (non-broadcast)
    corpus join.  Admission stays O(quota)/host/batch so no batch can
    exceed the politeness budget regardless of backlog size.
    """
    corpus_bc = guarded_broadcast(corpus_df, max_broadcast_rows)
    drain = RateLimitedDrain(
        spark, pending_df, cfg, checkpoint_dir,
        transform=lambda admitted: admitted.join(corpus_bc, "url", "left"))
    drain.start()
    emitted = drain.wait_drained(timeout_s=timeout_s)
    if emitted < drain.total:
        raise RuntimeError(
            f"rate-limited fetch incomplete: {emitted}/{drain.total}")
    return drain.emitted()
