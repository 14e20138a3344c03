"""Continuous crawl WITH link feedback — the full crawl loop as two
coupled Structured Streaming queries, no driver-side iteration.

The batch drain (plans/crawler.py) runs the frontier loop in
foreachBatch because extract→frontier UNION is cyclic and Structured
Streaming has no sink→source cycle primitive.  This module closes the
cycle through the filesystem instead:

    frontier/ ──(query A)──> fetched/ ──(query B)──> frontier/

- **Query A (crawler)**: streams the frontier directory, folds each
  host's arrivals through ONE applyInPandasWithState operator that is
  both the URL-seen gate and the politeness window — state per host is
  (window counter, seen-set, deferred FIFO).  A URL is claimed into
  the seen-set on ARRIVAL (the reference's check-AND-mark-before-fetch,
  colly.go:745-753, so duplicates drop even while the original is
  still deferred), and each invocation admits quota(host) rows.
  Admissions flow straight into a stream-static broadcast join against
  the fetch corpus (status + out-links) and land in ``fetched/`` via
  the exactly-once file sink.
- **Query B (discoverer)**: streams ``fetched/`` (reading query A's
  sink metadata log — exactly-once), explodes the out-links of parsed
  (status-200) pages into new frontier rows, and appends them to
  ``frontier/``.  The write is a plain parquet append inside a
  1-line foreachBatch adapter: the feedback edge cannot use the file
  sink's _spark_metadata log because the frontier directory must also
  accept the driver-staged seed file, and a FileStreamSource commits
  to one listing mode for a directory.  All crawl LOGIC lives in the
  continuous operators; the adapter only appends files.

Termination: the loop quiesces when the seen-sets saturate — query A
sees no new input, admits nothing (no state updates), and query B sees
no new pages.  The driver detects this purely from streaming progress
metrics (numInputRows / state numRowsUpdated / numRowsRemoved over k
consecutive polls) — O(1) reads, no Spark jobs, no data movement.

Determinism: per-batch timing changes WHICH micro-batch a URL rides,
but never the final crawled set — the seen-gate admits every distinct
reachable URL exactly once and every fetched page's links are
extracted exactly once, so the result is the politeness-independent
reachability closure of the seeds over the link graph (parse-gated:
only status-200 pages contribute edges).  That closure is pure SQL
(recursive CTE), which is what the ``continuous_crawl`` oracle
replays.

Scale shape: the per-host state row carries that host's seen hashes +
deferred backlog — the streaming twin of the batch engine's
hash-bucketed visited shards, keyed by host because per-domain FIFO
already forces that exchange.  Hot-domain skew therefore parks one
host's backlog on one state partition, which is semantically required;
emission stays O(quota)/host/trigger so no micro-batch can exceed the
politeness budget.  At 10^10-URL scale the state store must be RocksDB
(seen-sets exceed heap) — one session conf away via
streaming/statestore.py (provider-equality + engagement pinned by
tests/test_rocksdb_state.py) — and the corpus join a real fetch.

Scale boundary (explicit): this continuous path carries TWO engine
constraints that bound its scope. (1) The stream-static corpus side
must be BROADCASTABLE — a shuffled static scan is a streaming-planner
error (see guarded_broadcast in ratelimit.py; the constructor raises
past ``max_broadcast_rows`` rather than silently shipping a huge
table). (2) Per-host streaming state grows with that host's seen-set
— O(crawled URLs), not O(1)/key. Both are fine at this operator's
always-on incremental scope; the batch drain (plans/crawler.py, Bloom/
cuckoo seen segments + anti-join + executor-side commits) is the ONLY
10^10-frontier path.
"""

from __future__ import annotations

import os
import tempfile
import time

from colly_spark.config import CrawlConfig

FRONTIER_SCHEMA = "host string, url string, seq long"
OUTPUT_SCHEMA = "host string, url string, seq long, window_id int"
# per-host state: politeness window counter, seen-set (FNV-64a URL
# hashes — the engine's C3 dedup key, so collision behavior matches
# the batch drain), deferred FIFO as parallel arrays
STATE_SCHEMA = ("window int, seen array<long>, "
                "dseqs array<long>, durls array<string>")


def crawl_fold(cfg: CrawlConfig):
    """Seen-gate + politeness fold, keyed by host.

    seq is FNV-64a(url) — it is both the dedup key and the (arbitrary
    but deterministic) FIFO order within a host.  Arrivals not in the
    seen-set are claimed immediately and queued; each invocation emits
    the first quota(host) queued rows stamped with the host's next
    window number; the timeout re-arms while a backlog remains so
    deferred rows drain on the engine's own no-data batches."""

    def fold(key, pdf_iter, state):
        import pandas as pd

        host = key[0]
        window, seen, dseqs, durls = (
            state.get if state.exists else (0, [], [], []))
        seen = set(int(s) for s in seen)
        pending = {int(s): u for s, u in zip(dseqs, durls)}
        for pdf in pdf_iter:
            for s, u in zip(pdf["seq"], pdf["url"]):
                s = int(s)
                if s not in seen:       # claim on arrival
                    seen.add(s)
                    pending[s] = u
        window += 1
        quota = cfg.domain_quota(host)
        order = sorted(pending)
        admit, defer = order[:quota], order[quota:]
        state.update((window, sorted(seen), defer,
                      [pending[s] for s in defer]))
        if defer:
            state.setTimeoutDuration(1)
        yield pd.DataFrame({
            "host": [host] * len(admit),
            "url": [pending[s] for s in admit],
            "seq": admit,
            "window_id": [window] * len(admit),
        })

    return fold


class ContinuousCrawl:
    """Drive the two-query feedback loop over a static corpus.

    ``corpus_df`` columns: url, status int, links array<string> (the
    deterministic stand-in for fetch+parse — same contract as the
    batch drain's corpus join).  ``seeds_df`` columns: url."""

    def __init__(self, spark, seeds_df, corpus_df, cfg: CrawlConfig,
                 workdir: str | None = None,
                 max_broadcast_rows: int | None = None):
        from pyspark.sql import functions as F

        from colly_spark.functions.udfs import fnv64a_udf
        from colly_spark.streaming.ratelimit import (
            DEFAULT_MAX_BROADCAST_ROWS, guarded_broadcast)

        self.spark = spark
        self.cfg = cfg
        base = workdir or tempfile.mkdtemp(prefix="colly_cc_")
        self.frontier_dir = os.path.join(base, "frontier")
        self.fetched_dir = os.path.join(base, "fetched")
        self.ckpt_a = os.path.join(base, "ckpt_a")
        self.ckpt_b = os.path.join(base, "ckpt_b")
        self._host = lambda c: F.regexp_extract(c, r"http://([^/]+)/", 1)
        # the corpus must be broadcast (or row-materialized): a
        # shuffled static parquet scan inside a streaming plan hits the
        # ColumnarBatchRow→UnsafeRow ClassCastException (no AQE
        # columnar fix-up in streaming) — same constraint as
        # run_rate_limited_fetch. Size-guarded: raises past
        # max_broadcast_rows instead of silently shipping a huge
        # corpus to every task (guarded_broadcast).
        self.corpus = guarded_broadcast(
            corpus_df,
            DEFAULT_MAX_BROADCAST_ROWS if max_broadcast_rows is None
            else max_broadcast_rows)
        seeds = seeds_df.select(
            self._host(F.col("url")).alias("host"), "url",
            fnv64a_udf(F.col("url")).alias("seq"))
        seeds.coalesce(1).write.mode("overwrite").parquet(self.frontier_dir)
        self.qa = self.qb = None

    def start(self):
        from pyspark.sql import functions as F
        from pyspark.sql.streaming.state import GroupStateTimeout

        from colly_spark.functions.udfs import fnv64a_udf

        frontier = (self.spark.readStream.schema(FRONTIER_SCHEMA)
                    .parquet(self.frontier_dir))
        admitted = (frontier.groupBy("host")
                    .applyInPandasWithState(
                        crawl_fold(self.cfg), OUTPUT_SCHEMA, STATE_SCHEMA,
                        "Append", GroupStateTimeout.ProcessingTimeTimeout))
        fetched = admitted.join(self.corpus, "url", "left")
        self.qa = (fetched.writeStream.outputMode("append").format("parquet")
                   .option("path", self.fetched_dir)
                   .option("checkpointLocation", self.ckpt_a)
                   .queryName("crawler").start())
        # B's source starts only once A's sink log exists (source
        # listing mode is fixed at first read)
        deadline = time.time() + 120
        while not os.path.isdir(os.path.join(self.fetched_dir,
                                             "_spark_metadata")):
            if self.qa.exception() is not None:
                raise self.qa.exception()
            if time.time() > deadline:
                raise RuntimeError("crawler sink log never appeared")
            time.sleep(0.05)
        pages = (self.spark.readStream
                 .schema("host string, url string, seq long, window_id int, "
                         "status int, links array<string>")
                 .parquet(self.fetched_dir))
        links = (pages
                 .filter((F.col("status") == 200)
                         & (F.size("links") > 0))
                 .select(F.explode("links").alias("url"))
                 .select(self._host(F.col("url")).alias("host"), "url",
                         fnv64a_udf(F.col("url")).alias("seq")))
        frontier_dir = self.frontier_dir

        def _append(batch_df, _bid):
            # feedback edge: plain append (see module docstring)
            batch_df.write.mode("append").parquet(frontier_dir)

        self.qb = (links.writeStream.foreachBatch(_append)
                   .option("checkpointLocation", self.ckpt_b)
                   .queryName("discoverer").start())
        return self.qa, self.qb

    @staticmethod
    def _quiet(q):
        p = q.lastProgress
        if p is None:
            return False
        if p["numInputRows"] > 0:
            return False
        for so in p.get("stateOperators") or []:
            if so.get("numRowsUpdated", 0) or so.get("numRowsRemoved", 0):
                return False
        return True

    def wait_quiescent(self, timeout_s: float = 300.0, poll_s: float = 0.25,
                       quiet_polls: int = 16):
        """Block until the loop quiesces, then stop both queries.
        Metrics-only — no Spark jobs on the polling path.

        Query A is the clock: its ProcessingTimeTimeout state operator
        makes the engine run no-data micro-batches forever
        (FlatMapGroupsWithState.shouldRunAnotherBatch), so its batchId
        keeps advancing even when idle — and each of those batches
        commits a (possibly empty) file-sink epoch, which B's
        FileStreamSource sees as a new log version, so in practice B
        ticks 0-row batches in lockstep with A.  B-quiet is therefore
        "its latest progress row shows no input and no state churn"
        (the normal case), OR "its batchId froze across A's ticks and
        its trigger is inactive" (the belt-and-braces case, in case a
        future Spark stops relisting unchanged sink logs — then B's
        lastProgress freezes on a final data batch with
        numInputRows > 0 and must not be read at face value)."""
        deadline = time.time() + timeout_s
        quiet = 0
        last = (-1, -2)
        while time.time() < deadline:
            for q in (self.qa, self.qb):
                if q.exception() is not None:
                    self.qa.stop(); self.qb.stop()
                    raise q.exception()
            pa, pb = self.qa.lastProgress, self.qb.lastProgress
            a_bid = pa["batchId"] if pa else -1
            b_bid = pb["batchId"] if pb else -1
            # count only when A ticked — otherwise fast polling could
            # declare quiescence between two engine triggers
            if a_bid != last[0]:
                b_quiet = self._quiet(self.qb) or (
                    b_bid == last[1]
                    and not self.qb.status.get("isTriggerActive", True))
                quiet = quiet + 1 if (self._quiet(self.qa) and b_quiet) else 0
                last = (a_bid, b_bid)
                if quiet >= quiet_polls:
                    break
            time.sleep(poll_s)
        else:
            self.qa.stop(); self.qb.stop()
            raise RuntimeError("continuous crawl did not quiesce "
                               f"within {timeout_s}s")
        self.qa.stop(); self.qb.stop()

    def fetched(self):
        return self.spark.read.parquet(self.fetched_dir)


def run_continuous_crawl(spark, seeds_df, corpus_df, cfg: CrawlConfig,
                         timeout_s: float = 300.0):
    """Run the feedback loop to quiescence; returns the fetched rows
    (the seeds' reachability closure over parse-gated links)."""
    cc = ContinuousCrawl(spark, seeds_df, corpus_df, cfg)
    cc.start()
    cc.wait_quiescent(timeout_s=timeout_s)
    return cc.fetched()
