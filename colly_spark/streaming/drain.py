"""Structured Streaming drain — the foreachBatch form of the crawl loop.

North-star shape: "a salted-by-domain priority queue drained in
politeness-budgeted micro-batches via Structured Streaming
foreachBatch". The batch DAG itself lives in plans/crawler.py (driver
loop); this module drives the SAME per-batch pipeline from a streaming
query instead of a Python while-loop:

- a rate-micro-batch source emits one tick per trigger interval; each
  tick's ``foreachBatch`` callback executes exactly one crawl batch
  (admission → dedup/mark → quota → fetch → extract → sinks → commit);
- the politeness window (CrawlConfig.batch_window_ms) is enforced in
  *wall-clock* terms by the trigger interval — ticks arrive once per
  window, so a domain's per-batch quota is a per-window rate, which is
  precisely the LimitRule semantics (http_backend.go:199-211);
- crawl-state recovery stays with the engine's manifest/snapshot
  protocol (byte-identical resume, idempotent per-batch partitions);
  the streaming checkpoint adds source-offset tracking so a restarted
  query continues ticking where it stopped. A tick that fires after a
  crash simply resumes from the last committed manifest — re-running a
  half-written batch is deterministic and overwrites idempotently.
- the query stops itself when the frontier and pending pool are both
  empty (the queue-drain termination condition, queue/queue.go:169-175).

The driver-loop form (`Crawler.run`) and this streaming form produce
byte-identical outputs — asserted by tests/test_streaming_drain.py.
"""

from __future__ import annotations

import os
import tempfile

from colly_spark.plans.crawler import Crawler


def run_streaming_drain(spark, corpus, cfg, state_dir: str, seeds=None,
                        max_batches: int = 10_000,
                        trigger_interval: str | None = None,
                        resume: bool = False, **crawler_kwargs):
    """foreachBatch drain: one crawl batch per streaming tick.

    Returns the CrawlHandles of the underlying engine once the query
    has drained the frontier (self-stopped) or hit ``max_batches``.
    """
    crawler = Crawler(spark, corpus, cfg, state_dir, **crawler_kwargs)
    interval_ms = max(cfg.batch_window_ms, 100)
    trigger = trigger_interval or f"{interval_ms} milliseconds"
    checkpoint = os.path.join(state_dir, "stream_ckpt")

    # initialize crawl state (batch 0 bootstrap): write the seed
    # frontier + empty pending and commit manifest batch -1 so every
    # tick is a pure "advance one batch from committed state" step
    if resume:
        crawler.load_state()
    else:
        crawler.bootstrap(seeds or [])

    state = {"stop": False, "ticks": 0}

    def tick(_df, _epoch_id):
        if state["stop"]:
            return
        advanced = crawler.step()
        state["ticks"] += 1
        if not advanced or state["ticks"] >= max_batches:
            state["stop"] = True

    q = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1)
        .load()
        .writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger)
        .start()
    )
    import time as _time

    while q.isActive and not state["stop"]:
        _time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    return crawler.handles()
