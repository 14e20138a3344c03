#!/usr/bin/env python
"""Long politeness-bounded drain: the flat-per-batch-cost evidence for
the state-store compaction work (VERDICT r2 #2's "Done =" criterion).

Runs a ~200-batch quota-bounded crawl twice in one warmed session:
once with leveled compaction ON (the default), once with compaction
DISABLED (compact_every=0, the round-1 behavior where visited/cache/
cookie delta dirs grow by ≥1 per batch and every batch's anti-join
re-opens all of them). Reports per-batch wall times, the early-window
vs late-window medians of each arm, and the end-of-run live state-file
dir counts. Flat late/early ratio with compaction ON plus a growing
ratio (and dir count) with it OFF pins the claim at one more order of
magnitude than tests/test_compaction.py's unit scale.

Politeness math: LimitRule(parallelism=1, delay_ms=230) with the
default 1000 ms window / 20 ms service time gives a per-domain quota
of 4; 16 domains → ~64 fetches/batch, so a 4k-seed frontier over a
60k-page corpus stays backlogged past 200 batches while every batch
still exercises the full admission/dedup/fetch/commit path.

Usage: python scripts/long_drain.py
Env: LD_BATCHES (200), LD_PAGES (60000), LD_SEEDS (4000),
     LD_ARMS ("on,off" — run a subset, e.g. LD_ARMS=on for the
     flatness arm alone at big LD_PAGES), SPARK_GRAFT_CPUS (bench
     default).
Prints one JSON line (per-arm results as each arm lands on stderr).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

N_DOMAINS = 16


def one_drain(spark, n_pages, n_seeds, max_batches, compact_every) -> dict:
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(
        max_depth=0,  # unlimited
        ignore_robots=True,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=230,
                               parallelism=1),))
    corpus = bench_corpus(spark, n_pages, n_domains=N_DOMAINS)
    state = tempfile.mkdtemp(prefix="colly_longdrain_")
    try:
        crawler = Crawler(spark, corpus, cfg, state,
                          compact_every=compact_every)
        t0 = time.time()
        handles = crawler.run(bench_seeds(n_seeds, N_DOMAINS),
                              max_batches=max_batches)
        dt = time.time() - t0
        batch_s = [round(sum(v for k, v in m.items()
                             if k.startswith("t_")), 3)
                   for m in handles.metrics]
        n = len(batch_s)
        lo = min(max(5, n // 20), max(0, n - 2))         # skip warm ramp
        early = batch_s[lo:max(lo + 1, n // 4)]
        late = batch_s[min(3 * n // 4, n - 1):]
        live_dirs = {s: len(getattr(crawler, f"_{s}_paths", []) or [])
                     for s in ("visited", "cache", "cookie")}
        return dict(
            compact_every=compact_every, batches=n,
            fetched=sum(m.get("fetched", 0) for m in handles.metrics),
            submitted=sum(m.get("submitted", 0) for m in handles.metrics),
            seconds=round(dt, 1),
            early_median_s=round(statistics.median(early), 3),
            late_median_s=round(statistics.median(late), 3),
            late_over_early=round(statistics.median(late)
                                  / statistics.median(early), 3),
            live_state_dirs=live_dirs,
            batch_seconds=batch_s,
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)
        corpus["pages"].unpersist()


def main():
    batches = int(os.environ.get("LD_BATCHES", "200"))
    pages = int(os.environ.get("LD_PAGES", "60000"))
    seeds = int(os.environ.get("LD_SEEDS", "4000"))
    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod
    entry_mod._ensure_pkg(spark)
    arms = [a.strip() for a in
            os.environ.get("LD_ARMS", "on,off").split(",") if a.strip()]
    one_drain(spark, 10_000, 500, 8, 16)  # warm-up
    out = {
        "metric": "long politeness-bounded drain, per-batch wall flatness",
    }
    for arm in arms:
        res = one_drain(spark, pages, seeds, batches,
                        16 if arm == "on" else 0)
        out[f"compaction_{arm}"] = {k: v for k, v in res.items()
                                    if k != "batch_seconds"}
        out[f"batch_seconds_{arm}"] = res["batch_seconds"]
        print(json.dumps({f"compaction_{arm}":
                          out[f"compaction_{arm}"]}), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
