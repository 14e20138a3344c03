#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md): the same frontier drain
at two parallelism levels on the same input.

The sandbox has no multi-node cluster, so the north_rule's N-vs-4N
executor criterion is evidenced by local[N] vs local[4N] on one
machine (driver instruction). Protocol per level:

  1. build the Spark-generated corpus (pure exprs, no driver data),
  2. one warm-up drain (JIT/codegen + Python-worker spin-up — cold
     first-run wall time is ~2x warm and pure noise),
  3. one measured drain; report submitted URLs / wall seconds.

Usage: python scripts/scaling_bench.py <cpus> [n_pages] [n_seeds] [repeats]
Prints one JSON line (per-repeat walls + median). Run under
``taskset -c 0-{cpus-1}`` for a CPU-pinned measurement (the JVM and
every Python worker inherit the affinity mask) — see
scripts/scaling_evidence.py for the pinned 2-level protocol.
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

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 3_200_000
N_SEEDS = int(sys.argv[3]) if len(sys.argv) > 3 else 160_000
REPEATS = int(sys.argv[4]) if len(sys.argv) > 4 else 1


def drain(spark, n_pages, n_seeds):
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    corpus = bench_corpus(spark, n_pages, heavy=True)
    # materialize + cache the corpus before the clock starts: the
    # corpus is the stand-in for "the web", not part of the crawler
    corpus["pages"] = corpus["pages"].persist()
    corpus["pages"].count()
    state_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    state = tempfile.mkdtemp(prefix="colly_scale_", dir=state_root)
    try:
        crawler = Crawler(spark, corpus, CrawlConfig(max_depth=3, ignore_robots=True),
                          state)
        t0 = time.time()
        h = crawler.run(bench_seeds(n_seeds), max_batches=10)
        dt = time.time() - t0
        sub = sum(m["submitted"] for m in h.metrics)
        fetched = sum(m["fetched"] for m in h.metrics)
        return dict(seconds=round(dt, 1), submitted=sub, fetched=fetched,
                    urls_per_sec=round(sub / dt, 1))
    finally:
        corpus["pages"].unpersist()
        shutil.rmtree(state, ignore_errors=True)


def main():
    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    from bench import make_spark

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm = drain(spark, max(N_PAGES // 8, 10000), max(N_SEEDS // 8, 1000))
    runs = [drain(spark, N_PAGES, N_SEEDS) for _ in range(REPEATS)]
    med = statistics.median(r["urls_per_sec"] for r in runs)
    print(json.dumps(dict(cpus=CPUS, n_pages=N_PAGES, n_seeds=N_SEEDS,
                          warmup=warm, runs=runs,
                          median_urls_per_sec=round(med, 1),
                          affinity_cpus=len(os.sched_getaffinity(0)))))
    spark.stop()


if __name__ == "__main__":
    main()
