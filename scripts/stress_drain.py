#!/usr/bin/env python
"""10x-scale drain stress evidence: run one frontier drain at
BENCH_PAGES=4M / BENCH_SEEDS=200k (10x bench.py defaults) and report
per-batch wall times alongside a same-session bench-scale run, so the
flat-per-batch-cost claim from the compaction work is pinned at one
more order of magnitude. Prints one JSON line.

Usage: python scripts/stress_drain.py  (env: STRESS_PAGES, STRESS_SEEDS,
SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses make_spark + the drain protocol)


def one_drain(spark, n_pages: int, n_seeds: int, max_batches: int) -> dict:
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(max_depth=3, ignore_robots=True)  # = bench.py drain
    corpus = bench_corpus(spark, n_pages, heavy=True)
    state = tempfile.mkdtemp(prefix="colly_stress_")
    try:
        crawler = Crawler(spark, corpus, cfg, state)
        t0 = time.time()
        handles = crawler.run(bench_seeds(n_seeds), max_batches=max_batches)
        dt = time.time() - t0
        submitted = sum(m["submitted"] for m in handles.metrics)
        batch_s = [round(sum(v for k, v in m.items()
                             if k.startswith("t_")), 2)
                   for m in handles.metrics]
        return dict(
            pages=n_pages, seeds=n_seeds, seconds=round(dt, 2),
            urls_processed=submitted,
            urls_per_sec=round(submitted / dt, 1),
            batches=len(handles.metrics), batch_seconds=batch_s,
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)
        corpus["pages"].unpersist()


def main():
    pages = int(os.environ.get("STRESS_PAGES", "4000000"))
    seeds = int(os.environ.get("STRESS_SEEDS", "200000"))
    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod
    entry_mod._ensure_pkg(spark)  # executor imports from any cwd
    # warm-up at small scale (JIT/Python-worker spin-up)
    one_drain(spark, 50_000, 2_000, 10)
    base = one_drain(spark, pages // 10, seeds // 10, 10)
    big = one_drain(spark, pages, seeds, 10)
    out = {
        "metric": "drain stress 10x (same session, warmed)",
        "base": base,
        "big": big,
        "throughput_ratio_big_over_base": round(
            big["urls_per_sec"] / base["urls_per_sec"], 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
