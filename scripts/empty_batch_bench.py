#!/usr/bin/env python
"""Per-batch fixed-overhead probe (BENCH.md "Per-batch fixed
overhead"): wall time of an EMPTY-WORK batch — submissions that are
all duplicates of already-visited URLs, so admitted=0 / fetched=0 and
the batch pays only the fixed machinery (admission checkpoint, snap/
sink writes, commit). This is the floor every politeness-bounded
batch pays, so it bounds steady-state crawl latency.

Interleaved A/B: the empty-sink template-copy path (COLLY_EMPTY_TMPL)
is flipped per repeat WITHIN one Spark session against the same warmed
state, so the comparison is immune to the ±25% cross-process host
variance documented in BENCH.md. Scenario matches the round-2 table:
local[8], 20k-page corpus, 2k-seed warm drain first (JIT/codegen/
Arrow warm + marks the URLs visited), then alternating repeats of one
dup-submission batch (2k seeds x 3 = 6k submissions, all visited; the
duplicates yield already_visited error rows, so the errors sink stays
a real write and the frontier/pending snapshots take the template
path when the flag is on).

Usage: python scripts/empty_batch_bench.py [repeats_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main():
    from pyspark.sql import SparkSession

    from colly_spark.config import CrawlConfig
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    corpus = bench_corpus(spark, 20_000)
    corpus["pages"] = corpus["pages"].persist()
    corpus["pages"].count()
    state_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    state = tempfile.mkdtemp(prefix="colly_empty_", dir=state_root)

    crawler = Crawler(spark, corpus, CrawlConfig(max_depth=2, ignore_robots=True),
                      state)
    t0 = time.time()
    crawler.run(bench_seeds(2_000))
    warm_s = round(time.time() - t0, 1)

    dup_seeds = bench_seeds(2_000) * 3  # 6k submissions, all visited
    # one untimed warm repeat per arm (arm "1" also materializes the
    # templates so their one-time Spark write isn't in the timings)
    for flag in ("1", "0"):
        os.environ["COLLY_EMPTY_TMPL"] = flag
        crawler.bootstrap(dup_seeds)
        crawler.step()

    arms = {"1": {"walls": [], "laps": []}, "0": {"walls": [], "laps": []}}
    for _ in range(REPEATS):
        for flag in ("0", "1"):  # interleaved: noise hits both arms alike
            os.environ["COLLY_EMPTY_TMPL"] = flag
            crawler.bootstrap(dup_seeds)
            t0 = time.time()
            crawler.step()
            arms[flag]["walls"].append(round(time.time() - t0, 2))
            m = crawler._metrics[-1]
            arms[flag]["laps"].append(
                {k: v for k, v in m.items() if k.startswith("t_")})
            assert m["admitted"] == 0 and m["fetched"] == 0, m
    os.environ.pop("COLLY_EMPTY_TMPL", None)

    out = dict(warm_drain_s=warm_s)
    for flag, label in (("1", "tmpl_on"), ("0", "tmpl_off")):
        walls = arms[flag]["walls"]
        med = statistics.median(walls)
        med_laps = arms[flag]["laps"][
            walls.index(min(walls, key=lambda w: abs(w - med)))]
        out[label] = dict(walls=walls, median_s=med, median_laps=med_laps)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
