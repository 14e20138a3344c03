#!/usr/bin/env python
"""spark-submit entry point for the frontier drain (north_rule: "ships
via spark-submit --py-files").

Usage:
    cd /root/repo && python -c "
    import zipfile, os
    with zipfile.ZipFile('/tmp/colly_spark.zip', 'w') as z:
        for r, _, fs in os.walk('colly_spark'):
            for f in fs:
                if f.endswith('.py'):
                    z.write(os.path.join(r, f))
    "
    spark-submit --master 'local[8]' --py-files /tmp/colly_spark.zip \
        scripts/submit_drain.py <n_pages> <n_seeds> <max_depth>

On a cluster, replace --master with yarn/k8s and size
--num-executors/--executor-cores; the job itself is unchanged — the
state dir must then point at shared storage (S3/HDFS/Iceberg
warehouse).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    max_depth = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("colly-spark-drain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from colly_spark.config import CrawlConfig
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    corpus = bench_corpus(spark, n_pages, heavy=True)
    state = tempfile.mkdtemp(prefix="colly_submit_")
    t0 = time.time()
    handles = Crawler(spark, corpus, CrawlConfig(max_depth=max_depth, ignore_robots=True),
                      state).run(bench_seeds(n_seeds))
    dt = time.time() - t0
    sub = sum(m["submitted"] for m in handles.metrics)
    print(json.dumps(dict(
        seconds=round(dt, 1), submitted=sub,
        fetched=sum(m["fetched"] for m in handles.metrics),
        urls_per_sec=round(sub / dt, 1), state_dir=state)))
    spark.stop()


if __name__ == "__main__":
    main()
