"""X4 response cache: cached fetches must change performance, never
results — a crawl with the cache on produces byte-identical trace and
sinks while recording cache hits on revisited URLs."""

from __future__ import annotations

import tempfile

from colly_spark.config import CrawlConfig
from colly_spark.plans.bench_corpus import bench_corpus, bench_seeds
from colly_spark.plans.crawler import Crawler


def _rows(h):
    return sorted(map(tuple, h.trace().collect()))


def test_cache_hits_and_identical_results(spark):
    # hub links make every page re-discover its domain hub →
    # max_revisits=1 re-admits each hub once more → the second fetch
    # hits the cache
    corpus = bench_corpus(spark, 300, n_domains=4, hub_every=10)
    cfg_nocache = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1)
    cfg_cache = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                            cache_enabled=True)
    seeds = bench_seeds(8, n_domains=4)
    h1 = Crawler(spark, corpus, cfg_nocache, tempfile.mkdtemp()).run(seeds)
    h2 = Crawler(spark, corpus, cfg_cache, tempfile.mkdtemp()).run(seeds)
    assert _rows(h1) == _rows(h2), "cache changed crawl results"
    hits = sum(m.get("cache_hits", 0) for m in h2.metrics)
    assert hits > 0, "no cache hits recorded"
    # total fetched identical
    assert sum(m["fetched"] for m in h1.metrics) == sum(m["fetched"] for m in h2.metrics)


def test_cache_ttl_expiry(spark):
    corpus = bench_corpus(spark, 300, n_domains=4, hub_every=10)
    cfg = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=2,
                      cache_enabled=True, cache_ttl_batches=1)
    h = Crawler(spark, corpus, cfg, tempfile.mkdtemp()).run(bench_seeds(8, n_domains=4))
    # ttl=1: an entry created in batch b is invalid from batch b+1 on →
    # every revisit refetches
    assert sum(m.get("cache_hits", 0) for m in h.metrics) == 0


def test_cache_expiry_never_ignores_ttl(spark):
    """cacheExpNever (cache.go:204-211): the TTL is not consulted."""
    corpus = bench_corpus(spark, 300, n_domains=4, hub_every=10)
    cfg = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                      cache_enabled=True, cache_ttl_batches=1,
                      cache_expiry_policy="never")
    h = Crawler(spark, corpus, cfg, tempfile.mkdtemp()).run(
        bench_seeds(8, n_domains=4))
    assert sum(m.get("cache_hits", 0) for m in h.metrics) > 0


def test_cache_expiry_by_date_cutoff(spark):
    """cacheExpByDate (cache.go:185-199): every entry is invalid once
    the logical clock reaches the fixed cutoff — hits before it, none
    after, results unchanged either way."""
    corpus = bench_corpus(spark, 300, n_domains=4, hub_every=10)
    seeds = bench_seeds(8, n_domains=4)
    base = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                       cache_enabled=True)
    h_ref = Crawler(spark, corpus, base, tempfile.mkdtemp()).run(seeds)
    from dataclasses import replace
    cut = replace(base, cache_expiry_policy="date", cache_expire_at_batch=1)
    h_cut = Crawler(spark, corpus, cut, tempfile.mkdtemp()).run(seeds)
    assert _rows(h_ref) == _rows(h_cut)
    # cutoff at batch 1: no batch ≥ 1 may replay from cache
    assert sum(m.get("cache_hits", 0) for m in h_cut.metrics) == 0
    assert sum(m.get("cache_hits", 0) for m in h_ref.metrics) > 0


def test_cache_expiry_by_header(spark):
    """cacheExpByHeader (cache.go:155-162): entries live exactly as
    long as their own response's max-age — ample max-age replays like
    default, absent max-age never replays; results identical."""
    from pyspark.sql import functions as F

    base_corpus = bench_corpus(spark, 300, n_domains=4, hub_every=10)
    cfg = CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                      cache_enabled=True, cache_expiry_policy="header")
    seeds = bench_seeds(8, n_domains=4)

    fresh = dict(base_corpus)
    fresh["pages"] = base_corpus["pages"].withColumn(
        "cache_max_age", F.lit(9999).cast("int"))
    h_fresh = Crawler(spark, fresh, cfg, tempfile.mkdtemp()).run(seeds)
    assert sum(m.get("cache_hits", 0) for m in h_fresh.metrics) > 0

    # no max-age header anywhere → nothing is replayable
    h_bare = Crawler(spark, base_corpus, cfg, tempfile.mkdtemp()).run(seeds)
    assert sum(m.get("cache_hits", 0) for m in h_bare.metrics) == 0
    assert _rows(h_fresh) == _rows(h_bare)
