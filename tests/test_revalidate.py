"""HTTP revalidation (cache_revalidate — RFC 9111 §4.3): engine-level
pins beyond the two parity scenarios (tests/test_crawler_parity.py
``cache_revalidate`` / ``cache_reval_header``).

Contract: revalidation changes HOW a stale entry is refreshed (a
body-free 304 round trip instead of a full refetch), never WHAT the
crawl observes — trace, seen-set, and errors are identical to a
revalidate-off run; only the `revalidated` metric and the cache
entry's c_created/c_expiry differ.
"""

from __future__ import annotations

import pytest

from colly_spark.config import CrawlConfig
from colly_spark.oracle.simulator import Simulator
from colly_spark.plans.crawler import Crawler

SEEDS = ["http://d00.test/", "http://d02.test/"]


def _cfg(**kw):
    base = dict(max_depth=3, ignore_robots=True, max_revisits=1,
                cache_enabled=True, cache_ttl_batches=1)
    base.update(kw)
    return CrawlConfig(**base)


def _trace_rows(eng):
    return sorted(
        (r["batch"], r["seq"], r["url"], r["final_url"], r["status"],
         r["method"]) for r in eng.trace().collect())


class TestWhenNotWhat:
    def test_trace_seen_errors_identical_on_vs_off(
            self, spark, corpus_pd, corpus_spark, tmp_state):
        import os

        on_dir = os.path.join(tmp_state, "on")
        off_dir = os.path.join(tmp_state, "off")
        eng_on = Crawler(spark, corpus_spark, _cfg(cache_revalidate=True),
                         on_dir, bloom_threshold_rows=0).run(
            list(SEEDS), max_batches=40)
        eng_off = Crawler(spark, corpus_spark, _cfg(),
                          off_dir, bloom_threshold_rows=0).run(
            list(SEEDS), max_batches=40)
        assert _trace_rows(eng_on) == _trace_rows(eng_off)
        seen_on = {r["url_hash"] for r in eng_on.visited().collect()}
        seen_off = {r["url_hash"] for r in eng_off.visited().collect()}
        assert seen_on == seen_off
        err_on = sorted((r["url"], r["kind"])
                        for r in eng_on.errors().collect())
        err_off = sorted((r["url"], r["kind"])
                         for r in eng_off.errors().collect())
        assert err_on == err_off
        # but the ON run actually revalidated: etag'd pages answered
        # 304 on their stale revisits
        total_reval = sum(m.get("revalidated", 0) for m in eng_on.metrics)
        assert total_reval > 0
        assert all("revalidated" not in m for m in eng_off.metrics)
        # and replays were NOT counted as cache hits (no valid entry
        # existed — ttl=1 staled everything between visits)
        for m in eng_on.metrics:
            assert m.get("revalidated", 0) <= m["fetched"]

    def test_stale_etag_revisits_revalidate_not_hit(self, corpus_pd):
        """Simulator-level arithmetic pin: ttl=1 stales every entry by
        its revisit batch, so NO revisit is a plain cache hit — every
        etag'd revisit revalidates, every validator-less one refetches
        fully."""
        sim = Simulator(corpus_pd, _cfg(cache_revalidate=True)).run(
            list(SEEDS), max_batches=40)
        assert sum(m.get("revalidated", 0) for m in sim.metrics) > 0
        assert sum(m.get("cache_hits", 0) for m in sim.metrics) == 0

    def test_no_validator_means_full_refetch(self, corpus_pd):
        """Pages without ANY validator can never 304: strip both from
        the corpus and the revalidated count is zero everywhere."""
        c = {k: v.copy() for k, v in corpus_pd.items()}
        c["pages"] = c["pages"].copy()
        c["pages"]["etag"] = None
        c["pages"]["last_modified"] = None
        sim = Simulator(c, _cfg(cache_revalidate=True)).run(
            list(SEEDS), max_batches=40)
        assert all(m.get("revalidated", 0) == 0 for m in sim.metrics)

    def test_last_modified_only_servers_revalidate(self, corpus_pd):
        """Strip every ETag (the no-ETag-server case): Last-Modified /
        If-Modified-Since alone still revalidates — the engine's
        §13.2.2 otherwise-branch."""
        c = {k: v.copy() for k, v in corpus_pd.items()}
        c["pages"] = c["pages"].copy()
        c["pages"]["etag"] = None
        sim = Simulator(c, _cfg(cache_revalidate=True)).run(
            list(SEEDS), max_batches=40)
        assert sum(m.get("revalidated", 0) for m in sim.metrics) > 0

    def test_default_off_no_metric(self, corpus_pd):
        sim = Simulator(corpus_pd, _cfg()).run(list(SEEDS), max_batches=40)
        assert all("revalidated" not in m for m in sim.metrics)


class TestStoredEntryRefresh:
    def test_engine_cache_entry_recreated_on_304(
            self, spark, corpus_spark, corpus_pd, tmp_state):
        """After a 304, the stored entry's c_created advances to the
        revalidating batch and c_etag persists — read the state
        parquet directly."""
        import glob
        import os

        import pyarrow.parquet as pq

        eng = Crawler(spark, corpus_spark, _cfg(cache_revalidate=True),
                      tmp_state, bloom_threshold_rows=0).run(
            list(SEEDS), max_batches=40)
        total_reval = sum(m.get("revalidated", 0) for m in eng.metrics)
        assert total_reval > 0
        dirs = sorted(glob.glob(os.path.join(tmp_state, "out", "cache", "*")))
        assert dirs
        import pandas as pd

        frames = [pq.read_table(d).to_pandas() for d in dirs]
        allrows = pd.concat(frames, ignore_index=True)
        assert "c_etag" in allrows.columns
        # at least one hash stored more than once (the refresh), and
        # refreshed entries keep their validator
        per_hash = allrows.groupby("c_hash").size()
        assert (per_hash > 1).any()
        latest = allrows.sort_values("c_created").groupby("c_hash").tail(1)
        refreshed = latest[latest["c_hash"].isin(
            per_hash[per_hash > 1].index)]
        assert refreshed["c_etag"].notna().any()

    def test_resume_across_revalidation_batch(
            self, spark, corpus_spark, corpus_pd, tmp_state):
        """Kill after the first revalidating batch; resume must
        reproduce the uninterrupted run byte-identically (trace +
        metrics incl. the revalidated counts)."""
        import os

        full_dir = os.path.join(tmp_state, "full")
        part_dir = os.path.join(tmp_state, "part")
        cfg = _cfg(cache_revalidate=True)
        full = Crawler(spark, corpus_spark, cfg, full_dir,
                       bloom_threshold_rows=0).run(list(SEEDS),
                                                   max_batches=40)
        # find the first batch with a revalidation; stop right after it
        first = next(i for i, m in enumerate(full.metrics)
                     if m.get("revalidated", 0) > 0)
        Crawler(spark, corpus_spark, cfg, part_dir,
                bloom_threshold_rows=0).run(list(SEEDS),
                                            max_batches=first + 1)
        resumed = Crawler(spark, corpus_spark, cfg, part_dir,
                          bloom_threshold_rows=0).run(
            list(SEEDS), max_batches=40, resume=True)
        assert _trace_rows(resumed) == _trace_rows(full)
        key = lambda ms: [(m["batch"], m["fetched"],
                           m.get("cache_hits"), m.get("revalidated"))
                          for m in ms]
        assert key(resumed.metrics) == key(full.metrics)
