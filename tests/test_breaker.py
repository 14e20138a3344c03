"""Per-host error-budget circuit breaker (cfg.host_error_budget) —
an engine extension the reference has no analogue for: at a 10^10-URL
frontier a dead host otherwise burns its politeness quota every batch
forever. Pins: (a) the breaker changes WHEN dead-host fetches happen
(cooldown gaps), never WHAT the crawl produces — live-host results and
the dead host's final error multiset are identical to a breaker-off
run; (b) blocked batches actually skip the host (no dead-host errors
inside a cooldown window); (c) state survives kill/resume; (d) default
off = bit-identical to the pre-breaker engine (the parity suite pins
that globally)."""

from __future__ import annotations

import shutil
import tempfile

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.plans.crawler import Crawler


def _cfg(budget=0, cooldown=2):
    # delay 900 / parallelism 1 → quota 1 per batch: the dead host's 8
    # URLs spread over 8 fetching batches, so the consecutive-failed-
    # batch counter actually ticks
    return CrawlConfig(
        max_depth=2, ignore_robots=True,
        host_error_budget=budget, host_cooldown_batches=cooldown,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=900,
                               parallelism=1),))


DEAD = [f"http://dead.test/p{i}" for i in range(8)]
SEEDS = ["http://d00.test/", "http://d01.test/"] + DEAD


def _dead_error_batches(handles):
    return sorted(r["batch"] for r in handles.errors().collect()
                  if "dead.test" in r["url"])


def _live_trace(handles):
    return sorted((r["seq"], r["url"], r["final_url"], r["status"])
                  for r in handles.trace().collect()
                  if "dead.test" not in r["url"])


def _dead_errors(handles):
    return sorted((r["url"], r["kind"])
                  for r in handles.errors().collect()
                  if "dead.test" in r["url"])


def test_breaker_defers_dead_host_but_preserves_results(
        spark, corpus_spark, tmp_state):
    off_state = tempfile.mkdtemp(prefix="colly_brk_off_")
    try:
        off = Crawler(spark, corpus_spark, _cfg(budget=0), off_state,
                      bloom_threshold_rows=0, compact_every=0).run(SEEDS)
        on = Crawler(spark, corpus_spark, _cfg(budget=2, cooldown=2),
                     tmp_state, bloom_threshold_rows=0,
                     compact_every=0).run(SEEDS)

        # WHAT the crawl produced is unchanged: live-host trace and
        # the dead host's full error multiset are identical (deferred
        # rows are never dropped — they fetch after the cooldown)
        assert _live_trace(on) == _live_trace(off)
        assert _dead_errors(on) == _dead_errors(off)
        assert len(_dead_errors(on)) == len(DEAD)

        # WHEN changed: breaker-on spreads the dead-host attempts
        # across cooldown gaps. budget=2 → after 2 consecutive failed
        # batches, ≥2 batch indices are skipped before the next try
        ob = _dead_error_batches(on)
        gaps = [b2 - b1 for b1, b2 in zip(ob, ob[1:])]
        assert any(g > 2 for g in gaps), (ob, gaps)
        # off-run has no such gap (quota admits it every batch)
        fb = _dead_error_batches(off)
        assert all(b2 - b1 <= 1 for b1, b2 in zip(fb, fb[1:])), fb
        # metrics recorded blocked hosts at least once
        assert any(m.get("hosts_blocked", 0) > 0 for m in on.metrics)
    finally:
        shutil.rmtree(off_state, ignore_errors=True)


def test_breaker_state_survives_resume(spark, corpus_spark, tmp_state):
    ref_state = tempfile.mkdtemp(prefix="colly_brk_ref_")
    cfg = _cfg(budget=2, cooldown=3)
    try:
        ref = Crawler(spark, corpus_spark, cfg, ref_state,
                      bloom_threshold_rows=0, compact_every=0).run(SEEDS)
        # kill mid-crawl (inside/near the first cooldown window), then
        # resume with a NEW crawler: byte-identical continuation
        part = Crawler(spark, corpus_spark, cfg, tmp_state,
                       bloom_threshold_rows=0, compact_every=0)
        part.run(SEEDS, max_batches=4)
        resumed = Crawler(spark, corpus_spark, cfg, tmp_state,
                          bloom_threshold_rows=0,
                          compact_every=0).run(resume=True)
        want = sorted((r["batch"], r["seq"], r["url"], r["status"])
                      for r in ref.trace().collect())
        got = sorted((r["batch"], r["seq"], r["url"], r["status"])
                     for r in resumed.trace().collect())
        assert got == want
        assert _dead_error_batches(resumed) == _dead_error_batches(ref)
    finally:
        shutil.rmtree(ref_state, ignore_errors=True)
