"""Retry-After adaptive politeness (cfg.respect_retry_after) — server
back-pressure as an engine extension (the reference surfaces 429/503
to OnError and leaves the policy to the caller; RFC 9110 §10.2.3).
Pins: (a) honoring Retry-After changes WHEN attempts happen (block
gaps of exactly the advertised duration), never WHAT the crawl
produces — trace/error multisets identical to a respect-off run;
(b) the cap bounds absurd server values; (c) the block survives
kill/resume (it rides the same hosthealth snapshot as the circuit
breaker); (d) default off = reference semantics (the parity suite
pins that globally)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.plans.crawler import Crawler
from colly_spark.plans.util import to_spark_corpus

BUSY = [f"http://busy.test/b{i}" for i in range(3)] + \
    ["http://busy.test/s503"]
OK = [f"http://ok.test/p{i}" for i in range(6)]


def _corpus(spark, ra=3):
    rows = []

    def page(url, status=200, retry_after=None):
        rows.append(dict(
            url=url, status=status, content_type="text/html",
            body=b"<html></html>", redirect_to=None, image_id=None,
            links=[], depth_from_seed=0, set_cookie=None,
            require_cookie=None, cache_max_age=None,
            retry_after=retry_after))

    for u in OK:
        page(u)
    for u in BUSY[:-1]:
        page(u, status=429, retry_after=ra)
    page(BUSY[-1], status=503, retry_after=ra)
    pages = pd.DataFrame(rows)
    # mixed int/None upcasts to float64 NaN — force int-or-None objects
    # for the IntegerType Spark column (the fixtures-module discipline)
    pages["retry_after"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pages["retry_after"]],
        dtype=object, index=pages.index)
    return to_spark_corpus(spark, dict(
        pages=pages,
        robots=pd.DataFrame(columns=["host", "body", "fetch_error"]),
        images=pd.DataFrame(columns=["image_id", "bytes", "w", "h",
                                     "fmt", "caption", "phash"])))


def _cfg(respect, cap=64):
    return CrawlConfig(
        max_depth=1, ignore_robots=True,
        respect_retry_after=respect, retry_after_cap_batches=cap,
        retry_http_statuses=(429, 503), max_retries=2,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=0,
                               parallelism=8),))


def _attempt_batches(handles):
    """url → sorted batches of its GET attempts (one trace row per
    attempt — the retry path re-enters the full pipeline)."""
    out: dict = {}
    for r in handles.trace().collect():
        out.setdefault(r["url"], []).append(r["batch"])
    return {u: sorted(bs) for u, bs in out.items()}


def _what(handles):
    trace = sorted((r["url"], r["status"], r["method"])
                   for r in handles.trace().collect())
    errors = sorted((r["url"], r["kind"])
                    for r in handles.errors().collect())
    return trace, errors


def test_retry_after_defers_host_but_preserves_results(spark, tmp_state):
    corpus = _corpus(spark, ra=3)
    off_state = tempfile.mkdtemp(prefix="colly_ra_off_")
    try:
        off = Crawler(spark, corpus, _cfg(False), off_state,
                      bloom_threshold_rows=0, compact_every=0) \
            .run(OK + BUSY)
        on = Crawler(spark, corpus, _cfg(True), tmp_state,
                     bloom_threshold_rows=0, compact_every=0) \
            .run(OK + BUSY)

        # WHAT is unchanged: same attempts, same statuses, same errors
        assert _what(on) == _what(off)

        ab_on, ab_off = _attempt_batches(on), _attempt_batches(off)
        for u in BUSY:
            # 1 + max_retries attempts either way
            assert len(ab_on[u]) == len(ab_off[u]) == 3
            # respect-off retries land in consecutive batches
            assert [b - ab_off[u][0] for b in ab_off[u]] == [0, 1, 2]
            # respect-on: Retry-After=3s at a 1000 ms window blocks
            # batches b+1..b+3, so each next attempt lands at b+4
            assert [b - ab_on[u][0] for b in ab_on[u]] == [0, 4, 8]
        # the live host is never deferred by busy.test's back-pressure
        for u in OK:
            assert ab_on[u] == ab_off[u] == [0]
        assert any(m.get("hosts_blocked", 0) > 0 for m in on.metrics)
        assert not any(m.get("hosts_blocked", 0) > 0 for m in off.metrics)
    finally:
        shutil.rmtree(off_state, ignore_errors=True)


def test_retry_after_cap_bounds_block(spark, tmp_state):
    corpus = _corpus(spark, ra=10**6)   # server advertises ~11.6 days
    cfg = CrawlConfig(
        max_depth=1, ignore_robots=True,
        respect_retry_after=True, retry_after_cap_batches=2,
        retry_http_statuses=(429, 503), max_retries=1,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=0,
                               parallelism=8),))
    on = Crawler(spark, corpus, cfg, tmp_state,
                 bloom_threshold_rows=0, compact_every=0).run(OK + BUSY)
    ab = _attempt_batches(on)
    for u in BUSY:
        # capped at 2 batches: blocked_until = 0+1+2 → retry at batch 3
        assert [b - ab[u][0] for b in ab[u]] == [0, 3], ab[u]


def test_retry_after_block_survives_resume(spark, tmp_state):
    corpus = _corpus(spark, ra=3)
    ref_state = tempfile.mkdtemp(prefix="colly_ra_ref_")
    cfg = _cfg(True)
    try:
        ref = Crawler(spark, corpus, cfg, ref_state,
                      bloom_threshold_rows=0, compact_every=0) \
            .run(OK + BUSY)
        # kill inside the first block window, resume with a NEW crawler
        part = Crawler(spark, corpus, cfg, tmp_state,
                       bloom_threshold_rows=0, compact_every=0)
        part.run(OK + BUSY, max_batches=2)
        resumed = Crawler(spark, corpus, cfg, tmp_state,
                          bloom_threshold_rows=0, compact_every=0) \
            .run(resume=True)
        want = sorted((r["batch"], r["seq"], r["url"], r["status"])
                      for r in ref.trace().collect())
        got = sorted((r["batch"], r["seq"], r["url"], r["status"])
                     for r in resumed.trace().collect())
        assert got == want
    finally:
        shutil.rmtree(ref_state, ignore_errors=True)


def test_live_retry_after_header_parse():
    """RFC 9110 §10.2.3 forms on the live HTTP path: delta-seconds,
    HTTP-date (relative to now, clamped ≥0), absent, garbage."""
    import email.utils as eu
    import time

    from colly_spark.sources.live_http import _retry_after_of

    assert _retry_after_of({"Retry-After": "120"}) == 120
    assert _retry_after_of({"Retry-After": " 7 "}) == 7
    assert _retry_after_of({}) is None
    assert _retry_after_of({"Retry-After": "soon"}) is None
    future = eu.formatdate(time.time() + 300, usegmt=True)
    got = _retry_after_of({"Retry-After": future})
    assert 295 <= got <= 300
    past = eu.formatdate(time.time() - 3600, usegmt=True)
    assert _retry_after_of({"Retry-After": past}) == 0
