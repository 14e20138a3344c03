"""The v3 logger-event view (logger.go:27-32, collector.go:102-412):
``CrawlHandles.events()`` derives the LoggerEvent stream declaratively
from the committed sinks, so its rows must be a pure function of
trace/images/errors — these tests pin the per-site multiplicities,
levels, value maps, per-request emission order, and as-of snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def crawl(spark, corpus_spark, tmp_path_factory):
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler

    state = str(tmp_path_factory.mktemp("ev_state"))
    # the /404 seed puts a ≥300 status in trace (WARN response_hdr,
    # http_404 error event) alongside the ordinary 200 crawl
    return Crawler(spark, corpus_spark,
                   CrawlConfig(max_depth=3, ignore_robots=True),
                   state).run(["http://d00.test/", "http://d01.test/",
                               "http://d00.test/404"])


@pytest.fixture(scope="module")
def ev(crawl):
    rows = crawl.events().collect()
    assert rows
    return rows


def _count(rows, typ):
    return sum(1 for r in rows if r.event_type == typ)


def test_site_multiplicities(crawl, ev):
    """request + response_hdr once per trace row (collector.go:102,143);
    response/scraped once per error-gate-passing row (colly.go:685-710);
    html once per images row; error once per errors row."""
    n_trace = crawl.trace().count()
    n_ok = crawl.trace().filter(F.col("status") < 203).count()
    assert _count(ev, "request") == n_trace
    assert _count(ev, "response_hdr") == n_trace
    assert _count(ev, "response") == n_ok
    assert _count(ev, "scraped") == n_ok
    assert _count(ev, "html") == crawl.images().count()
    assert _count(ev, "error") == crawl.errors().count()
    # the fixture crawl exercises both branches
    assert n_ok < n_trace and _count(ev, "error") > 0


def test_levels_and_values(crawl, ev):
    from colly_spark.plans.crawler import CrawlHandles

    n_redirectish = crawl.trace().filter(F.col("status") >= 300).count()
    hdr_warn = [r for r in ev
                if r.event_type == "response_hdr" and r.level == CrawlHandles.LOG_WARN]
    assert len(hdr_warn) == n_redirectish
    for r in ev:
        if r.event_type == "error":
            assert r.level == CrawlHandles.LOG_WARN
            assert set(r["values"]) == {"url", "kind"}
        elif r.event_type == "response_hdr":
            assert set(r["values"]) == {"url", "status_code"}
            assert r["values"]["url"] == r.url
        elif r.event_type == "html":
            assert r["values"]["selector"] == "img[src]"
        else:
            assert r["values"]["url"] == r.url


def test_min_level_filter(crawl):
    from colly_spark.plans.crawler import CrawlHandles

    warn = crawl.events(min_level=CrawlHandles.LOG_WARN).collect()
    assert warn and all(r.level >= CrawlHandles.LOG_WARN for r in warn)
    assert {r.event_type for r in warn} <= {"response_hdr", "error"}


def test_per_request_order(ev):
    """Within one (batch, seq) the site order is the fetch pipeline's:
    request < response_hdr < response < error < scraped."""
    site = {"request": 0, "response_hdr": 1, "response": 2,
            "error": 4, "scraped": 5}
    per_req: dict = {}
    for r in ev:
        if r.seq is None:  # html events carry no request id here
            continue
        per_req.setdefault((r.batch, r.seq), []).append(site[r.event_type])
    assert per_req
    for ords in per_req.values():
        assert ords == sorted(ords)
        # fetched requests start with their request event; error-only
        # seqs are pre-request denials (requestCheck at colly.go:624
        # rejects before fetch() ever calls handleOnRequest)
        assert ords[0] == 0 or set(ords) == {4}


def test_as_of_snapshot(crawl):
    b = crawl.snapshots()[1]
    full = crawl.events().filter(F.col("batch") <= b)
    asof = crawl.events(as_of=b)
    key = lambda r: repr((r.batch, r.seq, r.event_type, r.url))  # noqa: E731
    assert sorted(map(key, asof.collect())) == sorted(map(key, full.collect()))
