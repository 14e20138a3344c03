"""Continuous crawl WITH link feedback (streaming/feedback.py).

The two-query loop must converge to the parse-gated reachability
closure of the seeds over the corpus link graph — independent of
micro-batch timing — with every URL fetched exactly once (the
check-and-mark seen gate) and per-host emission bounded by the
politeness quota in every window.
"""

import pytest

from colly_spark.config import CrawlConfig, LimitRule


def _url(host, page):
    return f"http://{host}/{page}"


@pytest.fixture(scope="module")
def graph_corpus(spark):
    """8-page graph with a cycle, a 404 branch, and a cross-host edge.

    a/0 -> a/1, a/2        a/1 -> a/3, a/0 (cycle back)
    a/2 -> 404 (links to a/5 must NOT be followed)
    a/3 -> b/0             b/0 -> b/1
    a/5, b/1 -> leaves     a/9 unreachable
    """
    rows = [
        (_url("a.test", "0"), 200, [_url("a.test", "1"), _url("a.test", "2")]),
        (_url("a.test", "1"), 200, [_url("a.test", "3"), _url("a.test", "0")]),
        (_url("a.test", "2"), 404, [_url("a.test", "5")]),
        (_url("a.test", "3"), 200, [_url("b.test", "0")]),
        (_url("a.test", "5"), 200, []),
        (_url("a.test", "9"), 200, [_url("a.test", "0")]),
        (_url("b.test", "0"), 200, [_url("b.test", "1")]),
        (_url("b.test", "1"), 200, []),
    ]
    return spark.createDataFrame(
        rows, "url string, status int, links array<string>")


def _closure(rows, seeds):
    """Driver-side oracle: BFS over parse-gated links."""
    by_url = {u: (s, ls) for u, s, ls in rows}
    seen, todo = set(), list(seeds)
    while todo:
        u = todo.pop()
        if u in seen:
            continue
        seen.add(u)
        status, links = by_url.get(u, (None, []))
        if status == 200:
            todo.extend(links)
    return seen


def test_feedback_closure(spark, graph_corpus):
    from colly_spark.streaming.feedback import run_continuous_crawl

    rows = [(r.url, r.status, list(r.links)) for r in graph_corpus.collect()]
    seeds = [_url("a.test", "0")]
    cfg = CrawlConfig(limit_rules=(
        LimitRule(domain_glob="*", delay_ms=20, parallelism=1),))
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "url string")
    fetched = run_continuous_crawl(
        spark, seeds_df, graph_corpus, cfg, timeout_s=240.0).collect()

    got = sorted(r.url for r in fetched)
    assert got == sorted(got), "sanity"
    # exactly-once: no URL fetched twice despite the a/1 -> a/0 cycle
    assert len(got) == len(set(got))
    # the final set is the parse-gated closure: a/9 unreachable,
    # a/5 behind the 404 page so never fetched, b/* reached via a/3
    assert set(got) == _closure(rows, seeds)
    assert _url("a.test", "5") not in set(got)
    assert _url("a.test", "9") not in set(got)
    # statuses rode the corpus join
    st = {r.url: r.status for r in fetched}
    assert st[_url("a.test", "2")] == 404
    assert st[_url("b.test", "1")] == 200
    # hosts were extracted for the politeness key
    assert {r.host for r in fetched} == {"a.test", "b.test"}


def test_feedback_quota_bound(spark):
    """With quota q per host, no (host, window_id) group may exceed q
    rows — the politeness budget holds in EVERY micro-batch even while
    the seen-gate is absorbing a flood of duplicate arrivals."""
    from colly_spark.streaming.feedback import run_continuous_crawl

    # star: hub links to 12 leaves on one host, every leaf links back
    hub = _url("h.test", "hub")
    leaves = [_url("h.test", f"leaf{i}") for i in range(12)]
    rows = [(hub, 200, leaves)] + [(u, 200, [hub]) for u in leaves]
    corpus = spark.createDataFrame(
        rows, "url string, status int, links array<string>")
    cfg = CrawlConfig(limit_rules=(
        # quota(window,service): small enough to force multiple windows
        LimitRule(domain_glob="*", delay_ms=100, parallelism=1),))
    q = cfg.domain_quota("h.test")
    assert q < 13, "fixture must force deferral"
    seeds_df = spark.createDataFrame([(hub,)], "url string")
    fetched = run_continuous_crawl(
        spark, seeds_df, corpus, cfg, timeout_s=240.0).collect()

    assert sorted(r.url for r in fetched) == sorted([hub] + leaves)
    by_window = {}
    for r in fetched:
        by_window.setdefault((r.host, r.window_id), 0)
        by_window[(r.host, r.window_id)] += 1
    assert all(n <= q for n in by_window.values()), by_window
    # deferral actually happened: more than one window was needed
    assert len(by_window) >= 2


def test_continuous_crawl_corpus_guard(spark, tmp_path):
    """ContinuousCrawl refuses a corpus past max_broadcast_rows at
    construction — before any streaming query starts."""
    import pytest
    from pyspark.sql import functions as F

    from colly_spark.config import CrawlConfig
    from colly_spark.streaming.feedback import ContinuousCrawl

    corpus = spark.range(50).select(
        F.concat(F.lit("http://h.test/"), F.col("id")).alias("url"),
        F.lit(200).alias("status"),
        F.array().cast("array<string>").alias("links"))
    seeds = corpus.select("url").limit(1)
    with pytest.raises(ValueError, match="refusing to broadcast"):
        ContinuousCrawl(spark, seeds, corpus, CrawlConfig(),
                        workdir=str(tmp_path), max_broadcast_rows=10)
