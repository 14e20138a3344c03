"""Stateful per-domain rate limiter (streaming/ratelimit.py).

Pins:
- window assignment == the closed form floor((rank-1)/quota)+1 when a
  host's backlog arrives in its first micro-batch (the SQL-oracle
  invariant used by the `stateful_rate_limit` driver query);
- parity with the batch driver-loop (admit_batch re-fed each window);
- first-match-wins LimitRule selection across hosts;
- state survives a query RESTART mid-backlog (resume from checkpoint
  continues the same per-host window counters).
"""

import pytest

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.operators.politeness import admit_batch
from colly_spark.streaming.ratelimit import (RateLimitedDrain,
                                             run_rate_limited_drain)

CFG = CrawlConfig(limit_rules=(
    LimitRule(domain_glob="a*", delay_ms=480, parallelism=1),   # quota 2
    LimitRule(domain_glob="*", delay_ms=180, parallelism=1),    # quota 5
))


def _pending(spark):
    rows = ([("a.test", f"http://a.test/{i}", i) for i in range(7)]
            + [("b.test", f"http://b.test/{i}", 100 + i) for i in range(12)]
            + [("ab.test", "http://ab.test/x", 500)])
    return spark.createDataFrame(rows, "host string, url string, seq long")


def test_quotas_first_match_wins():
    assert CFG.domain_quota("a.test") == 2      # a* rule
    assert CFG.domain_quota("ab.test") == 2     # a* matches before *
    assert CFG.domain_quota("b.test") == 5      # fallback *


def test_window_assignment_matches_closed_form(spark):
    out = run_rate_limited_drain(spark, _pending(spark), CFG).toPandas()
    assert len(out) == 20
    got = {(r.host, r.seq): r.window_id for r in out.itertuples()}
    for host, n, base, q in (("a.test", 7, 0, 2), ("b.test", 12, 100, 5),
                             ("ab.test", 1, 500, 2)):
        for rank in range(n):
            assert got[(host, base + rank)] == rank // q + 1, (host, rank)


def test_parity_with_batch_admit_loop(spark):
    """The driver-loop form: admit_batch, re-feed deferrals, tag each
    pass with its window index. The stateful operator must emit the
    identical (host, seq, window) set."""
    pending = _pending(spark)
    expected = set()
    window = 0
    while pending.count() > 0:
        window += 1
        fetch_now, pending = admit_batch(pending, CFG)
        for r in fetch_now.collect():
            expected.add((r.host, r.seq, window))
    out = run_rate_limited_drain(spark, _pending(spark), CFG)
    got = {(r.host, r.seq, r.window_id) for r in out.collect()}
    assert got == expected


def test_state_survives_restart(spark):
    """Stop the query mid-backlog, then start a NEW query on the same
    checkpoint + sink: the state store must resume the per-host window
    counters so the final window numbering is identical to an
    uninterrupted drain."""
    rows = [("c.test", f"http://c.test/{i}", i) for i in range(30)]
    pdf = spark.createDataFrame(rows, "host string, url string, seq long")
    cfg = CrawlConfig(limit_rules=(
        LimitRule(domain_glob="*", delay_ms=180, parallelism=1),))  # quota 5
    drain = RateLimitedDrain(spark, pdf, cfg)
    drain.start()
    # 30 rows / quota 5 = 6 windows; interrupt once ≥5 rows are out
    mid = drain.wait_drained(stop_at_emitted=5, poll_s=0.05)
    assert 5 <= mid < 30, "query should have been stopped mid-backlog"
    drain.start()  # resume from the same checkpoint
    assert drain.wait_drained() == 30
    out = drain.emitted().toPandas()
    assert len(out) == 30
    for r in out.itertuples():
        assert r.window_id == r.seq // 5 + 1


def test_drain_raises_when_stalled(spark):
    rows = [("d.test", f"http://d.test/{i}", i) for i in range(30)]
    pdf = spark.createDataFrame(rows, "host string, url string, seq long")
    cfg = CrawlConfig(limit_rules=(
        LimitRule(domain_glob="*", delay_ms=180, parallelism=1),))
    drain = RateLimitedDrain(spark, pdf, cfg)
    drain.start()
    with pytest.raises(RuntimeError, match="stalled"):
        drain.wait_drained(timeout_s=0.0)


def test_rate_limited_fetch_joins_corpus(spark):
    """Politeness + stream-static fetch join as one continuous query:
    every admitted row carries its corpus columns; window assignment
    unchanged by the join stage."""
    from colly_spark.streaming.ratelimit import run_rate_limited_fetch

    pending = _pending(spark)
    corpus = spark.createDataFrame(
        [(f"http://a.test/{i}", 200 + (i % 2)) for i in range(7)]
        + [(f"http://b.test/{i}", 404) for i in range(12)]
        + [("http://ab.test/x", 301)], "url string, status int")
    out = run_rate_limited_fetch(spark, pending, corpus, CFG).toPandas()
    assert len(out) == 20
    got = {r.url: (r.status, r.window_id) for r in out.itertuples()}
    assert got["http://a.test/3"] == (201, 2)   # quota 2: rank 4 → window 2
    assert got["http://b.test/11"] == (404, 3)  # quota 5: rank 12 → window 3
    assert got["http://ab.test/x"] == (301, 1)


def test_guarded_broadcast_refuses_huge_static_side(spark):
    """The stream-static side must fit in executor memory; past the
    cap the guard raises instead of silently broadcasting (the batch
    drain is the big-corpus path)."""
    import pytest

    from colly_spark.streaming.ratelimit import guarded_broadcast

    df = spark.range(10).withColumnRenamed("id", "url")
    assert guarded_broadcast(df, max_rows=10) is not None
    with pytest.raises(ValueError, match="refusing to broadcast"):
        guarded_broadcast(df, max_rows=9)
