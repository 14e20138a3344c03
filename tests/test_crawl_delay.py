"""robots.txt Crawl-delay politeness (respect_crawl_delay — engine
extension; the reference's robotstxt library parses the directive,
temoto CrawlDelay, but colly never applies it).

Contract: the directive changes WHEN a host's URLs fetch, never WHAT —
fetched set / per-host order / errors equal a delay-off run; a host
advertising ``Crawl-delay: r`` fetches at most once per r seconds
(super-window delays → exact batch gaps via the hosthealth block,
sub-window delays → quota division), capped at crawl_delay_cap_s.
Default off = reference semantics (pinned by the full parity suite).
"""

from __future__ import annotations

import pytest

from colly_spark.config import CrawlConfig
from colly_spark.operators.robots import crawl_delay_of, parse_group_delays


class TestParserKATs:
    BODY = (
        "User-agent: colly-spark\n"
        "Disallow: /private\n"
        "Crawl-delay: 2.5\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 7\n"
        "Disallow: /tmp\n"
    )

    def test_group_selection_longest_prefix(self):
        assert crawl_delay_of(self.BODY, "colly-spark/1.0") == 2.5
        assert crawl_delay_of(self.BODY, "otherbot") == 7.0

    def test_matched_group_without_delay_does_not_fall_back(self):
        body = ("User-agent: colly-spark\nDisallow: /a\n\n"
                "User-agent: *\nCrawl-delay: 9\n")
        # temoto FindGroup semantics: the UA-specific group is
        # selected; its (absent) delay applies — no * fallback
        assert crawl_delay_of(body, "colly-spark/1.0") is None
        assert crawl_delay_of(body, "otherbot") == 9.0

    def test_preamble_belongs_to_star(self):
        assert crawl_delay_of("Crawl-delay: 4\nDisallow: /x\n", "any") == 4.0

    def test_malformed_and_negative_ignored(self):
        assert crawl_delay_of("User-agent: *\nCrawl-delay: soon\n", "a") is None
        assert crawl_delay_of("User-agent: *\nCrawl-delay: -3\n", "a") is None
        assert crawl_delay_of(None, "a") is None
        assert crawl_delay_of("", "a") is None

    def test_shared_agent_block(self):
        body = ("User-agent: alpha\nUser-agent: beta\nCrawl-delay: 1.5\n")
        assert parse_group_delays(body) == [(["alpha", "beta"], 1.5)]
        assert crawl_delay_of(body, "beta-crawler") == 1.5


def _delay_corpus(corpus_pd, host: str, delay_s: float):
    """Copy of the fixture corpus with a Crawl-delay directive
    PREPENDED to one host's robots body (preamble → the * group)."""
    c = {k: v.copy() for k, v in corpus_pd.items()}
    robots = c["robots"].copy()

    def patch(row):
        if row["host"] != host:
            return row["body"]
        return f"Crawl-delay: {delay_s}\n" + (row["body"] or "")

    robots["body"] = robots.apply(patch, axis=1)
    c["robots"] = robots
    return c


def _host_batches(eng_or_rows, host):
    if hasattr(eng_or_rows, "trace"):
        rows = eng_or_rows.trace().collect()
    else:
        rows = eng_or_rows
    return sorted({r["batch"] for r in rows if r["host"] == host})


@pytest.fixture(scope="module")
def delay_corpus_spark(spark, corpus_pd):
    from colly_spark.plans.util import to_spark_corpus

    return to_spark_corpus(spark, _delay_corpus(corpus_pd, "d00.test", 3))


SEEDS = ["http://d00.test/", "http://d02.test/"]


class TestEngineSpacing:
    def test_when_not_what_and_exact_gaps(self, spark, corpus_pd,
                                          delay_corpus_spark, tmp_state):
        """Crawl-delay 3 (s) at window 1000 ms: d00's fetching batches
        are spaced ≥3 apart; other hosts unaffected; the fetched SET
        and per-host URL order equal the delay-off run."""
        import os

        from colly_spark.plans.crawler import Crawler

        on_dir, off_dir = (os.path.join(tmp_state, d) for d in ("on", "off"))
        cfg_on = CrawlConfig(max_depth=2, ignore_robots=True,
                             respect_crawl_delay=True)
        cfg_off = CrawlConfig(max_depth=2, ignore_robots=True)
        eng_off = Crawler(spark, delay_corpus_spark, cfg_off, off_dir,
                          bloom_threshold_rows=0).run(list(SEEDS),
                                                      max_batches=60)
        rows_off = eng_off.trace().collect()
        # the faithful rate is ONE d00 URL per ceil(3000/1000)=3
        # batches — budget the ON run from the OFF run's actual size
        budget = 3 * len(rows_off) + 10
        eng_on = Crawler(spark, delay_corpus_spark, cfg_on, on_dir,
                         bloom_threshold_rows=0).run(list(SEEDS),
                                                     max_batches=budget)
        rows_on = eng_on.trace().collect()
        # WHAT is unchanged: same fetched multiset, same per-host order
        assert sorted((r["url"], r["status"]) for r in rows_on) == \
            sorted((r["url"], r["status"]) for r in rows_off)

        def order(rows, host):
            return [r["url"] for r in sorted(
                rows, key=lambda r: (r["batch"], r["seq"]))
                if r["host"] == host]

        for h in ("d00.test", "d01.test", "d02.test"):
            assert order(rows_on, h) == order(rows_off, h)
        # WHEN changed exactly: ceil(3000/1000) = 3-batch spacing on
        # d00, dense batches on the undelayed d02
        b_on = _host_batches(rows_on, "d00.test")
        assert len(b_on) > 1
        assert all(b2 - b1 >= 3 for b1, b2 in zip(b_on, b_on[1:]))
        b_off = _host_batches(rows_off, "d00.test")
        assert any(b2 - b1 == 1 for b1, b2 in zip(b_off, b_off[1:]))
        # hosts_blocked metric surfaced on the ON run
        assert any(m.get("hosts_blocked", 0) > 0 for m in eng_on.metrics)

    def test_sub_window_delay_divides_quota(self, spark, corpus_pd,
                                            tmp_state):
        """Crawl-delay 0.5 s at window 1000 ms → at most 2 d00 fetches
        per batch, no cross-batch gaps required."""
        from colly_spark.plans.crawler import Crawler
        from colly_spark.plans.util import to_spark_corpus

        corpus = to_spark_corpus(spark,
                                 _delay_corpus(corpus_pd, "d00.test", 0.5))
        cfg = CrawlConfig(max_depth=3, ignore_robots=True,
                          respect_crawl_delay=True)
        eng = Crawler(spark, corpus, cfg, tmp_state,
                      bloom_threshold_rows=0).run(list(SEEDS),
                                                  max_batches=60)
        from collections import Counter

        per_batch = Counter(r["batch"] for r in eng.trace().collect()
                            if r["host"] == "d00.test")
        assert per_batch and max(per_batch.values()) <= 2

    def test_cap_bounds_absurd_delay(self, spark, corpus_pd, tmp_state):
        """An advertised 10^6-second delay is capped to
        crawl_delay_cap_s, so the host still progresses."""
        from colly_spark.plans.crawler import Crawler
        from colly_spark.plans.util import to_spark_corpus

        corpus = to_spark_corpus(
            spark, _delay_corpus(corpus_pd, "d00.test", 1_000_000))
        cfg = CrawlConfig(max_depth=2, ignore_robots=True,
                          respect_crawl_delay=True, crawl_delay_cap_s=2)
        eng = Crawler(spark, corpus, cfg, tmp_state,
                      bloom_threshold_rows=0).run(["http://d00.test/"],
                                                  max_batches=80)
        b = _host_batches(eng, "d00.test")
        assert len(b) > 1  # progressed despite the absurd directive
        assert all(b2 - b1 >= 2 for b1, b2 in zip(b, b[1:]))
        assert all(b2 - b1 < 1000 for b1, b2 in zip(b, b[1:]))

    def test_resume_inside_gap_byte_identical(self, spark, corpus_pd,
                                              delay_corpus_spark,
                                              tmp_state):
        """Kill mid-gap (the batch after d00's first fetch); resume
        must reproduce the uninterrupted run's trace exactly —
        the block window survives through the hosthealth snapshot."""
        import os

        from colly_spark.plans.crawler import Crawler

        cfg = CrawlConfig(max_depth=2, ignore_robots=True,
                          respect_crawl_delay=True)
        full_dir, part_dir = (os.path.join(tmp_state, d)
                              for d in ("full", "part"))
        full = Crawler(spark, delay_corpus_spark, cfg, full_dir,
                       bloom_threshold_rows=0).run(list(SEEDS),
                                                   max_batches=60)
        first = _host_batches(full, "d00.test")[0]
        Crawler(spark, delay_corpus_spark, cfg, part_dir,
                bloom_threshold_rows=0).run(list(SEEDS),
                                            max_batches=first + 2)
        resumed = Crawler(spark, delay_corpus_spark, cfg, part_dir,
                          bloom_threshold_rows=0).run(
            list(SEEDS), max_batches=60, resume=True)

        def key(eng):
            return sorted((r["batch"], r["seq"], r["url"], r["status"])
                          for r in eng.trace().collect())

        assert key(resumed) == key(full)
