"""Cookie jar API surface: SetCookies (pre-seeded jar entries),
DisableCookies (jar off, server enforcement unaffected), and the
Cookies(URL) accessor — colly.go:981-985, 1243-1268."""

from __future__ import annotations

import tempfile

from colly_spark.config import CrawlConfig
from colly_spark.plans.crawler import Crawler


def _status_of(h, url):
    rows = {r.url: r.status for r in h.trace().collect()}
    return rows.get(url)


def test_set_cookies_preseeds_jar(spark, corpus_spark):
    """A directly-seeded protected route succeeds when SetCookies
    seeded its session cookie, and 403s without it."""
    url = "http://d03.test/account"
    cfg_plain = CrawlConfig(max_depth=1, ignore_robots=True)
    h_plain = Crawler(spark, corpus_spark, cfg_plain,
                      tempfile.mkdtemp()).run([url])
    assert _status_of(h_plain, url) == 403

    cfg_seeded = CrawlConfig(
        max_depth=1, ignore_robots=True,
        initial_cookies=(("d03.test", "sid", "tok-d03.test"),))
    h_seeded = Crawler(spark, corpus_spark, cfg_seeded,
                       tempfile.mkdtemp()).run([url])
    assert _status_of(h_seeded, url) == 200
    assert h_seeded.cookies("d03.test") == {"sid": "tok-d03.test"}


def test_disable_cookies_keeps_server_enforcement(spark, corpus_spark):
    """DisableCookies turns off the client jar only: /login still
    responds 200 but its Set-Cookie is not kept, so /account 403s —
    and no cookie deltas are committed."""
    cfg_on = CrawlConfig(max_depth=2, ignore_robots=True)
    cfg_off = CrawlConfig(max_depth=2, ignore_robots=True,
                          disable_cookies=True)
    seeds = ["http://d01.test/login"]
    h_on = Crawler(spark, corpus_spark, cfg_on, tempfile.mkdtemp()).run(seeds)
    h_off = Crawler(spark, corpus_spark, cfg_off, tempfile.mkdtemp()).run(seeds)
    assert _status_of(h_on, "http://d01.test/login") == 200
    assert _status_of(h_on, "http://d01.test/account") == 200
    assert _status_of(h_off, "http://d01.test/login") == 200
    assert _status_of(h_off, "http://d01.test/account") == 403
    assert h_on.cookies("d01.test") == {"sid": "tok-d01.test"}
    assert h_off.cookies("d01.test") == {}


def test_cookies_accessor_by_url_and_unknown_host(spark, corpus_spark):
    cfg = CrawlConfig(max_depth=2, ignore_robots=True)
    h = Crawler(spark, corpus_spark, cfg, tempfile.mkdtemp()).run(
        ["http://d02.test/login"])
    assert h.cookies("http://d02.test/whatever") == {"sid": "tok-d02.test"}
    assert h.cookies("nowhere.test") == {}


def test_in_crawl_set_cookie_overrides_seeded(spark, corpus_spark):
    """A Set-Cookie committed by the crawl wins over a SetCookies seed
    for the same (host, name) — latest delta wins."""
    cfg = CrawlConfig(
        max_depth=2, ignore_robots=True,
        initial_cookies=(("d01.test", "sid", "stale-token"),))
    h = Crawler(spark, corpus_spark, cfg, tempfile.mkdtemp()).run(
        ["http://d01.test/login"])
    # /login's fresh token replaced the stale seed, so /account passed
    assert _status_of(h, "http://d01.test/account") == 200
    assert h.cookies("d01.test") == {"sid": "tok-d01.test"}
