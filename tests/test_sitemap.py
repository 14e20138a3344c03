"""Sitemaps-protocol discovery (sources/sitemap.py): parser KATs,
index recursion/cycle handling, the priority bridge into the crawler,
and the end-to-end seed composition."""

from __future__ import annotations

import gzip

import pytest

from colly_spark.sources.sitemap import (discover_sitemaps, parse_sitemap,
                                         sitemap_priority_df)

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://h.test/a</loc><lastmod>2025-03-01</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc>http://h.test/b</loc></url>"
    "<url><lastmod>2025-01-01</lastmod></url>"  # no loc → dropped
    "</urlset>")

INDEX = (
    '<?xml version="1.0"?>'
    "<sitemapindex>"
    "<sitemap><loc>http://h.test/s1.xml</loc>"
    "<lastmod>2025-02-02</lastmod></sitemap>"
    "<sitemap><loc>http://h.test/s2.xml.gz</loc></sitemap>"
    "</sitemapindex>")


class TestParser:
    def test_urlset_fields(self):
        got = parse_sitemap(URLSET.encode())
        assert got == [
            dict(kind="url", loc="http://h.test/a", lastmod="2025-03-01",
                 changefreq="daily", priority=0.8),
            dict(kind="url", loc="http://h.test/b", lastmod=None,
                 changefreq=None, priority=None),
        ]

    def test_index_kind(self):
        got = parse_sitemap(INDEX.encode())
        assert [e["kind"] for e in got] == ["sitemap", "sitemap"]
        assert got[0]["lastmod"] == "2025-02-02"

    def test_gzip_sniffed(self):
        got = parse_sitemap(gzip.compress(URLSET.encode()))
        assert len(got) == 2

    def test_namespace_prefix_tolerated(self):
        body = ("<urlset><sm:url><sm:loc>http://h.test/x</sm:loc>"
                "<sm:priority>0.3</sm:priority></sm:url></urlset>")
        got = parse_sitemap(body.encode())
        assert got == [dict(kind="url", loc="http://h.test/x", lastmod=None,
                            changefreq=None, priority=0.3)]

    def test_malformed_priority_is_null(self):
        body = ("<urlset><url><loc>http://h.test/y</loc>"
                "<priority>high</priority></url></urlset>")
        assert parse_sitemap(body.encode())[0]["priority"] is None


class TestDiscovery:
    def test_index_recursion_with_cycle(self, spark, corpus_pd,
                                        corpus_spark):
        """The fixture index references two rich children AND itself —
        discovery must expand both children exactly once and not loop.
        Leaf set = every domain page URL, split across the two
        children (second one gzipped + namespace-prefixed)."""
        roots = ["http://d00.test/sitemap_index.xml"]
        got = discover_sitemaps(spark, corpus_spark["pages"], roots)
        rows = got.collect()
        urls = sorted(r["url"] for r in rows)
        pages = sorted(
            u for u in corpus_pd["pages"]["url"]
            if u == "http://d00.test/" or u.startswith("http://d00.test/page/"))
        assert urls == pages
        srcs = {r["src_sitemap"] for r in rows}
        assert srcs == {"http://d00.test/sitemap_rich_1.xml",
                        "http://d00.test/sitemap_rich_2.xml.gz"}
        assert all(r["lastmod"] and r["changefreq"] is not None
                   and r["priority"] is not None for r in rows)

    def test_missing_root_yields_empty(self, spark, corpus_spark):
        got = discover_sitemaps(spark, corpus_spark["pages"],
                                ["http://nosuch.test/sitemap.xml"])
        assert got.count() == 0

    def test_priority_bridge_matches_crawler_hash(self, spark,
                                                  corpus_spark):
        """sitemap_priority_df keys on the SAME canonical request hash
        the crawler dedups on, so it can feed Crawler(priority_df=…)
        directly."""
        from colly_spark.functions.urlnorm import (canonicalize,
                                                   request_hash,
                                                   to_signed64)

        roots = ["http://d00.test/sitemap_index.xml"]
        entries = discover_sitemaps(spark, corpus_spark["pages"], roots)
        prio = {r["url_hash"]: r["priority"]
                for r in sitemap_priority_df(entries).collect()}
        for r in entries.collect():
            h = to_signed64(request_hash(canonicalize(r["url"])))
            assert prio[h] == pytest.approx(r["priority"])

    def test_roots_from_robots_directive(self, spark, corpus_pd,
                                         corpus_spark):
        """`Sitemap:` lines in robots.txt (RFC 9309 §2.3) surface as
        discovery roots; composing them with discover_sitemaps walks
        straight to the rich leaf entries."""
        from colly_spark.sources.sitemap import sitemap_roots_from_robots

        roots = sitemap_roots_from_robots(corpus_spark["robots"]).collect()
        got = {(r["host"], r["sitemap_url"]) for r in roots}
        # the fixture's default robots bodies carry the directive
        # (d%3==0 domains, minus the fetch-error host whose body is
        # NULL)
        expect = {(r["host"], f"http://{r['host']}/sitemap_index.xml")
                  for _i, r in corpus_pd["robots"].iterrows()
                  if r["body"] and "Sitemap:" in r["body"]}
        assert got == expect and got
        entries = discover_sitemaps(
            spark, corpus_spark["pages"],
            sorted(u for _h, u in got))
        assert entries.count() > 0

    def test_end_to_end_sitemap_seeded_crawl(self, spark, corpus_pd,
                                             corpus_spark, tmp_state):
        """Discovery output drives a real crawl: the discovered URLs
        submit as seeds with the publisher priorities as priority_df;
        the fetched set covers exactly the discovered URLs (plus
        nothing from other domains — depth 0)."""
        from colly_spark.config import CrawlConfig
        from colly_spark.plans.crawler import Crawler

        roots = ["http://d00.test/sitemap_index.xml"]
        entries = discover_sitemaps(spark, corpus_spark["pages"], roots)
        urls = sorted(r["url"] for r in entries.collect())
        prio = sitemap_priority_df(entries)
        # max_depth=1 admits only the depth-0 seeds (reference
        # MaxDepth semantics; 0 = unlimited)
        cfg = CrawlConfig(max_depth=1, ignore_robots=True)
        eng = Crawler(spark, corpus_spark, cfg, tmp_state,
                      bloom_threshold_rows=0,
                      priority_df=prio).run(urls, max_batches=30)
        fetched = sorted(r["url"] for r in eng.trace().collect())
        assert fetched == urls
