"""Sitemaps-protocol discovery (sitemaps.org XML schema) — seed +
priority source for the crawler.

The reference has no sitemap support; its OnXML callback family
(colly.go:1123-1182, the shopify_sitemap example) leaves walking the
protocol to the caller. At 10^10-frontier scale sitemaps ARE the seed
list — publishers enumerate their URL space (with ``<lastmod>`` /
``<priority>`` hints) far more completely than link-graph discovery
reaches — so this module makes the protocol first-class:

- :func:`parse_sitemap`: one document → typed entries, handling both
  ``<urlset>`` (leaf URLs + lastmod/changefreq/priority) and
  ``<sitemapindex>`` (child sitemaps), gzip-sniffed (.xml.gz members
  are normal on real sites), namespace-tolerant, built on the same
  from-scratch DOM engine as OnXML (operators/dom.parse_dom).
- :func:`discover_sitemaps`: level-synchronous distributed expansion —
  each round joins the current sitemap-URL set against the page
  source (the corpus-join contract; a live deployment swaps in the
  HTTP fetch stage), parses every body in one Arrow pass, splits leaf
  entries from index children, and recurses on the children. Index
  cardinality ≈ host count, so the per-round driver traffic is tiny
  while the LEAF entry set stays fully distributed.
- :func:`sitemap_priority_df`: the bridge into the engine's
  opt-in frontier prioritization — ``<priority>`` becomes
  ``Crawler(priority_df=(url_hash, priority))`` so each domain's
  politeness quota admits its publisher-ranked URLs first; lastmod
  feeds the freshness recrawl estimator the same way.

Scale shape: one equi-join + one mapInPandas per level; no driver
traffic proportional to LEAF URLs, only to index nodes. Skew follows
the host distribution of the sitemap set, which is uniform by
construction (one or a few sitemaps per host).
"""

from __future__ import annotations

import gzip

import pandas as pd

_SM_TAGS = ("url", "sitemap")
_FIELD_TAGS = ("loc", "lastmod", "changefreq", "priority")


def parse_sitemap(data: bytes) -> list[dict]:
    """Parse one sitemap document (raw bytes, gzip-sniffed) into entry
    dicts: ``{"kind": "url"|"sitemap", "loc", "lastmod", "changefreq",
    "priority"}``. ``<urlset>`` members have kind="url";
    ``<sitemapindex>`` members kind="sitemap". Namespace prefixes on
    tags are tolerated (matching is on the local name); entries
    without a ``<loc>`` are dropped per the protocol."""
    from colly_spark.operators.dom import parse_dom

    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = parse_dom(data.decode("utf-8", "replace"))
    out = []
    for node in root.iter_elements():
        local = node.tag.rsplit(":", 1)[-1]
        if local not in _SM_TAGS:
            continue
        fields = {}
        for child in node.element_children():
            ctag = child.tag.rsplit(":", 1)[-1]
            if ctag in _FIELD_TAGS:
                fields[ctag] = child.text().strip()
        loc = fields.get("loc")
        if not loc:
            continue
        prio = None
        if fields.get("priority"):
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        out.append(dict(kind=local, loc=loc,
                        lastmod=fields.get("lastmod") or None,
                        changefreq=fields.get("changefreq") or None,
                        priority=prio))
    return out


def _parse_level(joined, src_col="_sm_url"):
    """(src, body) rows → exploded entry rows via one Arrow pass."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("src_sitemap", StringType()),
        StructField("kind", StringType()),
        StructField("url", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
    ])

    def _parse(iterator):
        for pdf in iterator:
            rows = []
            for src, body in zip(pdf[src_col], pdf["body"]):
                if body is None:
                    continue
                try:
                    entries = parse_sitemap(bytes(body))
                except Exception:
                    continue  # malformed sitemap → poison-row tolerance
                for e in entries:
                    rows.append(dict(src_sitemap=src, kind=e["kind"],
                                     url=e["loc"], lastmod=e["lastmod"],
                                     changefreq=e["changefreq"],
                                     priority=e["priority"]))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return joined.mapInPandas(_parse, schema=schema)


def discover_sitemaps(spark, pages_df, roots, max_rounds: int = 4):
    """Expand sitemap roots through ``<sitemapindex>`` recursion.

    ``pages_df``: the page source (url, body, ...) — the corpus-join
    contract; ``roots``: starting sitemap URLs (typically
    ``http://host/sitemap.xml`` per host, or the ``Sitemap:`` lines a
    robots.txt advertises). Returns a DataFrame of LEAF entries
    (url, lastmod, changefreq, priority, src_sitemap), distributed
    end to end; only index-node URLs (≈ host count) ever reach the
    driver. Cycles and duplicate index references are visited once."""
    from pyspark.sql import functions as F

    seen = set(roots)
    cur = list(roots)
    leaf_parts = []
    for _round in range(max_rounds):
        if not cur:
            break
        cur_df = spark.createDataFrame([(u,) for u in cur],
                                       "_sm_url string")
        joined = cur_df.join(
            pages_df.select(F.col("url").alias("_purl"), "body"),
            cur_df["_sm_url"] == F.col("_purl"), "left").select(
                "_sm_url", "body")
        entries = _parse_level(joined).localCheckpoint(eager=True)
        leaf_parts.append(entries.filter(F.col("kind") == "url")
                          .drop("kind"))
        children = [r["url"] for r in
                    entries.filter(F.col("kind") == "sitemap")
                    .select("url").collect()]
        cur = [u for u in children if u not in seen]
        seen.update(cur)
    if not leaf_parts:
        from pyspark.sql.types import (DoubleType, StringType, StructField,
                                       StructType)
        return spark.createDataFrame([], StructType([
            StructField("src_sitemap", StringType()),
            StructField("url", StringType()),
            StructField("lastmod", StringType()),
            StructField("changefreq", StringType()),
            StructField("priority", DoubleType()),
        ]))
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), leaf_parts)


def sitemap_roots_from_robots(robots_df):
    """``Sitemap:`` directive discovery (RFC 9309 §2.3 /
    sitemaps.org): the lines are group-independent absolute URLs, so
    extraction is one case-insensitive regexp over the robots store —
    pure Catalyst (regexp_extract_all + explode), host-cardinality.
    Returns distinct (host, sitemap_url) rows; feed the urls as
    ``discover_sitemaps`` roots."""
    from pyspark.sql import functions as F

    pat = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"
    return (robots_df
            .filter(F.col("body").isNotNull())
            .select("host",
                    F.explode(F.regexp_extract_all(
                        F.col("body"), F.lit(pat), F.lit(1)))
                    .alias("sitemap_url"))
            .distinct())


def sitemap_priority_df(entries_df):
    """Bridge into the engine's opt-in frontier prioritization:
    (url_hash, priority) rows for every entry that advertises a
    ``<priority>``, keyed by the SAME canonical request hash the
    crawler dedups on (WHATWG canonicalize → FNV-64a). Feed as
    ``Crawler(priority_df=...)``; duplicate URLs keep their max
    priority (a URL listed by two sitemaps)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _hash(urls: pd.Series) -> pd.Series:
        from colly_spark.functions.urlnorm import (canonicalize,
                                                   request_hash,
                                                   to_signed64)
        return urls.map(
            lambda u: to_signed64(request_hash(canonicalize(u))))

    return (entries_df
            .filter(F.col("priority").isNotNull())
            .select(_hash(F.col("url")).alias("url_hash"),
                    F.col("priority"))
            .groupBy("url_hash")
            .agg(F.max("priority").alias("priority")))
