"""Spark-native synthetic crawl corpus for the drain benchmark.

The BASELINE metric is frontier drain throughput (URLs fetched +
deduped per second) on a large synthetic frontier. This generator
builds the whole corpus *inside Spark* (spark.range + string exprs —
no driver-side pandas, scales to any N):

- ``n_pages`` HTML pages across ``n_domains`` domains
  (``http://d{k}.bench/p/{id}``), Zipf-free round-robin assignment
  plus a deliberate hot link target (every page links to its domain's
  hub page ``/p/{id % hub_every}``) so dedup + skew paths do real work;
- each page links to its two binary-tree children (2i+1, 2i+2 < N) —
  a seed set of the first ``n_seeds`` ids yields a crawl of roughly
  n_seeds · (2^depth − 1) admission attempts with heavy overlap.

The page bodies are real HTML parsed by the real extraction UDF — the
bench exercises the full pipeline: canonicalize → filters → FNV hash →
window claim → Bloom probe → exact anti-join → quota → fetch join →
parse/extract → dense seq assignment.
"""

from __future__ import annotations


def bench_pages(spark, n_pages: int, n_domains: int = 256, hub_every: int = 1000,
                heavy: bool = False):
    """Corpus pages DataFrame (fixture schema) generated distributed.

    ``heavy=True`` produces realistic ~2 KiB pages: filler prose, extra
    duplicate cross-links (×8, deterministic id arithmetic) and
    tab-polluted hrefs — so the per-URL parse/canonicalize work matches
    a real crawl instead of a 100-byte stub. Use for throughput/scaling
    measurements; the light variant keeps unit runs fast."""
    from pyspark.sql import functions as F

    base = spark.range(n_pages).select(F.col("id"))
    dom = F.concat(F.lit("d"), F.pmod(F.col("id"), F.lit(n_domains)).cast("string"),
                   F.lit(".bench"))
    url = F.concat(F.lit("http://"), dom, F.lit("/p/"), F.col("id").cast("string"))

    def abs_link(expr, label):
        # links are absolute URLs at the *target's* own domain (pages
        # live at http://d{id % n_domains}.bench/p/{id})
        return F.when(expr < n_pages, F.concat(
            F.lit('<a href="http://d'),
            F.pmod(expr, F.lit(n_domains)).cast("string"),
            F.lit(".bench/p/"), expr.cast("string"),
            F.lit(f'">{label}</a>'))).otherwise(F.lit(""))

    def child_link(expr):
        return abs_link(expr, "c")

    hub = abs_link(F.pmod(F.col("id"), F.lit(hub_every)), "hub")
    parts = [
        F.lit("<html><body>"),
        child_link(F.col("id") * 2 + 1),
        child_link(F.col("id") * 2 + 2),
        hub,
    ]
    if heavy:
        # eight extra links that are all duplicates of already-linked
        # pages (heavy dedup load) + ~2 KiB of prose the parser must
        # scan; one href carries a tab (WHATWG strip path)
        for mult in (3, 5, 7, 11, 13, 17, 19, 23):
            parts.append(abs_link(F.pmod(F.col("id") * mult, F.lit(n_pages)), "x"))
        filler = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
                  "eiusmod tempor incididunt ut labore et dolore magna aliqua ")
        parts.append(F.lit("<p>" + filler * 16 + "</p>"))
        parts.append(F.concat(
            F.lit('<a href="/p/\t'),
            F.pmod(F.col("id"), F.lit(hub_every)).cast("string"),
            F.lit('">tabbed</a>')))
    parts.append(F.lit("</body></html>"))
    body = F.concat(*parts)
    return base.select(
        url.alias("url"),
        F.lit(200).cast("int").alias("status"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        body.cast("binary").alias("body"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(None).cast("string").alias("image_id"),
        F.array().cast("array<string>").alias("links"),
        F.lit(0).cast("int").alias("depth_from_seed"),
    )


def bench_corpus(spark, n_pages: int, n_domains: int = 256, hub_every: int = 1000,
                 heavy: bool = False):
    """Full corpus dict for plans.crawler.Crawler: generated pages, an
    empty robots table (allow-all), empty images."""
    from pyspark.sql.types import (BinaryType, BooleanType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    robots = spark.createDataFrame([], StructType([
        StructField("host", StringType()),
        StructField("body", StringType()),
        StructField("fetch_error", BooleanType()),
    ]))
    images = spark.createDataFrame([], StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]))
    return dict(pages=bench_pages(spark, n_pages, n_domains, hub_every, heavy),
                robots=robots, images=images)


def bench_seeds(n_seeds: int, n_domains: int = 256) -> list:
    return [f"http://d{i % n_domains}.bench/p/{i}" for i in range(n_seeds)]
