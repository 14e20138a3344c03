"""Opt-in frontier priority scheduling (Crawler(priority_df=...) +
politeness.with_fetch_now_flag(priority_col=...)).

Pins:
- with a priority table, each domain's quota admits the HIGHEST
  scores first (FIFO tie-break for equal/absent scores);
- unscored URLs (NULL priority) sort after scored ones;
- without a priority table the admission is the exact FIFO the parity
  suite pins (same fetch set as the priority run with uniform scores).
"""

import shutil
import tempfile

import pytest

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.functions.urlnorm import canonicalize, fnv64a_bytes, to_signed64
from colly_spark.plans.bench_corpus import bench_corpus
from colly_spark.plans.crawler import Crawler

SEEDS = [f"http://d0.bench/p/{i}" for i in range(8)]
# quota: parallelism=1, delay 480 ms → 1000/(20+480) = 2 per window
CFG = CrawlConfig(
    max_depth=3, ignore_robots=True,
    limit_rules=(LimitRule(domain_glob="*", delay_ms=480, parallelism=1),))


def _hash(url: str) -> int:
    return to_signed64(fnv64a_bytes((canonicalize(url) or url).encode()))


def _batch1(spark, priority_rows):
    corpus = bench_corpus(spark, 64, n_domains=1)
    pri = (spark.createDataFrame(priority_rows, "url_hash long, priority double")
           if priority_rows is not None else None)
    state = tempfile.mkdtemp(prefix="colly_prio_")
    try:
        handles = Crawler(spark, corpus, CFG, state,
                          priority_df=pri).run(SEEDS, max_batches=1)
        return [r.url for r in handles.trace()
                .filter("batch = 0").orderBy("seq").collect()]
    finally:
        shutil.rmtree(state, ignore_errors=True)
        corpus["pages"].unpersist()


@pytest.fixture(scope="module")
def fifo_batch1(spark):
    return _batch1(spark, None)


def test_fifo_default(fifo_batch1):
    assert fifo_batch1 == SEEDS[:2]


def test_priority_reorders_quota(spark, fifo_batch1):
    # score the LAST two seeds highest → they take the 2-slot quota
    rows = [(_hash(SEEDS[7]), 10.0), (_hash(SEEDS[6]), 9.0)]
    got = _batch1(spark, rows)
    assert set(got) == {SEEDS[6], SEEDS[7]}
    # FIFO order is preserved WITHIN the admitted batch (seq order)
    assert got == [SEEDS[6], SEEDS[7]]


def test_null_priority_sorts_last_with_fifo_tiebreak(spark, fifo_batch1):
    # only one URL scored: it wins slot 1; slot 2 = first unscored FIFO
    got = _batch1(spark, [(_hash(SEEDS[5]), 1.0)])
    assert got == [SEEDS[0], SEEDS[5]]


def test_uniform_priority_equals_fifo(spark, fifo_batch1):
    got = _batch1(spark, [(_hash(u), 1.0) for u in SEEDS])
    assert got == fifo_batch1


def test_pagerank_priority_crawl_end_to_end(spark):
    """The OPIC loop: crawl once FIFO, PageRank the observed link
    graph (trace referer→url edges), re-crawl with the scores as
    priority_df. Pins: (a) the fetched SET is unchanged — priority
    only reschedules within the politeness budget; (b) high-rank pages
    are fetched no later on average, with at least one strictly
    earlier."""
    from pyspark.sql import functions as F

    from colly_spark.functions.udfs import fnv64a_udf
    from colly_spark.operators.graph import pagerank

    def crawl(priority_df):
        corpus = bench_corpus(spark, 200, n_domains=2)
        state = tempfile.mkdtemp(prefix="colly_prio_e2e_")
        try:
            h = Crawler(spark, corpus, CFG, state,
                        priority_df=priority_df).run(
                ["http://d0.bench/p/0", "http://d1.bench/p/1"],
                max_batches=10)
            return h.trace().select("batch", "url").toPandas()
        finally:
            shutil.rmtree(state, ignore_errors=True)
            corpus["pages"].unpersist()

    t1 = crawl(None)
    edges = spark.createDataFrame(t1, "batch long, url string")
    # the observed graph: every fetched page links its children; use
    # the trace itself as node set and its fetch order as edges via
    # referer is not carried here, so rank the HUB pattern instead:
    # re-derive edges from the deterministic corpus arithmetic
    ids = edges.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("i"))
    e = (ids.select(F.col("i").alias("src"), (F.col("i") * 2 + 1).alias("dst"))
         .union(ids.select(F.col("i"), F.col("i") * 2 + 2))
         .union(ids.select(F.col("i"), F.pmod(F.col("i"), F.lit(1000))))
         .filter(F.col("dst") < 200))
    pr = pagerank(e, n_iter=4)
    urls = pr.select(
        F.concat(F.lit("http://d"), F.pmod("node", F.lit(2)).cast("string"),
                 F.lit(".bench/p/"), F.col("node").cast("string")).alias("u"),
        F.col("pr").alias("priority"))
    priority = urls.select(fnv64a_udf(F.col("u")).alias("url_hash"),
                           "priority")
    t2 = crawl(priority)

    assert set(t1.url) == set(t2.url)          # same politeness closure
    b1 = dict(zip(t1.url, t1.batch))
    b2 = dict(zip(t2.url, t2.batch))
    scored = {r.u: r.priority for r in urls.collect()}
    top = sorted((u for u in b1 if u in scored),
                 key=lambda u: -scored[u])[:10]
    mean1 = sum(b1[u] for u in top) / len(top)
    mean2 = sum(b2[u] for u in top) / len(top)
    assert mean2 <= mean1
    assert any(b2[u] < b1[u] for u in top)


def test_domain_priority_feeds_crawler_schema(spark):
    """domain_priority emits exactly the (url_hash, priority) relation
    Crawler(priority_df=...) consumes (plus the domain label)."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["domain_priority"](spark, "/root/testdata/sf0.001")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields["url_hash"] == "bigint"
    assert fields["priority"] == "double"
    rows = df.limit(50).collect()
    assert rows and all(r.priority > 0 for r in rows)
