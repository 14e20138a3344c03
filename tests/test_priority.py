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
