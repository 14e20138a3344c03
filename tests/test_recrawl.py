"""Freshness-driven revisit scheduling
(operators/politeness.recrawl_schedule, Cho & Garcia-Molina 2003):
hand-computed estimator KATs; the oracle gate is
test_entry_oracle[recrawl_schedule]."""

import math

from colly_spark.operators.politeness import recrawl_schedule


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url_hash long, changed boolean")
    return {r.url_hash: r.asDict()
            for r in recrawl_schedule(df).collect()}


def test_estimator_kats(spark):
    # page 1: 4 obs, 2 changes -> lam = -ln(2.5/4.5)
    # page 2: 3 obs, 0 changes -> lam = -ln(3.5/3.5) = 0, interval NULL
    # page 3: 2 obs, 2 changes -> lam = -ln(0.5/2.5) (finite at X=n)
    rows = ([(1, True), (1, False), (1, True), (1, False)]
            + [(2, False)] * 3
            + [(3, True), (3, True)])
    got = _run(spark, rows)
    assert got[1]["n_obs"] == 4 and got[1]["n_changed"] == 2
    lam1 = round(-math.log(2.5 / 4.5), 9)
    assert got[1]["lambda_hat"] == lam1
    assert got[1]["revisit_interval"] == round(1.0 / lam1, 6)
    assert got[2]["lambda_hat"] == 0.0
    assert got[2]["revisit_interval"] is None
    lam3 = round(-math.log(0.5 / 2.5), 9)
    assert got[3]["lambda_hat"] == lam3


def test_faster_changing_pages_revisit_sooner(spark):
    rows = ([(1, True)] * 5 + [(1, False)]          # hot: 5/6
            + [(2, True)] + [(2, False)] * 5)       # cold: 1/6
    got = _run(spark, rows)
    assert got[1]["revisit_interval"] < got[2]["revisit_interval"]


def test_freshness_recrawl_campaign_end_to_end(spark, corpus_spark, tmp_state):
    """The full freshness loop over the real engine: crawl → observe
    change histories → recrawl_schedule picks the hot pages →
    forget_visited re-admits exactly those → submit → drain refetches
    exactly the due set under normal dedup, and the seen-set returns to
    its pre-forget state (hot pages re-marked)."""
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler
    from tests.test_cuckoo_seen import _url_hash

    cr = Crawler(spark, corpus_spark, CrawlConfig(max_depth=3,
                                                  ignore_robots=True),
                 tmp_state, bloom_threshold_rows=0, seen_filter="cuckoo")
    h1 = cr.run(["http://d00.test/", "http://d01.test/"])
    seen1 = {r["url_hash"] for r in h1.visited().collect()}
    urls = sorted(r["url"] for r in h1.trace().collect()
                  if r["url"] == r["final_url"])
    hot, cold = urls[:3], urls[3:]
    # synthetic change histories: hot pages changed on 4/5 revisits,
    # cold pages never (the estimator's job is WHICH, not WHETHER)
    rows = [(_url_hash(u), bool(i < 4)) for u in hot for i in range(5)]
    rows += [(_url_hash(u), False) for u in cold for _ in range(5)]
    hist = spark.createDataFrame(rows, "url_hash long, changed boolean")
    sched = recrawl_schedule(hist)
    due = sched.filter("revisit_interval IS NOT NULL AND "
                       "revisit_interval <= 2.0")
    due_hashes = [r["url_hash"] for r in due.collect()]
    assert sorted(due_hashes) == sorted(_url_hash(u) for u in hot)
    assert cr.forget_visited(due_hashes) == len(hot)
    cr.submit(hot)
    while cr.step():
        pass
    h2 = cr.handles()
    from collections import Counter
    counts = Counter(r["url"] for r in h2.trace().collect())
    for u in hot:
        assert counts[u] == 2
    for u in cold:
        assert counts[u] == 1
    assert {r["url_hash"] for r in h2.visited().collect()} == seen1
