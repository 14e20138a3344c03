"""Time-travel (as-of) reads over the crawl state — the Iceberg
snapshot-log analogue of the append-only batch_N delta layout: the
crawl as of batch b is the union of deltas with N ≤ b, and must equal
both (a) the final sinks filtered to batch ≤ b and (b) what an
interrupted run (max_batches=b+1) had committed at that point."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def crawl(spark, corpus_spark, tmp_path_factory):
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler

    state = str(tmp_path_factory.mktemp("tt_state"))
    h = Crawler(spark, corpus_spark, CrawlConfig(max_depth=3, ignore_robots=True),
                state).run(["http://d00.test/", "http://d01.test/"])
    return h


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_snapshots_listed(crawl):
    snaps = crawl.snapshots()
    assert snaps and snaps == sorted(snaps)
    assert len(snaps) >= 3  # depth-3 crawl drains over several batches


def test_as_of_equals_filtered_final(crawl):
    b = crawl.snapshots()[1]
    assert _rows(crawl.trace(as_of=b)) == _rows(
        crawl.trace().filter(F.col("batch") <= b))
    assert _rows(crawl.errors(as_of=b)) == _rows(
        crawl.errors().filter(F.col("batch") <= b))
    assert _rows(crawl.images(as_of=b)) == _rows(
        crawl.images().filter(F.col("batch") <= b))


def test_as_of_visited_monotone(crawl):
    snaps = crawl.snapshots()
    counts = [crawl.visited(as_of=b).count() for b in snaps]
    assert counts == sorted(counts)
    assert counts[-1] == crawl.visited().count()


def test_as_of_matches_interrupted_run(spark, corpus_spark, tmp_path):
    """as_of=b on the full run ≡ the committed state of a run stopped
    after b+1 batches (same seeds/config) — snapshot isolation."""
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(max_depth=3, ignore_robots=True)
    seeds = ["http://d00.test/", "http://d01.test/"]
    full = Crawler(spark, corpus_spark, cfg, str(tmp_path / "full")).run(seeds)
    part = Crawler(spark, corpus_spark, cfg, str(tmp_path / "part")).run(
        seeds, max_batches=2)
    assert _rows(full.trace(as_of=1)) == _rows(part.trace())
    assert _rows(full.visited(as_of=1)) == _rows(part.visited())


def test_has_visited_api(crawl):
    """HasVisited (colly.go:501-509): seeds are marked, unknown URLs
    are not, and the check respects as-of snapshots."""
    assert crawl.has_visited("http://d00.test/")
    assert crawl.has_visited("http://d00.test")  # canonicalized first
    assert not crawl.has_visited("http://never.test/nope")
    # a POST with a body is a different dedup key (HasPosted)
    assert not crawl.has_posted("http://d00.test/", b"form-data")
    # snapshot isolation: nothing was visited before any batch ran
    first = crawl.snapshots()[0]
    assert crawl.has_visited("http://d00.test/", as_of=first)


def test_summary_string(crawl):
    s = crawl.summary()
    assert "Requests made:" in s and "Batches:" in s
