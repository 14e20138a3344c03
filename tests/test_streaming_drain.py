"""The Structured Streaming foreachBatch drain must produce outputs
byte-identical to the driver-loop drain (same engine, different
tick source), including across a kill/resume of the streaming query."""

from __future__ import annotations

import tempfile

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.plans.crawler import Crawler
from colly_spark.streaming.drain import run_streaming_drain


def _trace_rows(handles):
    return sorted(map(tuple, handles.trace().collect()))


def test_streaming_equals_loop(spark, corpus_spark):
    cfg = CrawlConfig(
        max_depth=2, ignore_robots=False,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=100, parallelism=2),))
    seeds = ["http://d00.test/", "http://d01.test/"]
    loop = Crawler(spark, corpus_spark, cfg, tempfile.mkdtemp()).run(seeds)
    stream = run_streaming_drain(
        spark, corpus_spark, cfg, tempfile.mkdtemp(), seeds=seeds,
        trigger_interval="200 milliseconds")
    assert _trace_rows(stream) == _trace_rows(loop)
    assert [m["fetched"] for m in stream.metrics] == [m["fetched"] for m in loop.metrics]


def test_streaming_resume(spark, corpus_spark):
    cfg = CrawlConfig(max_depth=3, ignore_robots=True)
    seeds = ["http://d00.test/"]
    full = run_streaming_drain(
        spark, corpus_spark, cfg, tempfile.mkdtemp(), seeds=seeds,
        trigger_interval="200 milliseconds")
    state = tempfile.mkdtemp()
    run_streaming_drain(spark, corpus_spark, cfg, state, seeds=seeds,
                        max_batches=2, trigger_interval="200 milliseconds")
    resumed = run_streaming_drain(spark, corpus_spark, cfg, state, resume=True,
                                  trigger_interval="200 milliseconds")
    assert _trace_rows(resumed) == _trace_rows(full)
