"""Two-phase salted quota admission (politeness.with_fetch_now_flag
skew_salt) — the hot-domain skew kill for 10^10-URL frontiers.

The plain admission window sorts each host's whole pending set in one
task; salting bounds every task by its salt share and ranks only the
≤ S·quota phase-1 survivors per host. For any total order, the top-q
of the union of per-part top-qs IS the global top-q, so the admitted
set must be IDENTICAL — pinned here per row on skewed data, under
FIFO and priority orders, at several salt widths, and end-to-end
through a full drain (same trace/errors/metrics/seen-set)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.operators import politeness
from colly_spark.plans.crawler import Crawler

from tests.test_compaction import SEEDS, _cfg, _signature


def _pending(spark, hot_rows=500, cold_hosts=6):
    rows = [(i, "hot.test", float(i % 7)) for i in range(hot_rows)]
    seq = hot_rows
    for h in range(cold_hosts):
        for j in range(3):
            rows.append((seq, f"cold{h}.test", float(j)))
            seq += 1
    return spark.createDataFrame(
        rows, "seq long, host string, prio double")


def _quota_cfg(par=4):
    return CrawlConfig(limit_rules=(
        LimitRule(domain_glob="*", delay_ms=100, parallelism=par),))


def _flags(df):
    return sorted((r["seq"], r["_fetch_now"]) for r in df.collect())


def test_salted_flag_identical_fifo(spark):
    p = _pending(spark)
    cfg = _quota_cfg()
    plain = _flags(politeness.with_fetch_now_flag(p, cfg))
    for s in (2, 8, 32):
        assert _flags(politeness.with_fetch_now_flag(
            p, cfg, skew_salt=s)) == plain
    # degenerate salts fall back to the plain path
    assert _flags(politeness.with_fetch_now_flag(
        p, cfg, skew_salt=1)) == plain
    n_admit = sum(1 for _s, f in plain if f)
    assert 0 < n_admit < len(plain)  # quota actually bit


def test_salted_flag_identical_priority(spark):
    p = _pending(spark)
    # NULL priorities for some rows: NULLs-last ordering must survive
    p = p.withColumn("prio", F.when(F.col("seq") % 5 == 0,
                                    F.lit(None)).otherwise(F.col("prio")))
    cfg = _quota_cfg()
    plain = _flags(politeness.with_fetch_now_flag(
        p, cfg, priority_col="prio"))
    assert _flags(politeness.with_fetch_now_flag(
        p, cfg, priority_col="prio", skew_salt=8)) == plain


def test_salted_preserves_columns_and_rowcount(spark):
    p = _pending(spark, hot_rows=50, cold_hosts=2)
    out = politeness.with_fetch_now_flag(p, _quota_cfg(), skew_salt=4)
    assert set(out.columns) == {"seq", "host", "prio", "_fetch_now"}
    assert out.count() == p.count()


def test_salted_drain_end_to_end_equal(spark, corpus_spark, tmp_state):
    base_state = tempfile.mkdtemp(prefix="colly_salt_")
    try:
        plain = Crawler(spark, corpus_spark, _cfg(), base_state,
                        bloom_threshold_rows=0, compact_every=0).run(SEEDS)
        salted = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                         bloom_threshold_rows=0, compact_every=0,
                         politeness_salt=8).run(SEEDS)
        assert _signature(salted) == _signature(plain)
    finally:
        shutil.rmtree(base_state, ignore_errors=True)
