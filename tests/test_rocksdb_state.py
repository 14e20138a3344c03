"""Off-heap RocksDB state store (streaming/statestore.py) under the
stateful operators — the provider the north-star scale requires
(10^10-URL frontier seen-sets exceed executor heap).

Pins:
- the rate-limited drain under RocksDB emits the IDENTICAL
  (host, seq, window_id) set as the default on-heap provider;
- the provider actually engaged (rocksdb* custom metrics in the
  query's state-operator progress, absent under the default);
- a mid-backlog restart resumes per-host window counters from a
  RocksDB checkpoint (changelog checkpointing on);
- session confs are restored after the context manager exits.
"""

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.streaming.ratelimit import RateLimitedDrain
from colly_spark.streaming.statestore import (provider_custom_metrics,
                                              rocksdb_confs,
                                              state_store_provider)

CFG = CrawlConfig(limit_rules=(
    LimitRule(domain_glob="*", delay_ms=180, parallelism=1),))  # quota 5


def _pending(spark, n_hosts=3, per_host=12):
    rows = [(f"h{h}.test", f"http://h{h}.test/{i}", h * 1000 + i)
            for h in range(n_hosts) for i in range(per_host)]
    return spark.createDataFrame(rows, "host string, url string, seq long")


def _drain(spark, pdf):
    drain = RateLimitedDrain(spark, pdf, CFG)
    drain.start()
    drain.wait_drained(poll_s=0.05)
    return drain


def test_rocksdb_matches_default_and_engages(spark):
    base = _drain(spark, _pending(spark))
    assert not any(k.startswith("rocksdb")
                   for k in provider_custom_metrics(base.query)), \
        "baseline run unexpectedly used RocksDB"
    expected = {(r.host, r.seq, r.window_id) for r in base.emitted().collect()}
    assert len(expected) == 36

    with state_store_provider(spark, "rocksdb"):
        rocks = _drain(spark, _pending(spark))
        metrics = provider_custom_metrics(rocks.query)
    assert any(k.startswith("rocksdb") for k in metrics), \
        f"RocksDB provider did not engage: {sorted(metrics)[:8]}"
    got = {(r.host, r.seq, r.window_id) for r in rocks.emitted().collect()}
    assert got == expected


def test_rocksdb_state_survives_restart(spark):
    """30-row single-host backlog = 6 politeness windows; interrupt
    after ≥5 admissions, resume from the RocksDB checkpoint, and
    require the uninterrupted closed-form window numbering."""
    rows = [("c.test", f"http://c.test/{i}", i) for i in range(30)]
    pdf = spark.createDataFrame(rows, "host string, url string, seq long")
    with state_store_provider(spark, "rocksdb"):
        drain = RateLimitedDrain(spark, pdf, CFG)
        drain.start()
        mid = drain.wait_drained(stop_at_emitted=5, poll_s=0.05)
        assert 5 <= mid < 30, "query should have been stopped mid-backlog"
        drain.start()  # same checkpoint → same provider resumes
        total = drain.wait_drained(poll_s=0.05)
    assert total == 30
    got = {(r.seq, r.window_id) for r in drain.emitted().collect()}
    assert got == {(i, i // 5 + 1) for i in range(30)}


def test_provider_confs_restored(spark):
    keys = sorted(rocksdb_confs())
    before = {k: spark.conf.get(k, None) for k in keys}
    with state_store_provider(spark, "rocksdb"):
        for k, v in rocksdb_confs().items():
            assert spark.conf.get(k) == v
    after = {k: spark.conf.get(k, None) for k in keys}
    assert after == before
