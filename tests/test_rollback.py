"""Snapshot log + rollback (the Iceberg rollback-to-snapshot
analogue over the manifest/delta state layout).

Pins: (a) every commit appends its manifest to SNAPSHOTS.jsonl in
batch order; (b) rollback restores the commit point — readers see
exactly the as-of state, and a resumed drain reproduces the
uninterrupted run byte-identically (determinism makes rollback +
replay a no-op, the property that makes it safe); (c) snapshots
expired by state compaction refuse to roll back (Iceberg
expire_snapshots semantics) while the state stays untouched;
(d) unknown batches raise with the available snapshot list."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.plans.crawler import Crawler, CrawlHandles, rollback, \
    snapshot_log

from tests.test_compaction import SEEDS, _cfg, _signature


def test_snapshot_log_appends_per_commit(spark, corpus_spark, tmp_state):
    h = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0, compact_every=0).run(SEEDS)
    log = snapshot_log(tmp_state)
    assert [e["batch"] for e in log] == list(range(len(h.metrics)))
    for e in log:
        assert set(e) >= {"committed_at", "batch", "next_seq",
                          "stores", "lineage"}
    # the final entry IS the manifest
    with open(os.path.join(tmp_state, "MANIFEST.json")) as f:
        man = json.load(f)
    assert {k: v for k, v in log[-1].items() if k != "committed_at"} == man


def test_rollback_restores_and_replays_identically(
        spark, corpus_spark, tmp_state):
    ref_state = tempfile.mkdtemp(prefix="colly_rbref_")
    try:
        ref = Crawler(spark, corpus_spark, _cfg(), ref_state,
                      bloom_threshold_rows=0, compact_every=0).run(SEEDS)
        ref_sig = _signature(ref)
        n = len(ref.metrics)
        assert n >= 6

        Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0, compact_every=0).run(SEEDS)
        mid = n // 2
        man = rollback(tmp_state, mid)
        assert man["batch"] == mid

        # the rolled-back state reads as the as-of-mid snapshot —
        # and nothing newer survives on disk for the readers to see
        rb = CrawlHandles.open(tmp_state, spark)
        want_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in ref.trace(as_of=mid).collect())
        got_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in rb.trace().collect())
        assert got_trace == want_trace
        assert rb.snapshots() == [b for b in ref.snapshots() if b <= mid]
        counters = [(m["batch"], m["submitted"], m["fetched"],
                     m["errors"], m["new_links"]) for m in rb.metrics]
        assert counters == [(m["batch"], m["submitted"], m["fetched"],
                             m["errors"], m["new_links"])
                            for m in ref.metrics[:mid + 1]]

        # resume from the rolled-back commit point: byte-identical
        # continuation (trace/errors/metrics/seen-set)
        resumed = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                          bloom_threshold_rows=0,
                          compact_every=0).run(resume=True)
        assert _signature(resumed) == ref_sig
        # the log now carries the re-committed batches after the
        # originals; last-entry-per-batch stays authoritative
        log = snapshot_log(tmp_state)
        assert [e["batch"] for e in log] == (
            list(range(n)) + list(range(mid + 1, n)))
    finally:
        shutil.rmtree(ref_state, ignore_errors=True)


def test_rollback_to_compaction_expired_snapshot_refuses(
        spark, corpus_spark, tmp_state):
    h = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0, compact_every=2,
                compact_major_bases=2).run(SEEDS)
    sig = _signature(h)
    with open(os.path.join(tmp_state, "MANIFEST.json")) as f:
        man_before = json.load(f)
    # batch 0's visited delta was folded into a compact base and GC'd
    try:
        rollback(tmp_state, 0)
        raise AssertionError("expected ValueError for expired snapshot")
    except ValueError as e:
        assert "expired" in str(e)
    # refused rollback left the state byte-untouched for readers
    with open(os.path.join(tmp_state, "MANIFEST.json")) as f:
        assert json.load(f) == man_before
    assert _signature(CrawlHandles.open(tmp_state, spark)) == sig
    # ... while the LAST snapshot is always retained and rolls back
    last = snapshot_log(tmp_state)[-1]["batch"]
    assert rollback(tmp_state, last)["batch"] == last
    assert _signature(CrawlHandles.open(tmp_state, spark)) == sig


def test_snapshots_and_rollback_cli(spark, corpus_spark, tmp_state,
                                    capsys):
    """The driver-side subcommands work over any state dir without a
    Spark session of their own."""
    from colly_spark.__main__ import main

    Crawler(spark, corpus_spark, _cfg(), tmp_state,
            bloom_threshold_rows=0,
            compact_every=0).run(SEEDS, max_batches=3)
    assert main(["snapshots", "--state-dir", tmp_state]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert [e["batch"] for e in lines] == [0, 1, 2]
    assert main(["rollback", "--state-dir", tmp_state,
                 "--to-batch", "1"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip())["rolled_back_to"] == 1
    assert main(["rollback", "--state-dir", tmp_state,
                 "--to-batch", "77"]) == 2


def test_rollback_unknown_batch_raises(spark, corpus_spark, tmp_state):
    Crawler(spark, corpus_spark, _cfg(), tmp_state,
            bloom_threshold_rows=0,
            compact_every=0).run(SEEDS, max_batches=2)
    try:
        rollback(tmp_state, 99)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no snapshot for batch 99" in str(e)


def test_incremental_reads_between_snapshots(spark, corpus_spark,
                                             tmp_state):
    """since=a is the Iceberg incremental scan: exactly the rows of
    snapshots a+1..as_of, additive with the as-of reads — and the
    incremental-export use case composes: images(since) carries only
    the newly fetched rows."""
    h = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0, compact_every=0).run(SEEDS)
    snaps = h.snapshots()
    assert len(snaps) >= 3
    a, b = snaps[len(snaps) // 3], snaps[-1]

    from collections import Counter

    def rows(df):
        return Counter(map(repr, map(tuple, df.collect())))

    inc = rows(h.trace(as_of=b, since=a))
    assert inc  # something was fetched after snapshot a
    # incremental ⊎ as-of-a == as-of-b (disjoint multiset union), and
    # every incremental row's batch (the leading trace column) is
    # strictly after a
    assert rows(h.trace(as_of=a)) + inc == rows(h.trace(as_of=b))
    assert all(r["batch"] > a
               for r in h.trace(as_of=b, since=a).collect())
    # sinks: incremental images = full-export row diff (the "ship only
    # new samples to the trainer" shape — note the SAME image_id may
    # legitimately recur in both ranges when a page crawled after `a`
    # links an already-seen image, so the identity is row-level)
    assert rows(h.images(as_of=a)) + rows(h.images(since=a, as_of=b)) \
        == rows(h.images(as_of=b))
    # empty and full ranges
    assert h.trace(since=b).count() == 0
    assert rows(h.trace(since=-1)) == rows(h.trace())


def test_incremental_read_refuses_compacted_range(spark, corpus_spark,
                                                  tmp_state):
    """State stores compact; an incremental visited read whose range
    was folded into a base must refuse, not silently over-report."""
    h = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0, compact_every=2,
                compact_major_bases=2).run(SEEDS)
    try:
        h.visited(since=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "expired" in str(e)
    # sinks are never compacted: the same range reads fine on trace
    assert h.trace(since=0).count() >= 0
