"""Per-partition checkpoint lineage (north rule: "checkpoints to
Iceberg with per-partition lineage + metrics so a killed run resumes
byte-identically").  The manifest records, for every live state-store
dir, its producing batch and per-part-file footer row counts; resume
verifies them and fails loudly on divergence.

Pins:
- the manifest lineage covers exactly the live store paths, with rows
  matching the on-disk footers and the producing batch parsed from the
  dir name;
- resume across a compaction boundary keeps lineage consistent
  (replaced deltas drop out, the compacted base enters);
- a truncated/lost part file makes resume raise instead of silently
  diverging;
- CrawlHandles.lineage() exposes the committed map post-hoc.
"""

from __future__ import annotations

import glob
import json
import os

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.plans.crawler import CrawlHandles, Crawler, _parquet_rows

SEEDS = ["http://d00.test/", "http://d01.test/", "http://d02.test/"]


def _cfg():
    return CrawlConfig(
        max_depth=3, ignore_robots=True, cache_enabled=True,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=200,
                               parallelism=2),))


def _manifest(state):
    with open(os.path.join(state, "MANIFEST.json")) as f:
        return json.load(f)


def test_lineage_matches_footers_and_live_paths(spark, corpus_spark,
                                                tmp_state):
    Crawler(spark, corpus_spark, _cfg(), tmp_state,
            bloom_threshold_rows=0, compact_every=2,
            compact_major_bases=2).run(SEEDS)
    man = _manifest(tmp_state)
    live = {p for paths in man["stores"].values() for p in paths}
    assert set(man["lineage"]) == live, "lineage must cover live paths"
    for relp, ent in man["lineage"].items():
        absp = os.path.join(tmp_state, relp)
        assert ent["rows"] == _parquet_rows(absp)
        assert ent["rows"] == sum(ent["files"].values())
        assert ent["batch"] == int(os.path.basename(relp).split("_")[1])
        on_disk = {os.path.basename(f) for f in
                   glob.glob(os.path.join(absp, "*.parquet"))}
        assert set(ent["files"]) == on_disk
    # compaction happened (compact_every=2 over a ≥6-batch drain) and
    # the replaced deltas are gone from lineage
    assert any(os.path.basename(p).startswith("compact_")
               for p in man["lineage"])
    handles = CrawlHandles.open(tmp_state)
    assert handles.lineage() == man["lineage"]


def test_resume_verifies_lineage(spark, corpus_spark, tmp_state):
    """Interrupt after 2 batches, resume → verification passes and the
    crawl completes; then lose a committed part file → a fresh resume
    raises a lineage mismatch naming the dir."""
    Crawler(spark, corpus_spark, _cfg(), tmp_state,
            bloom_threshold_rows=0).run(SEEDS, max_batches=2)
    handles = Crawler(spark, corpus_spark, _cfg(), tmp_state,
                      bloom_threshold_rows=0).run(resume=True)
    assert sum(m["fetched"] for m in handles.metrics) > 0

    man = _manifest(tmp_state)
    relp = sorted(man["stores"]["visited"])[0]
    victim_dir = os.path.join(tmp_state, relp)
    victim = sorted(glob.glob(os.path.join(victim_dir, "*.parquet")))[0]
    os.remove(victim)
    try:
        Crawler(spark, corpus_spark, _cfg(), tmp_state,
                bloom_threshold_rows=0).run(resume=True)
    except RuntimeError as e:
        assert "lineage mismatch" in str(e) and relp in str(e)
    else:
        raise AssertionError("resume over a lost part file must fail")
