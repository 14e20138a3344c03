#!/usr/bin/env python
"""Dump .explain("formatted") for the headline queries and grep the
plans for the properties we require:

- parquet scans show PushedFilters / pruned ReadSchema (no full-width
  scans for narrow projections),
- small dims join via BroadcastHashJoin,
- WholeStageCodegen spans cover the relational stages,
- no Python row-at-a-time UDFs in relational paths (ArrowEvalPython /
  MapInPandas only where the operator is genuinely Python).

Usage: python scripts/explain_audit.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

AUDIT = [
    "admission_filter", "fnv64_hash", "politeness_quota", "seen_antijoin",
    "exact_dedup", "ngram_jaccard", "minhash_lsh_buckets", "simhash",
    "cosine_topk", "ann_lsh", "token_stats", "events_rollup", "sessionize",
    "lineitem_pricing", "region_revenue", "brand_supplier_revenue",
    "unmarshal_fields", "xpath_links",
    "domain_cap", "dataset_split", "phash_near_dup", "image_corpus_filter",
    "callback_fires", "stratified_sample", "token_shards",
    "domain_mixture", "image_stats", "image_curation", "recrawl_schedule",
    "c4_line_filter", "repetition_stats", "caption_alignment",
    "ann_ivfpq", "ann_ivfpq_refined",
    "video_near_dup", "audio_near_dup",
    "gif_decode", "gif_frames", "sitemap_discover",
]


def main():
    import __spark_entry__ as entry_mod
    from bench import make_spark

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    findings = []
    for name in AUDIT:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        print(f"{'='*72}\nQUERY {name}\n{'='*72}\n{plan}")
        checks = {
            "whole_stage_codegen": ("codegen id :" in plan) or ("WholeStageCodegen" in plan),
            "batch_scan_parquet": "Scan parquet" in plan or "BatchScan" in plan,
            "column_pruned_scan": "ReadSchema" in plan,
            "pushed_filters": "PushedFilters" in plan,
            "row_at_a_time_python": "BatchEvalPython" in plan,  # bad if True
        }
        findings.append((name, checks))
    print(f"{'='*72}\nSUMMARY\n{'='*72}")
    for name, checks in findings:
        flags = " ".join(f"{k}={v}" for k, v in checks.items())
        print(f"{name:24s} {flags}")
    bad = [n for n, c in findings if c["row_at_a_time_python"]]
    if bad:
        print("WARNING: row-at-a-time Python UDF present in:", bad)
    spark.stop()


if __name__ == "__main__":
    main()
