#!/usr/bin/env python
"""Recall/cost curves for the ANN dials (BENCH.md §ANN): multiprobe
sign-LSH probes and IVF nprobe, measured against the exact
``cosine_topk`` baseline on the testdata embeddings.

For each dial setting we report:
- recall@k vs brute force (fraction of exact top-k pairs recovered),
- candidate fraction (candidate pairs scored / full cross product —
  the actual work an executor does; the cost lever at 10^9 vectors),
- wall seconds (local, warmed, median of 3).

Usage: python scripts/ann_curves.py [sf_dir] [k]
Prints one JSON line per curve point plus a markdown table to stderr
for pasting into BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N_QUERIES = 64


def main():
    from pyspark.sql import SparkSession, functions as F

    from colly_spark.operators.similarity import (ann_ivf_topk, ann_lsh_topk,
                                                  cosine_topk, hyperplanes,
                                                  ivf_centroids, lsh_bucket_vec,
                                                  ivf_cell_vec)

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")) \
        .persist()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES).persist()
    nq = q.count()

    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, q, k=K).collect()}

    def point(fn, label, cand_frac):
        walls, got = [], None
        for _ in range(3):
            t0 = time.time()
            got = {(r["query_id"], r["neighbor_id"]) for r in fn().collect()}
            walls.append(time.time() - t0)
        recall = len(exact & got) / len(exact)
        row = dict(label=label, recall=round(recall, 3),
                   candidate_frac=round(cand_frac, 4),
                   wall_s=round(statistics.median(walls), 2))
        print(json.dumps(row), flush=True)
        return row

    rows = []
    # --- sign-LSH multiprobe curve (n_bits=8 → 256 buckets) ------------
    n_bits = 8
    planes = hyperplanes(64, n_bits, seed=42)
    # measured bucket-occupancy → expected candidate fraction per probe
    occ = (emb.select(lsh_bucket_vec(planes, F.col("embedding"))
                      .alias("b")).groupBy("b").count().collect())
    total = sum(r["count"] for r in occ)
    mean_bucket = (sum(r["count"] ** 2 for r in occ) / total) / total
    for probes in (0, 1, 2, 4, 8):
        rows.append(point(
            lambda p=probes: ann_lsh_topk(emb, q, k=K, n_bits=n_bits,
                                          multiprobe=p, assign="vectorized"),
            f"lsh n_bits={n_bits} multiprobe={probes}",
            mean_bucket * (1 + probes)))
    # --- multi-table curve (n_bits=8, no multiprobe) --------------------
    for tables in (2, 4, 8):
        rows.append(point(
            lambda t=tables: ann_lsh_topk(emb, q, k=K, n_bits=n_bits,
                                          n_tables=t, assign="vectorized"),
            f"lsh n_bits={n_bits} n_tables={tables}",
            min(1.0, mean_bucket * tables)))
    # --- IVF nprobe curve (nlist=16) ------------------------------------
    nlist = 16
    cents = ivf_centroids(64, nlist, seed=7)
    occ = (emb.select(ivf_cell_vec(cents, F.col("embedding")).alias("c"))
           .groupBy("c").count().collect())
    cell_frac = {r["c"]: r["count"] / total for r in occ}
    mean_cell = sum(f * f for f in cell_frac.values())
    for nprobe in (1, 2, 4, 8, 16):
        rows.append(point(
            lambda p=nprobe: ann_ivf_topk(emb, q, k=K, nlist=nlist,
                                          nprobe=p, assign="vectorized"),
            f"ivf nlist={nlist} nprobe={nprobe}",
            min(1.0, mean_cell * nprobe / (1 / nlist) / nlist)))
    # --- IVF-PQ curve (same coarse cells; codes instead of floats) ------
    from colly_spark.operators.pq import ann_ivfpq_topk
    for nprobe, refine in ((4, 0), (4, 32), (8, 0), (8, 32), (16, 32)):
        rows.append(point(
            lambda p=nprobe, r=refine: ann_ivfpq_topk(
                emb, q, k=K, nlist=nlist, m=8, nbits=4, nprobe=p,
                refine=r, dim=64),
            f"ivfpq nlist={nlist} nprobe={nprobe} refine={refine}"
            f" (codes 8B/vec vs 512B raw)",
            min(1.0, mean_cell * nprobe / (1 / nlist) / nlist)))
    # trained codebooks (the production path; seeded ones exist for
    # the bit-exact oracle harness)
    from colly_spark.operators.pq import pq_train_codebooks
    books = pq_train_codebooks(emb, cents, m=8, nbits=4, n_iter=4)
    for nprobe, refine in ((4, 32), (8, 0), (8, 32), (8, 128)):
        rows.append(point(
            lambda p=nprobe, r=refine: ann_ivfpq_topk(
                emb, q, k=K, nlist=nlist, m=8, nbits=4, nprobe=p,
                refine=r, dim=64, books=books),
            f"ivfpq TRAINED books nprobe={nprobe} refine={refine}",
            min(1.0, mean_cell * nprobe / (1 / nlist) / nlist)))
    # markdown for BENCH.md
    print("\n| dial | recall@%d | candidate fraction | wall s (median) |"
          % K, file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['label']} | {r['recall']} | {r['candidate_frac']} "
              f"| {r['wall_s']} |", file=sys.stderr)
    print(f"\nbaseline: exact cosine_topk over n={n}, {nq} queries, k={K}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
