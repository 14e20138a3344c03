#!/usr/bin/env python
"""A/B bench: DECIMAL-exact oracle mode vs float production mode for
the three iterative ops that carry the engine-neutral float discipline
(quality_classifier, pagerank, dsir_select).

The DECIMAL tax is the documented price of hard DuckDB oracles
(VERDICT r3); the ``exact=False`` flag drops it for production runs.
This script measures what the tax actually costs at the bench SF and
prints ONE JSON line; the table lands in BENCH.md.

Protocol matches bench.py: one untimed warm-up per variant pair, then
BENCH_REPEATS timed runs, medians reported.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPEATS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, REPEATS, SF_DIR, _median, make_spark  # noqa: E402


def _docs(spark):
    from pyspark.sql import functions as F

    return (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .withColumn("is_t", F.col("lang") == "en"))


def run_classifier(spark, exact):
    from colly_spark.operators.classifier import quality_classifier

    quality_classifier(_docs(spark), "is_t", exact=exact) \
        .write.format("noop").mode("overwrite").save()


def run_pagerank(spark, exact):
    from pyspark.sql import functions as F

    from colly_spark.operators.graph import pagerank

    docs = _docs(spark).select("doc_id")
    n = docs.count()
    base = docs.filter(F.col("doc_id") % 17 != 0)
    i = F.col("doc_id")
    e = (base.select(i.alias("src"), ((i * 2 + 1) % n).alias("dst"))
         .union(base.select(i.alias("src"), ((i * 3 + 7) % n).alias("dst")))
         .union(base.select(i.alias("src"), (i % 97).alias("dst"))))
    pagerank(e, n_iter=8, exact=exact) \
        .write.format("noop").mode("overwrite").save()


def run_dsir(spark, exact):
    from colly_spark.operators.dsir import dsir_select

    dsir_select(_docs(spark), "is_t", k=100, exact=exact) \
        .write.format("noop").mode("overwrite").save()


OPS = {"quality_classifier": run_classifier,
       "pagerank": run_pagerank,
       "dsir_select": run_dsir}


def main():
    import __spark_entry__ as entry_mod

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._ensure_pkg(spark)
    out = {}
    for name, fn in OPS.items():
        timing = {}
        for label, exact in (("exact", True), ("float", False)):
            fn(spark, exact)  # per-variant warm-up — the two modes
            # compile different plans (DECIMAL casts vs doubles), so
            # each variant's codegen/JIT must land outside its own
            # timed window
            samples = []
            for _ in range(REPEATS):
                t0 = time.time()
                fn(spark, exact)
                samples.append(time.time() - t0)
            timing[label] = round(_median(samples), 3)
        timing["speedup"] = round(timing["exact"] / timing["float"], 3)
        out[name] = timing
    print(json.dumps({"metric": "exact-vs-float median wall (s)",
                      "ops": out, "sf": SF_DIR, "cpus": CPUS,
                      "repeats": REPEATS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
