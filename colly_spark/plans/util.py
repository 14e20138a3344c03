"""Plan utilities shared by the crawler driver loop."""

from __future__ import annotations

import pandas as pd


def dense_seq(df, order_cols: list[str], out_col: str = "seq", start: int = 0,
              num_partitions: int | None = None):
    """Assign dense, deterministic sequence numbers ``start, start+1, …``
    in the total order given by ``order_cols`` — WITHOUT a global
    single-partition window.

    This is the frontier's discovery-``seq`` assignment (SURVEY.md §4
    custom piece 1: monotone ``(depth, discovery_seq)`` keys). A naive
    ``row_number().over(Window.orderBy(...))`` collapses to one task; at
    10^10-frontier scale that is the bottleneck. Instead, the standard
    two-phase dense-rank:

    1. ``repartitionByRange`` on the order columns (range boundaries may
       vary run-to-run; the *result* does not — total order is fixed by
       the sort) + ``sortWithinPartitions``;
    2. count rows per partition, driver computes exclusive prefix sums
       (P integers — tiny), broadcast back;
    3. per-partition local rank + offset via ``mapInPandas``.

    Deterministic: output is a pure function of the row multiset and
    ``order_cols`` (which must be a unique key).
    """
    from pyspark.sql import functions as F

    n_parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    n_parts = int(n_parts)
    ordered = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
          .sortWithinPartitions(*order_cols)
    )
    # monotonically_increasing_id within sorted partitions is
    # (pid << 33) + local_row_index — entirely JVM-side, so the rank
    # pass never crosses into Python (an Arrow round-trip over every
    # discovered link would dominate extraction at scale)
    ordered = (ordered
               .withColumn("_part", F.spark_partition_id())
               .withColumn("_mid", F.monotonically_increasing_id()))
    ordered.persist()
    counts = dict(
        (r["_part"], r["cnt"])
        for r in ordered.groupBy("_part").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv])
        local_idx = F.col("_mid") - (F.col("_part").cast("long") * F.lit(1 << 33))
        seq_expr = (mapping[F.col("_part")] + local_idx).cast("long")
    else:
        seq_expr = F.lit(start).cast("long")
    # the persist served the counts pass; the seq pass recomputes from
    # the same shuffle files (same RDD → same boundaries + row order),
    # so release the cache instead of leaking it across loop batches
    ordered.unpersist()
    result = ordered.withColumn(out_col, seq_expr).drop("_part", "_mid")
    return result, acc


def to_spark_corpus(spark, tables: dict) -> dict:
    """pandas fixture tables (sources/fixtures.make_corpus) → cached
    Spark DataFrames with explicit schemas (binary columns need them)."""
    from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, IntegerType,
                                   LongType, StringType, StructField, StructType)

    schemas = {
        "images": StructType([
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]),
        "pages": StructType([
            StructField("url", StringType()),
            StructField("status", IntegerType()),
            StructField("content_type", StringType()),
            StructField("body", BinaryType()),
            StructField("redirect_to", StringType()),
            StructField("image_id", StringType()),
            StructField("links", ArrayType(StringType())),
            StructField("depth_from_seed", IntegerType()),
            StructField("set_cookie", StringType()),
            StructField("require_cookie", StringType()),
            StructField("cache_max_age", IntegerType()),
            StructField("retry_after", IntegerType()),
            StructField("etag", StringType()),
            StructField("last_modified", StringType()),
        ]),
        "robots": StructType([
            StructField("host", StringType()),
            StructField("body", StringType()),
            StructField("fetch_error", BooleanType()),
        ]),
        "seeds": StructType([
            StructField("url", StringType()),
            StructField("seq", LongType()),
        ]),
        "limit_rules": StructType([
            StructField("priority", IntegerType()),
            StructField("domain_glob", StringType()),
            StructField("domain_regexp", StringType()),
            StructField("delay_ms", LongType()),
            StructField("random_delay_ms", LongType()),
            StructField("parallelism", IntegerType()),
        ]),
    }
    out = {}
    for name, pdf in tables.items():
        records = pdf.where(pd.notnull(pdf), None).to_dict("records")
        out[name] = spark.createDataFrame(records, schema=schemas[name])
    return out


def ship_package(spark) -> None:
    """Ship the colly_spark package to executor Python workers — the
    in-session equivalent of ``spark-submit --py-files colly_spark.zip``.
    Needed whenever the driver's cwd is not the repo root (pandas UDFs
    import colly_spark inside the worker). Idempotent per context."""
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_colly_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"colly_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for r, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(r, f)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    sc._colly_pkg_shipped = True
