"""Deterministic corpus sampling & shard packing — training-data
pipeline operators beyond the reference (the dataset_split family).

Both operators are pure Catalyst and deterministic under
recomputation, repartitioning, and incremental corpus growth:

- ``stratified_sample`` — per-stratum admission by content-stable
  hash threshold: keep a row iff ``pmod(FNV-64a(key), 1000) <
  threshold_permille[stratum]``. No RNG, no state: a document's fate
  is a pure function of its key, so re-running over a grown corpus
  never flips earlier decisions (the property reservoir/Bernoulli
  sampling with a seed column loses under re-partitioning). Map-side
  filter — scan-speed at 100 TB.

- ``token_shards`` — greedy sequential packing of documents into
  fixed token-budget shards per stratum: shard id = exclusive prefix
  token sum ÷ budget, i.e. a document starts a new shard when the
  running total crosses the budget. One window (partitionBy stratum,
  orderBy key) = one shuffle; shard sizes overshoot by at most one
  document, matching the common "pack-then-truncate" training layout.
  At 100 TB the stratum is the natural parallel unit; a single
  giant stratum would need range-partitioned prefix sums (two-phase,
  like plans/util.dense_seq) — same algebra, noted here for the
  scale path.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from colly_spark.functions.udfs import fnv64a_udf


def stratified_sample(df, thresholds: dict[str, int], default_permille: int,
                      key_col: str = "doc_id", strata_col: str = "source"):
    """Rows admitted at per-stratum rates (permille of the keyspace).

    thresholds: {stratum: permille}; strata not listed use
    ``default_permille``. Admission = pmod(FNV64(key), 1000) < t.
    """
    bucket = F.pmod(fnv64a_udf(F.col(key_col).cast("string")), F.lit(1000))
    t = F.lit(default_permille)
    for stratum, permille in sorted(thresholds.items()):
        t = F.when(F.col(strata_col) == stratum, F.lit(permille)).otherwise(t)
    return df.withColumn("_bucket", bucket).filter(F.col("_bucket") < t) \
             .drop("_bucket")


def token_shards(df, budget: int, tokens_col: str = "n_tokens",
                 key_col: str = "doc_id", strata_col: str = "source"):
    """Assign each row a shard id: exclusive-prefix-sum(tokens) ÷
    budget within its stratum, ordered by key. Returns the input plus
    ``shard`` (int)."""
    w = (Window.partitionBy(strata_col).orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prefix_incl = F.sum(F.col(tokens_col)).over(w)
    prefix_excl = prefix_incl - F.col(tokens_col)
    return df.withColumn(
        "shard", F.floor(prefix_excl / F.lit(budget)).cast("int"))


def pack_sequences(df, budget: int, tokens_col: str = "n_tokens",
                   key_col: str = "doc_id", strata_col: str = "source",
                   n_buckets: int = 8):
    """No-straddle next-fit sequence packing: documents are laid into
    fixed token-budget shards in content-stable order (by key within
    (stratum, FNV bucket)); a document that would overflow the open
    shard starts the next one (so shards never straddle documents —
    the layout for sample-isolated attention, vs ``token_shards``'s
    concat-and-truncate layout). A document longer than the budget
    gets a shard of its own. Returns (key, stratum, bucket, n_tokens,
    shard, offset) with shard numbered per (stratum, bucket) and
    offset the token start within the shard.

    Scale shape: the fold is inherently sequential, so it runs in
    applyInPandas over (stratum, bucket) groups — METADATA ONLY (key +
    token count; text is pruned before the shuffle), so a group is a
    few MB even for millions of docs, and ``n_buckets`` dials group
    size down independently of corpus growth. One shuffle; the
    per-group fold is O(group).
    """
    import pandas as pd

    meta = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(strata_col).alias("stratum"),
        F.pmod(fnv64a_udf(F.col(key_col).cast("string")),
               F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(tokens_col).cast("long").alias("n_tokens"))

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key").reset_index(drop=True)
        shard, fill = 0, 0
        shards, offsets = [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                shard += 1
                fill = 0
            shards.append(shard)
            offsets.append(fill)
            fill += t
        pdf["shard"] = pd.Series(shards, dtype="int32")
        pdf["offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    schema = ("key string, stratum string, bucket int, n_tokens long, "
              "shard int, offset long")
    return meta.groupBy("stratum", "bucket").applyInPandas(_fold, schema)
