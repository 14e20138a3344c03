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


def domain_mixture_quotas(dom_counts, budget: int, alpha: float = 0.5):
    """Temperature-weighted domain quotas with exact water-filling caps
    (the T5/mT5 §3.1 α-sampling rule, Raffel et al. 2020 / Xue et al.
    2021): sample domain d proportionally to n_d^α — α < 1 upweights
    small domains — but never more than the domain HAS. The
    proportional allocation min(n_d, τ·n_d^α) with Σ = budget is the
    classic water-filling problem; small domains saturate (take all
    n_d), the remainder splits by weight.

    Exact arithmetic end to end so the DuckDB oracle matches bit-for-
    bit: weights are scaled to integers (s12 = ⌊n^α · 10^12⌋ — for the
    oracled α=0.5 the double sqrt is IEEE-exact, so both engines floor
    the same double), the saturation test is the cross-multiplied
    integer comparison n·S ≤ R·s (no division), and the final quota is
    the integral quotient (R·s12) DIV S12 — floor of an exact
    rational, never a rounded float. Σ quotas ≤ budget with at most
    one lost row per unsaturated domain (flooring), the standard
    mixture-sampling contract.

    ``dom_counts``: (dom, n) — the per-domain count table. It is
    vocabulary-small by construction (data sources / languages /
    buckets), so single-partition window aggregation over it is free;
    the corpus itself never enters this function. α ∈ (0, 1] (the
    upweight-small regime; r_d = n_d/s_d must be monotone in n_d for
    the saturated set to be a sorted prefix).

    Returns (dom, n, quota).
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    d38 = "decimal(38,0)"
    w = Window.orderBy(F.asc("n"), F.asc("dom"))
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    ws = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    g = (dom_counts
         .withColumn("s12", F.floor(
             F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
             * F.lit(1e12)).cast(d38))
         .withColumn("cum_n_prev",
                     F.coalesce(F.sum("n").over(wp), F.lit(0)))
         .withColumn("suf_s", F.sum("s12").over(ws))
         .withColumn("rem", F.lit(budget) - F.col("cum_n_prev"))
         .withColumn("sat",
                     (F.col("n").cast(d38) * F.col("suf_s"))
                     <= (F.greatest(F.col("rem"), F.lit(0)).cast(d38)
                         * F.col("s12"))))
    # R = budget - Σ_sat n, S = Σ_unsat s12 (1-row broadcast)
    tot = g.agg(
        (F.lit(budget)
         - F.coalesce(F.sum(F.when(F.col("sat"), F.col("n"))), F.lit(0))
         ).cast(d38).alias("R"),
        F.coalesce(F.sum(F.when(~F.col("sat"), F.col("s12"))),
                   F.lit(1).cast(d38)).alias("S"))
    return (g.crossJoin(F.broadcast(tot))
            .withColumn(
                "quota",
                F.when(F.col("sat"), F.col("n"))
                 .otherwise(F.greatest(F.lit(0).cast("bigint"), F.least(
                     F.col("n"),
                     F.expr("(R * s12) DIV S").cast("bigint")))))
            .select("dom", "n", "quota"))


def domain_mixture_sample(df, budget: int, alpha: float = 0.5,
                          domain_col: str = "source",
                          key_col: str = "doc_id"):
    """Select ``quota_d`` rows per domain under the α-temperature
    mixture (domain_mixture_quotas above). Within a domain the picks
    are content-stable: rank by (pmod(FNV-64a(key), 10^9), key) — the
    ``dataset_split`` discipline, so the sample never flips under
    recomputation and only grows monotonically-by-rank under corpus
    growth. One count groupBy + one per-domain window; the quota table
    broadcasts back onto the corpus."""
    dom_counts = (df.groupBy(F.col(domain_col).alias("dom"))
                  .agg(F.count("*").alias("n")))
    quotas = (domain_mixture_quotas(dom_counts, budget, alpha)
              .select(F.col("dom").alias("_mix_dom"),
                      F.col("quota").alias("_mix_quota")))
    rank_w = Window.partitionBy(domain_col).orderBy(
        F.pmod(fnv64a_udf(F.col(key_col).cast("string")),
               F.lit(1_000_000_000)).asc(),
        F.col(key_col).asc())
    return (df.withColumn("_rank", F.row_number().over(rank_w))
            .join(F.broadcast(quotas),
                  F.col(domain_col) == F.col("_mix_dom"), "inner")
            .filter(F.col("_rank") <= F.col("_mix_quota"))
            .drop("_rank", "_mix_dom", "_mix_quota"))


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
