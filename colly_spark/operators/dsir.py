"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus documents that look most like a
small trusted target corpus, by importance weights over hashed n-gram
features plus Gumbel top-k resampling.

Pipeline shape (the paper's, re-expressed in Catalyst):

1. featurize every document as a bag of hashed unigrams+bigrams
   (FNV-64a(gram) mod ``buckets`` — the paper's hashed n-gram
   generative model);
2. fit two bucket multinomials with Lidstone smoothing: ``p`` on the
   target slice, ``q`` on the full raw corpus;
3. per raw document, log importance weight
   ``log w = Σ_gram log(p_b / q_b)``;
4. sample k documents WITHOUT replacement via the Gumbel-top-k trick:
   rank by ``log w + g_i`` where ``g_i`` is standard Gumbel noise —
   here a DETERMINISTIC Gumbel derived from FNV-64a(doc_id‖seed), so
   the "sample" is reproducible across runs and engines (the same
   content-stable-randomness discipline as ``global_shuffle`` and
   ``dataset_split``).

Scale shape at 100 TB:

- the two bucket-count fits are groupBy(bucket) over the exploded gram
  stream — at most ``buckets`` (default 1024) result rows each, so the
  log-ratio table is a tiny broadcast;
- per-doc weights are one explode + one broadcast equi-join on bucket
  + one groupBy(doc) — shuffle volume is one (id, decimal) pair per
  document, keyed by doc id (uniform);
- top-k is Spark's TakeOrderedAndProject (per-partition heaps + one
  k-row driver merge), NOT a global sort; the only window runs over
  the ≤k selected rows;
- no Python in the hot path except the Arrow-batched FNV kernel shared
  with the crawler's admission scan.

Engine-neutral float discipline: the only transcendental values
(per-bucket log ratios, per-doc Gumbel noise) are rounded to 9 dp and
summed/compared as DECIMAL, so per-doc totals are exact and
order-independent — the Spark result and the DuckDB oracle rank by the
identical key. Gram hashing is byte-wise FNV over UTF-8 while the SQL
oracle hashes code points; identical for ASCII corpora (the synthetic
tables), same documented caveat as the winnowing oracle.
"""

from __future__ import annotations

DEFAULT_BUCKETS = 1024
DEFAULT_ALPHA = 0.1
# Gumbel uniform resolution: u = (h mod 2^20 + 0.5) / 2^20
GUMBEL_MOD = 1 << 20
_DEC = "decimal(24,10)"


def gram_stream(docs, id_col: str = "doc_id", text_col: str = "text",
                extra_cols: tuple = ()):
    """(id, gram) rows: lowercased whitespace tokens plus adjacent
    bigrams ('tok_i tok_{i+1}'), one row per OCCURRENCE (the bag
    counts multiplicity, per the paper). Empty/whitespace docs emit
    exactly one '' unigram — mirrored by string_split_regex('') in the
    SQL oracle."""
    from pyspark.sql import functions as F

    from colly_spark.operators.text_quality import tokens_expr

    t = F.transform(tokens_expr(F.col(text_col)), F.lower)
    bi = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(F.element_at(t, i), F.lit(" "),
                               F.element_at(t, i + F.lit(1))))
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col).alias("id"),
                       *[F.col(c) for c in extra_cols],
                       F.explode(F.concat(t, bi)).alias("gram"))


def _bucketed(gram_df, buckets: int):
    from pyspark.sql import functions as F

    from colly_spark.functions.udfs import fnv64a_udf

    return gram_df.withColumn(
        "bkt", F.pmod(fnv64a_udf(F.col("gram")), F.lit(buckets)))


def log_ratio_table(bucketed, target_col: str, buckets: int,
                    alpha: float = DEFAULT_ALPHA, exact: bool = True):
    """bucket → ln(p̂_b/q̂_b): round-9 DECIMAL under ``exact=True``
    (oracle harness), native DOUBLE under ``exact=False`` (production
    — same ≤``buckets``-row broadcast, no DECIMAL tax). q̂ is fit on
    ALL rows, p̂ on rows where ``target_col`` holds; buckets never
    seen in the raw corpus can never be probed (every scored gram was
    counted in q), so the inner scoring join is total."""
    from pyspark.sql import functions as F

    c_q = bucketed.groupBy("bkt").agg(F.count("*").alias("c_q"))
    c_p = (bucketed.filter(F.col(target_col))
           .groupBy("bkt").agg(F.count("*").alias("c_p")))
    tot = (c_q.agg(F.sum("c_q").alias("nq"))
           .crossJoin(c_p.agg(F.coalesce(F.sum("c_p"), F.lit(0))
                              .alias("np"))))
    a, b = F.lit(float(alpha)), F.lit(float(buckets))
    p = (F.coalesce(F.col("c_p"), F.lit(0)) + a) / (F.col("np") + a * b)
    q = (F.col("c_q") + a) / (F.col("nq") + a * b)
    lr = (F.round(F.log(p / q), 9).cast(_DEC) if exact
          else F.log(p / q))
    return (c_q.join(c_p, "bkt", "left").crossJoin(F.broadcast(tot))
            .select("bkt", lr.alias("lr")))


def gumbel_key_col(id_col, seed: int, exact: bool = True):
    """Deterministic standard-Gumbel noise g = -ln(-ln(u)) with
    u = (FNV-64a(id‖':gumbel:'‖seed) mod 2^20 + 0.5) / 2^20 — content-
    stable, engine-reproducible, never 0 or 1. Rounded to 9 dp and
    carried as DECIMAL like the log ratios."""
    from pyspark.sql import functions as F

    from colly_spark.functions.udfs import fnv64a_udf

    h = F.pmod(
        fnv64a_udf(F.concat(id_col.cast("string"),
                            F.lit(f":gumbel:{seed}"))),
        F.lit(GUMBEL_MOD))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(GUMBEL_MOD))
    g = -F.log(-F.log(u))
    return F.round(g, 9).cast(_DEC) if exact else g


def dsir_select(docs, target_col: str, k: int = 100,
                buckets: int = DEFAULT_BUCKETS, alpha: float = DEFAULT_ALPHA,
                seed: int = 17, id_col: str = "doc_id",
                text_col: str = "text", exact: bool = True):
    """Select ``k`` documents from ``docs`` by DSIR importance
    resampling toward the slice where boolean column ``target_col``
    holds. Returns (id_col, n_grams, logw, gumbel_key, rank) for the
    selected documents, rank 1 = highest perturbed weight; ties broken
    by ascending id. ``logw``/``gumbel_key`` are the exact DECIMAL
    totals cast to DOUBLE for the result schema (``exact=True``, the
    oracle harness) or native doubles throughout (``exact=False``,
    production — identical plan, no DECIMAL tax; the selected set can
    differ from the oracle only where float-ordering noise crosses a
    rank boundary). scripts/exact_vs_float_bench.py records the A/B
    timing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # one Arrow FNV pass: the bucketed gram stream feeds THREE
    # consumers (q̂ fit, p̂ fit, per-doc scoring) — localCheckpoint so
    # Catalyst doesn't re-run the hash UDF per consumer (at 10^11-gram
    # scale swap for persist(MEMORY_AND_DISK) or recompute; the
    # trade-off is one hash pass vs the gram stream's footprint)
    g = _bucketed(
        gram_stream(docs, id_col, text_col, extra_cols=(target_col,)),
        buckets).localCheckpoint()
    lr = log_ratio_table(g, target_col, buckets, alpha, exact=exact)
    w = (g.join(F.broadcast(lr), "bkt")
         .groupBy("id")
         .agg(F.count("*").alias("n_grams"),
              F.sum("lr").alias("logw_dec")))
    keyed = w.select(
        "id", "n_grams", "logw_dec",
        gumbel_key_col(F.col("id"), seed, exact=exact).alias("g_dec"),
    ).withColumn("key_dec", F.col("logw_dec") + F.col("g_dec"))
    # TakeOrderedAndProject does the distributed top-k; the rank window
    # then runs over only the k surviving rows.
    topk = keyed.orderBy(F.desc("key_dec"), F.asc("id")).limit(k)
    win = Window.orderBy(F.desc("key_dec"), F.asc("id"))
    return (topk
            .withColumn("rank", F.row_number().over(win).cast("int"))
            .select(F.col("id").alias(id_col), "n_grams",
                    F.col("logw_dec").cast("double").alias("logw"),
                    F.col("key_dec").cast("double").alias("gumbel_key"),
                    "rank"))
