"""N-gram language-model perplexity scoring for corpus curation.

CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data") trains a small
LM on a trusted reference slice and scores every crawled document by
perplexity — low-ppl documents read like the reference, high-ppl ones
are boilerplate/gibberish. CCNet uses a KenLM 5-gram; here the same
pipeline shape is expressed as a pure-Catalyst add-alpha (Lidstone)
bigram model so the whole thing — training AND scoring — is two scans,
two aggregations, and two equi-joins that whole-stage-codegen at any
corpus size, with an exactly-equivalent DuckDB SQL oracle.

Scale shape at 100 TB:

- training: one explode over the reference slice's token stream +
  one groupBy((hist, tok)) — shuffle volume is the reference corpus'
  token stream, keyed by gram text (near-uniform);
- history counts derive from the bigram table (groupBy(hist)), never
  a second scan of the text;
- vocabulary size is a 1-row aggregate cross-joined back (no driver
  collect, stays lazy);
- scoring: one explode over the scored corpus + left equi-joins
  against the count tables (broadcast when the LM fits, shuffle-hash
  otherwise; AQE handles probe-side skew on frequent grams) + one
  groupBy(doc). No Python in the path, no windows, no cartesians.
"""

from __future__ import annotations

# Lidstone smoothing mass; small so unseen bigrams are penalized hard
DEFAULT_ALPHA = 0.1

START = "<s>"


def _bigram_stream(df, id_col: str, text_col: str):
    """(id, hist, tok) rows: the lowercased token bigram stream of each
    document with a ``<s>`` start symbol, built from ONE scan via a
    per-row transform + explode (same single-pass shape as
    text_quality._gram_frame). Empty/whitespace docs emit exactly one
    ('<s>', '') bigram — mirrored by the SQL oracle, where
    string_split_regex('') also yields one empty token."""
    from pyspark.sql import functions as F

    from colly_spark.operators.text_quality import tokens_expr

    t = F.transform(tokens_expr(F.col(text_col)), F.lower)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: F.struct(
            F.when(i == F.lit(1), F.lit(START))
             .otherwise(F.element_at(t, i - F.lit(1))).alias("hist"),
            F.element_at(t, i).alias("tok")))
    return (df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("g"))
            .select("id", F.col("g.hist").alias("hist"),
                    F.col("g.tok").alias("tok")))


def train_bigram_lm(ref_docs, id_col: str = "doc_id", text_col: str = "text"):
    """Count-based bigram LM from a reference corpus.

    Returns ``(bigram_counts, hist_counts, vocab)`` DataFrames:
    ``bigram_counts(hist, tok, c_bi)``, ``hist_counts(hist, c_h)``
    (derived from the bigram table — c_h(w) = Σ_tok c_bi(w, tok), so
    the two tables are consistent by construction), and the 1-row
    ``vocab(v)`` = distinct continuation-token count (the Lidstone
    event-space size). All lazy — nothing is collected."""
    from pyspark.sql import functions as F

    big = _bigram_stream(ref_docs, id_col, text_col)
    c_bi = big.groupBy("hist", "tok").agg(F.count("*").alias("c_bi"))
    c_h = c_bi.groupBy("hist").agg(F.sum("c_bi").alias("c_h"))
    vocab = c_bi.agg(F.countDistinct("tok").alias("v"))
    return c_bi, c_h, vocab


def lm_perplexity(docs, c_bi, c_h, vocab, alpha: float = DEFAULT_ALPHA,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Per-document bigram perplexity under the trained LM.

    P(tok|hist) = (c_bi + alpha) / (c_h + alpha·V) — add-alpha
    smoothing, so unseen histories degrade to the uniform 1/V floor.
    Output: (id_col, n_tokens, ppl) with ppl = exp(-mean ln P),
    rounded to 4 dp for engine-neutral hashing (double accumulation
    order contributes ~1e-13 relative error; the round absorbs it).
    """
    from pyspark.sql import functions as F

    big = _bigram_stream(docs, id_col, text_col)
    scored = (big
              .join(c_bi, ["hist", "tok"], "left")
              .join(c_h, ["hist"], "left")
              .crossJoin(F.broadcast(vocab))
              .select(
                  "id",
                  F.log(
                      (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(alpha))
                      / (F.coalesce(F.col("c_h"), F.lit(0))
                         + F.lit(alpha) * F.col("v"))).alias("lp")))
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.exp(-F.avg("lp")), 4).alias("ppl"))
            .select(F.col("id").alias(id_col), "n_tokens", "ppl"))


def lm_score_corpus(docs, ref_filter_col, alpha: float = DEFAULT_ALPHA,
                    id_col: str = "doc_id", text_col: str = "text"):
    """End-to-end CCNet shape: train on ``docs`` rows where
    ``ref_filter_col`` (a boolean Column) holds, score ALL rows.
    The reference slice is read from the same scan Catalyst already
    plans for scoring — no second source pass."""
    c_bi, c_h, vocab = train_bigram_lm(
        docs.filter(ref_filter_col), id_col, text_col)
    return lm_perplexity(docs, c_bi, c_h, vocab, alpha, id_col, text_col)
