"""Distributed unigram-LM tokenizer training + encoding (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates" — the SentencePiece unigram family,
the other production tokenizer next to BPE). Hard-EM/Viterbi variant so
every quantity is exactly reproducible; the shared spec lives in
oracle/unigram_ref.py's module docstring and both implementations
follow it independently (same discipline as operators/bpe.py vs
oracle/bpe_ref.py).

Scale shape at 100 TB:

- the corpus collapses ONCE to the distinct-word count table (the same
  two-level compression as BPE training: 10^11 tokens → 10^7-10^9
  words); everything after is over words;
- seeding is one substring explode + one groupBy(piece) integer sum
  (pure Catalyst — substr enumeration is a nested transform/flatten,
  no Python), capped by a TakeOrderedAndProject (seed_size rows to the
  driver — the vocabulary is small by definition, that's the point of
  a tokenizer);
- each EM round is map-side Viterbi (Arrow UDF, vocab log-probs
  broadcast in the closure, per-batch word cache) + one explode +
  one groupBy(piece) integer sum; the only driver traffic is the
  vocab-sized count table (≤ seed_size + |alphabet| rows per round);
- M-step / pruning arithmetic is driver-side over that small table —
  integer counts, so no float nondeterminism crosses the boundary;
- encoding is embarrassingly parallel (broadcast final vocab).

The oracle is a GOLDEN parquet from the independent pure-Python
reference (oracle/unigram_ref.py via scripts/make_golden.py) — the
iterate-segment-prune loop is not one SQL statement, the same golden
discipline as `bpe_train`/`crawl_trace`.
"""

from __future__ import annotations

import math
import re

import pandas as pd

# ASCII whitespace exactly as tokens_expr's Java-regex \s splits —
# Python str.split() would also split Unicode whitespace (NBSP, NEL)
# and diverge from the Spark-side word table on non-ASCII text
_WS = re.compile(r"[ \t\n\x0b\x0c\r]+")


def _viterbi(word: str, logp: dict, max_piece_len: int) -> list:
    """Best segmentation per the shared spec (oracle/unigram_ref.py):
    DP left to right, strict improvement with j ascending, so ties
    prefer the smallest split point (longest final piece). ONE
    implementation closed over by both the training E-step UDF and
    encode — the tie-break rule the oracle parity depends on must not
    exist twice."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -math.inf:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    pieces, i = [], n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def word_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(word, c): distinct lowercased whitespace tokens with counts."""
    from pyspark.sql import functions as F

    from colly_spark.operators.text_quality import tokens_expr

    return (docs
            .select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
            .filter(F.col("word") != "")
            .select(F.lower("word").alias("word"))
            .groupBy("word").agg(F.count("*").alias("c")))


def _substring_scores(words, max_piece_len: int):
    """(piece, score): every substring of length ≤ max_piece_len,
    scored Σ word_count × occurrences — pure Catalyst."""
    from pyspark.sql import functions as F

    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.transform(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.length("word") - i + 1)),
            lambda l: F.substring(F.col("word"), i, l))))
    return (words.select(F.explode(subs).alias("piece"), "c")
            .groupBy("piece").agg(F.sum("c").alias("score")))


def _viterbi_udf(logp: dict, max_piece_len: int):
    """Arrow UDF: word → Viterbi piece array under broadcast log-probs.
    DP per the shared spec: left-to-right, strict improvement with j
    ascending (ties prefer the smallest split point)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def seg(word: pd.Series) -> pd.Series:
        cache: dict = {}

        def vit(w):
            got = cache.get(w)
            if got is None:
                got = cache[w] = _viterbi(w, logp, max_piece_len)
            return got

        return word.map(vit)

    return seg


def _logprobs(counts: dict) -> dict:
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def _estep(words, counts: dict, max_piece_len: int) -> dict:
    """Distributed E-step: Viterbi counts over the word table —
    map-side segment + one groupBy(piece); the collected result is
    vocab-sized (≤ |counts| rows of (piece, int))."""
    from pyspark.sql import functions as F

    seg = _viterbi_udf(_logprobs(counts), max_piece_len)
    rows = (words.select(F.explode(seg(F.col("word"))).alias("piece"), "c")
            .groupBy("piece").agg(F.sum("c").alias("used"))
            .collect())
    return {r["piece"]: int(r["used"]) for r in rows}


def train_unigram(docs, vocab_size: int = 150, seed_size: int = 300,
                  max_piece_len: int = 5, n_rounds: int = 4,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Learn a unigram-LM vocabulary. Returns a DataFrame
    (piece, count, logp) — logp rounded to 9 dp — ordered by piece."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    words = word_table(docs, id_col, text_col).localCheckpoint()
    scores = _substring_scores(words, max_piece_len)
    chars = scores.filter(F.length("piece") == 1).collect()
    multi = (scores.filter(F.length("piece") > 1)
             .orderBy(F.desc("score"), F.asc("piece"))
             .limit(seed_size).collect())
    counts = {r["piece"]: int(r["score"]) for r in chars}
    counts.update({r["piece"]: int(r["score"]) for r in multi})
    for _ in range(n_rounds):
        used = _estep(words, counts, max_piece_len)
        mlist = sorted(((p, c) for p, c in used.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        if len(mlist) > vocab_size:
            mlist = mlist[:max(vocab_size, int(len(mlist) * 0.75))]
        counts = {p: max(used.get(p, 0), 1)
                  for p in counts if len(p) == 1}
        counts.update(dict(mlist))
    used = _estep(words, counts, max_piece_len)
    final = {p: max(used.get(p, 0), 1) for p in counts if len(p) == 1}
    final.update({p: c for p, c in used.items() if len(p) > 1})
    logp = _logprobs(final)
    rows = sorted((p, c, round(logp[p], 9)) for p, c in final.items())
    return spark.createDataFrame(
        rows, "piece string, count bigint, logp double")


def encode_with_vocab(docs, vocab_rows, max_piece_len: int = 5,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Encode every document with a learned vocab (rows of
    (piece, count, logp)). Returns (id_col, n_pieces,
    n_distinct_pieces) — map-side only, vocab broadcast in the Arrow
    UDF closure with a per-batch word cache."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    counts = {r["piece"]: int(r["count"]) for r in vocab_rows}
    logp = _logprobs(counts)
    out_t = StructType([StructField("n_pieces", LongType()),
                        StructField("n_distinct_pieces", LongType())])

    @F.pandas_udf(out_t)
    def enc(text: pd.Series) -> pd.DataFrame:
        cache: dict = {}

        def vit(w):
            got = cache.get(w)
            if got is None:
                got = cache[w] = _viterbi(w, logp, max_piece_len)
            return got

        ns, ds = [], []
        for t in text.fillna(""):
            n, seen = 0, set()
            for w in _WS.split(t):
                w = w.lower()
                if not w:
                    continue
                pieces = vit(w)
                n += len(pieces)
                seen.update(pieces)
            ns.append(n)
            ds.append(len(seen))
        return pd.DataFrame({"n_pieces": ns, "n_distinct_pieces": ds})

    return docs.select(F.col(id_col), enc(F.col(text_col)).alias("e")) \
               .select(id_col, "e.n_pieces", "e.n_distinct_pieces")
