"""Unigram-LM tokenizer training (operators/unigram.py vs the
independent pure-Python reference oracle/unigram_ref.py, Kudo 2018
hard-EM variant). The sf0.01 oracle gate is
test_entry_oracle[unigram_train]/[unigram_encode]; here: replica
equality on other inputs, the Viterbi/seed/prune laws by hand, and
determinism."""

from __future__ import annotations

import math

import pytest

from colly_spark.oracle import unigram_ref as ref


TEXTS = ["the cat sat on the mat", "the bat and the cat chat",
         "matting and batting on the mat", "a cat a mat a bat",
         "chattering cats batting mats"] * 3 + ["unique zebra quiver"]


# ---------- reference laws (pure python) --------------------------------

def test_seed_vocab_scores_and_cap():
    wc = {"aba": 2, "ab": 1}
    seeds = ref.seed_vocab(wc, seed_size=2, max_piece_len=3)
    # chars: a = 2*2+1 = 5, b = 2+1 = 3
    assert seeds["a"] == 5 and seeds["b"] == 3
    # multi: ab = 2+1=3, ba = 2, aba = 2 -> top-2 by (count desc, asc)
    assert set(p for p in seeds if len(p) > 1) == {"ab", "aba"}
    assert seeds["ab"] == 3 and seeds["aba"] == 2


def test_viterbi_prefers_higher_logprob_and_tie_breaks_left():
    logp = {"a": math.log(0.25), "b": math.log(0.25),
            "ab": math.log(0.5)}
    assert ref.viterbi("abab", logp, 2) == ["ab", "ab"]
    # exact tie between ["ab","ab"] and ... none here; force one:
    # p(ab) = p(a)*p(b) -> "ab" vs "a","b" tie; smallest split point
    # wins the DP (strict >), i.e. the FIRST candidate found: j=0
    # gives piece "ab" at i=2 before j=1 offers "b"
    logp2 = {"a": math.log(0.5), "b": math.log(0.5),
             "ab": math.log(0.25)}
    assert ref.viterbi("ab", logp2, 2) == ["ab"]


def test_single_char_coverage_always_segments():
    vocab = ref.train(["zzz aaa"], vocab_size=2, seed_size=2,
                      max_piece_len=3, n_rounds=2)
    logp = {p: lp for p, _c, lp in vocab}
    # any word over the alphabet segments
    assert ref.viterbi("zaza", logp, 3)


def test_prune_keeps_single_chars_and_caps_multi():
    vocab = ref.train(TEXTS, vocab_size=5, seed_size=50,
                      max_piece_len=4, n_rounds=3)
    chars = {p for p, _c, _l in vocab if len(p) == 1}
    multi = [p for p, _c, _l in vocab if len(p) > 1]
    # every char that appears in the corpus survives
    corpus_chars = set("".join(w for t in TEXTS for w in t.lower().split()))
    assert corpus_chars <= chars
    assert len(multi) <= 50  # pruned well below the seed population


# ---------- Spark operator ≡ reference ----------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")


def test_train_matches_reference_bit_exact(spark, docs):
    from colly_spark.operators.unigram import train_unigram

    want = ref.train(TEXTS, vocab_size=20, seed_size=40,
                     max_piece_len=4, n_rounds=3)
    got = sorted((r["piece"], r["count"], r["logp"])
                 for r in train_unigram(docs, vocab_size=20, seed_size=40,
                                        max_piece_len=4,
                                        n_rounds=3).collect())
    assert got == want


def test_encode_matches_reference(spark, docs):
    from colly_spark.operators.unigram import (encode_with_vocab,
                                               train_unigram)

    vocab_df = train_unigram(docs, vocab_size=20, seed_size=40,
                             max_piece_len=4, n_rounds=3)
    vocab_rows = vocab_df.collect()
    want = ref.encode_texts(
        TEXTS, [(r["piece"], r["count"], r["logp"]) for r in vocab_rows],
        max_piece_len=4)
    got = encode_with_vocab(docs, vocab_rows, max_piece_len=4) \
        .orderBy("doc_id").collect()
    assert [(r["n_pieces"], r["n_distinct_pieces"]) for r in got] == want


def test_train_matches_reference_on_sf0001(spark):
    from colly_spark.operators.unigram import train_unigram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.orderBy("doc_id").collect()]
    want = ref.train(texts, vocab_size=30, seed_size=60,
                     max_piece_len=5, n_rounds=2)
    got = sorted((r["piece"], r["count"], r["logp"])
                 for r in train_unigram(docs, vocab_size=30, seed_size=60,
                                        max_piece_len=5,
                                        n_rounds=2).collect())
    assert got == want


def test_unicode_whitespace_parity(spark):
    """NBSP/NEL must NOT split words (the engine's Java-regex \\s is
    ASCII-only): train and encode stay bit-equal to the reference on
    text with Unicode whitespace."""
    from colly_spark.operators.unigram import (encode_with_vocab,
                                               train_unigram)

    texts = ["foo bar baz", "foo bar qux", "plain words here",
             "neljoined too"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    want = ref.train(texts, vocab_size=10, seed_size=20,
                     max_piece_len=4, n_rounds=2)
    vdf = train_unigram(docs, vocab_size=10, seed_size=20,
                        max_piece_len=4, n_rounds=2)
    got = sorted((r["piece"], r["count"], r["logp"]) for r in vdf.collect())
    assert got == want
    # the NBSP stays inside its word in the shared word table
    assert "foo bar" in ref.word_counts(texts)
    enc_want = ref.encode_texts(texts, want, max_piece_len=4)
    enc_got = encode_with_vocab(docs, vdf.collect(), max_piece_len=4) \
        .orderBy("doc_id").collect()
    assert [(r["n_pieces"], r["n_distinct_pieces"])
            for r in enc_got] == enc_want


def test_train_is_deterministic(spark, docs):
    from colly_spark.operators.unigram import train_unigram

    a = train_unigram(docs, vocab_size=10, seed_size=20, max_piece_len=3,
                      n_rounds=2).collect()
    b = train_unigram(docs, vocab_size=10, seed_size=20, max_piece_len=3,
                      n_rounds=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
