"""Hand-computed KATs for the CCNet-style bigram LM (operators/lm.py)
plus invariants for the deterministic global training-order shuffle.
The oracle gate (test_entry_oracle: lm_perplexity / global_shuffle /
caption_dedup) proves Spark==DuckDB; these pin the intended semantics
on inputs small enough to compute by hand."""

from __future__ import annotations

import math


def _ppl(spark, train_rows, score_rows, alpha=0.1):
    from colly_spark.operators.lm import lm_perplexity, train_bigram_lm

    tdf = spark.createDataFrame(train_rows, "doc_id long, text string")
    sdf = spark.createDataFrame(score_rows, "doc_id long, text string")
    c_bi, c_h, vocab = train_bigram_lm(tdf)
    out = lm_perplexity(sdf, c_bi, c_h, vocab, alpha=alpha)
    return {r["doc_id"]: (r["n_tokens"], r["ppl"]) for r in out.collect()}


class TestBigramLMKATs:
    def test_fully_seen_document(self, spark):
        # train: "a b" -> bigrams (<s>,a),(a,b); V = {a,b} = 2
        # score "a b": P(a|<s>) = (1+.1)/(1+.2) = 11/12
        #              P(b|a)   = (1+.1)/(1+.2) = 11/12
        # ppl = exp(-mean ln p) = 12/11
        got = _ppl(spark, [(0, "a b")], [(10, "a b")])
        n, ppl = got[10]
        assert n == 2
        assert ppl == round(12 / 11, 4)

    def test_unseen_word_hits_uniform_floor(self, spark):
        # train "a b"; score "c": bigram (<s>,c) — history <s> seen
        # once, continuation unseen: P = 0.1/(1+0.2) = 1/12, ppl = 12
        got = _ppl(spark, [(0, "a b")], [(10, "c")])
        assert got[10] == (1, 12.0)

    def test_unseen_history(self, spark):
        # score "a z q": (<s>,a) = 11/12; (a,z) = .1/1.2 = 1/12;
        # (z,q): history z untrained -> P = .1/(0+.1*2) = 1/2
        got = _ppl(spark, [(0, "a b")], [(10, "a z q")])
        n, ppl = got[10]
        expected = math.exp(-(math.log(11 / 12) + math.log(1 / 12)
                              + math.log(1 / 2)) / 3)
        assert n == 3
        assert ppl == round(expected, 4)

    def test_reference_reads_lower_ppl_than_gibberish(self, spark):
        train = [(i, "the cat sat on the mat") for i in range(3)]
        got = _ppl(spark, train,
                   [(10, "the cat sat on the mat"), (11, "zz qq ww rr pp kk")])
        assert got[10][1] < got[11][1]

    def test_case_folded(self, spark):
        got = _ppl(spark, [(0, "A b")], [(10, "a B"), (11, "a b")])
        assert got[10] == got[11]


class TestGlobalShuffle:
    def test_permutation_and_determinism(self, spark):
        import __spark_entry__ as entry

        sf = "/root/testdata/sf0.001"
        a = entry.queries()["global_shuffle"](spark, sf).collect()
        b = entry.queries()["global_shuffle"](spark, sf).collect()
        n = len(a)
        ranks = sorted(r["shuffle_rank"] for r in a)
        assert ranks == list(range(n))  # dense permutation, no gaps
        # deterministic across runs (resumable-epoch property)
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # actually shuffled: rank order differs from doc_id order
        by_rank = [r["doc_id"] for r in sorted(a, key=lambda r: r["shuffle_rank"])]
        assert by_rank != sorted(by_rank)


class TestCaptionDedup:
    def test_whitespace_and_case_fold_into_one_group(self, spark):
        from pyspark.sql import functions as F

        imgs = spark.createDataFrame(
            [(1, "A  Dog "), (2, "a dog"), (3, "a cat")],
            "image_id long, caption string")
        norm = F.regexp_replace(F.lower(F.trim(F.col("caption"))), r"\s+", " ")
        out = (imgs.select("image_id", norm.alias("caption_norm"))
               .groupBy("caption_norm")
               .agg(F.min("image_id").alias("keep_id"),
                    F.count("*").alias("n_dups"))
               .collect())
        got = {r["caption_norm"]: (r["keep_id"], r["n_dups"]) for r in out}
        assert got == {"a dog": (1, 2), "a cat": (3, 1)}
