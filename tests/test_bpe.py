"""Distributed BPE training/encoding (operators/bpe.py) vs the
independent pure-Python reference (oracle/bpe_ref.py) on inputs the
golden files don't cover.

Pins:
- merge sequence equality (rank, lhs, rhs, merged, pair_count) on a
  hand-sized corpus AND on the sf0.001 documents table;
- early stop when the best pair count drops below min_count;
- encode equality (token + distinct-symbol counts) under the learned
  merges;
- hand-checked KAT: the classic 'low/lower' corpus from the BPE paper.
"""

from colly_spark.operators.bpe import encode_with_merges, train_bpe
from colly_spark.oracle import bpe_ref

SF = "/root/testdata/sf0.001"

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower widest widest widest"),
    (2, "newest newest newest newest newest newest"),
    (3, "the quick brown fox the lazy dog the end"),
    (4, ""),
    (5, "aaa aaa aab"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spark_merges(spark, rows, n, mc=2):
    return [tuple(r) for r in
            train_bpe(_df(spark, rows), n_merges=n, min_count=mc)
            .orderBy("rank").collect()]


def test_matches_reference_synthetic(spark):
    texts = [t for _i, t in CORPUS]
    assert _spark_merges(spark, CORPUS, 25) == bpe_ref.train(texts, 25)


def test_matches_reference_sf0001(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        " ORDER BY doc_id").fetchall()
    texts = [t for _i, t in rows]
    got = _spark_merges(spark, rows, 15)
    assert got == bpe_ref.train(texts, 15)


def test_early_stop_below_min_count(spark):
    # every word unique, every pair count 1 → zero merges at min_count=2
    rows = [(0, "ab cd ef"), (1, "gh ij kl")]
    assert _spark_merges(spark, rows, 10, mc=2) == []
    # and with min_count=1 the tie-break is lexicographic
    m = _spark_merges(spark, rows, 3, mc=1)
    assert m == bpe_ref.train(["ab cd ef", "gh ij kl"], 3, min_count=1)
    assert m[0][1:4] == ("a", "b", "ab")  # smallest pair first


def test_sennrich_kat(spark):
    # the paper's shape: 'newest' (x6) dominates → first merges build
    # 'est</w>' from the most frequent adjacent pairs
    texts = [t for _i, t in CORPUS]
    ref = bpe_ref.train(texts, 4)
    assert [m[3] for m in ref][:3] == ["es", "est", "est</w>"]
    assert _spark_merges(spark, CORPUS, 4) == ref


def test_encode_matches_reference(spark):
    texts = [t for _i, t in CORPUS]
    merges = bpe_ref.train(texts, 25)
    rows = [tuple(r) for r in
            encode_with_merges(
                _df(spark, CORPUS),
                train_bpe(_df(spark, CORPUS), n_merges=25).collect())
            .orderBy("doc_id").collect()]
    exp = [(i, n, d) for (i, _t), (n, d)
           in zip(CORPUS, bpe_ref.encode_texts(texts, merges))]
    assert rows == exp
