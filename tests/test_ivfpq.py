"""IVF-PQ (operators/pq.py) — product-quantized ANN.

Pins, strongest first:

- engine/replica BIT equality: pq_encode's (cell, codes) and both
  ann_ivfpq_topk branches (raw-ADC and exact-refine) reproduce the
  independent numpy replica (oracle/ivfpq_ref.py) exactly — the same
  replica that writes the golden oracle, so a pass here means the
  driver's sf0.01 gate is pinned by construction too;
- exactness limit: with every cell probed and refine ≥ corpus size,
  the refined output EQUALS exact cosine_topk row-for-row (ADC only
  prunes, the re-rank is the exact operator);
- refine monotonicity: exact re-rank recall ≥ raw-ADC recall on the
  sf0.001 embeddings (0.29 vs 0.11 measured — the weakly-separated
  synthetic vectors bound the ceiling at 0.45 for nprobe=4/16, same
  data caveat as tests/test_ann_training.py);
- training signal: pq_train_codebooks halves (3.3× measured) the
  mean residual reconstruction error ‖r − B[code]‖² vs the seeded
  codebooks — the Lloyd objective itself, data-independent evidence
  that the distributed trainer learns.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from colly_spark.operators.pq import (ann_ivfpq_topk, pq_codebooks,
                                      pq_encode, pq_train_codebooks)
from colly_spark.operators.similarity import cosine_topk, ivf_centroids
from colly_spark.oracle import ivfpq_ref

SF = "/root/testdata/sf0.001"
DIM, NLIST, M, NBITS = 64, 16, 8, 4


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_corpus():
    import duckdb
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
        " ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return ids, vecs


@pytest.fixture(scope="module")
def quantizers():
    return (ivf_centroids(DIM, NLIST, seed=7),
            pq_codebooks(DIM, M, NBITS, seed=11))


def test_encode_matches_replica(spark, emb, np_corpus, quantizers):
    cents, books = quantizers
    ids, vecs = np_corpus
    got = {r["id"]: (r["cell"], tuple(r["codes"]))
           for r in pq_encode(emb, cents, books).collect()}
    cells, codes = ivfpq_ref.encode(vecs, cents, books)
    assert len(got) == len(ids)
    for n, i in enumerate(ids):
        assert got[i] == (cells[n], tuple(codes[n]))


def test_codes_shape_and_range(spark, emb, quantizers):
    cents, books = quantizers
    rows = pq_encode(emb, cents, books).collect()
    for r in rows:
        assert 0 <= r["cell"] < NLIST
        assert len(r["codes"]) == M
        assert all(0 <= c < (1 << NBITS) for c in r["codes"])


def test_adc_topk_matches_replica(spark, emb, np_corpus, quantizers):
    cents, books = quantizers
    ids, vecs = np_corpus
    q = emb.filter(F.col("vec_id") < 8)
    got = sorted(map(tuple, ann_ivfpq_topk(
        emb, q, k=5, nlist=NLIST, m=M, nbits=NBITS, nprobe=4,
        dim=DIM).collect()))
    want = sorted(ivfpq_ref.topk(ids, vecs, ids[ids < 8], cents, books,
                                 k=5, nprobe=4, refine=0))
    assert got == want  # bit-exact, doubles included


def test_refined_matches_replica(spark, emb, np_corpus, quantizers):
    cents, books = quantizers
    ids, vecs = np_corpus
    q = emb.filter(F.col("vec_id") < 8)
    got = sorted(map(tuple, ann_ivfpq_topk(
        emb, q, k=5, nlist=NLIST, m=M, nbits=NBITS, nprobe=4,
        dim=DIM, refine=24).collect()))
    want = sorted(ivfpq_ref.topk(ids, vecs, ids[ids < 8], cents, books,
                                 k=5, nprobe=4, refine=24))
    assert got == want


def test_full_probe_full_refine_is_exact(spark, emb):
    """nprobe=nlist + refine ≥ corpus: ADC prunes nothing, so the
    refined result must equal exact cosine_topk row-for-row."""
    q = emb.filter(F.col("vec_id") < 8)
    approx = sorted(map(tuple, ann_ivfpq_topk(
        emb, q, k=5, nlist=NLIST, m=M, nbits=NBITS, nprobe=NLIST,
        dim=DIM, refine=10 ** 6).collect()))
    exact = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    assert approx == exact


def _recall_vs_exact(spark, emb, result_df, k=5) -> float:
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 16),
                        k=k).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in result_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / sum(len(v) for v in truth.values())


def test_refine_beats_raw_adc(spark, emb):
    q = emb.filter(F.col("vec_id") < 16)
    kw = dict(k=5, nlist=NLIST, m=M, nbits=NBITS, nprobe=4, dim=DIM)
    raw = _recall_vs_exact(spark, emb, ann_ivfpq_topk(emb, q, **kw))
    ref = _recall_vs_exact(spark, emb,
                           ann_ivfpq_topk(emb, q, refine=24, **kw))
    assert ref >= raw + 0.05  # 0.29 vs 0.11 measured


def test_trained_codebooks_cut_reconstruction_error(spark, emb,
                                                    np_corpus,
                                                    quantizers):
    cents, seeded = quantizers
    ids, vecs = np_corpus
    trained = pq_train_codebooks(emb, cents, m=M, nbits=NBITS, n_iter=4)
    assert trained.shape == seeded.shape

    def err(books):
        cells, codes = ivfpq_ref.encode(vecs, cents, books)
        resid = (vecs - cents[cells]).reshape(len(vecs), M, DIM // M)
        rec = books[np.arange(M)[None, :], codes]
        return float(((resid - rec) ** 2).sum(axis=(1, 2)).mean())

    e_seed, e_train = err(seeded), err(trained)
    assert e_train < 0.5 * e_seed  # 0.88 vs 2.91 measured


def test_deterministic_across_runs(spark, emb):
    q = emb.filter(F.col("vec_id") < 4)
    kw = dict(k=5, nlist=NLIST, m=M, nbits=NBITS, nprobe=4, dim=DIM)
    a = sorted(map(tuple, ann_ivfpq_topk(emb, q, **kw).collect()))
    b = sorted(map(tuple, ann_ivfpq_topk(
        emb.repartition(7), q, **kw).collect()))
    assert a == b  # batch composition never changes emitted bits
