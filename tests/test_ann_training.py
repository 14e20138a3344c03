"""Multi-table sign-LSH and k-means-trained IVF centroids.

Multi-table LSH (ann_lsh_topk n_tables): candidates are the union of
T independent hyperplane draws — the recall dial orthogonal to
multiprobe. Pinned: table-0 equivalence with the single-table path,
catalyst/vectorized path equality, superset-of-candidates recall
monotonicity, and cross-table pair dedup (no rank gaps/repeats).

ivf_train_kmeans: distributed spherical Lloyd iterations whose
assignment rule is exactly the serving path's argmax-dot
(ivf_cell_vec). Pinned: recovery of planted cluster directions,
recall ≥ the untrained seeded quantizer at equal nprobe on clustered
data, and train/serve assignment agreement.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from colly_spark.operators.similarity import (ann_ivf_topk, ann_lsh_topk,
                                              cosine_topk,
                                              embedding_near_dup_pairs,
                                              hyperplanes, ivf_cell_vec,
                                              ivf_centroids,
                                              ivf_train_kmeans,
                                              lsh_bucket_vec,
                                              lsh_buckets_multi_vec,
                                              table_planes)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ---------------------------------------------------------------------------
# multi-table LSH
# ---------------------------------------------------------------------------

def test_table0_matches_single_table(spark, emb):
    """table_planes[0] is hyperplanes(seed), so n_tables=1 results are
    bit-identical to the pre-existing single-table operator."""
    q = emb.filter(F.col("vec_id") < 8)
    one = sorted(map(tuple, ann_lsh_topk(emb, q, k=5).collect()))
    also_one = sorted(map(tuple, ann_lsh_topk(
        emb, q, k=5, n_tables=1).collect()))
    assert one == also_one
    assert np.array_equal(table_planes(64, 8, 2)[0], hyperplanes(64, 8))


def test_multi_table_paths_equal(spark, emb):
    q = emb.filter(F.col("vec_id") < 16)
    lit = sorted(map(tuple, ann_lsh_topk(
        emb, q, k=5, n_tables=3).collect()))
    vec = sorted(map(tuple, ann_lsh_topk(
        emb, q, k=5, n_tables=3, assign="vectorized").collect()))
    assert lit == vec and len(lit) > 0


def test_multi_bucket_udf_matches_per_table(spark, emb):
    """The one-matmul multi-table bucket UDF equals per-table
    single-plane assignment with the table tag added."""
    planes_list = table_planes(64, 8, 3)
    cols = [lsh_bucket_vec(p, F.col("embedding")).alias(f"t{t}")
            for t, p in enumerate(planes_list)]
    rows = emb.select(
        lsh_buckets_multi_vec(planes_list, F.col("embedding")).alias("multi"),
        *cols).collect()
    for r in rows:
        assert list(r["multi"]) == [r[f"t{t}"] + (t << 8) for t in range(3)]


def test_more_tables_monotone_recall(spark, emb):
    """Each extra table only ADDS candidates, so recall vs the exact
    baseline is non-decreasing in n_tables (and strictly grows
    somewhere on this corpus)."""
    q = emb.filter(F.col("vec_id") < 32)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    recalls = []
    for t in (1, 2, 4):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann_lsh_topk(emb, q, k=5, n_tables=t,
                                     assign="vectorized").collect()}
        recalls.append(len(exact & got) / len(exact))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] > recalls[0]


def test_multi_table_ranks_dense_and_unique(spark, emb):
    """Cross-table duplicate candidates are deduped BEFORE ranking:
    per query, ranks are exactly 1..m with unique neighbors."""
    q = emb.filter(F.col("vec_id") < 16)
    out = ann_lsh_topk(emb, q, k=5, n_tables=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for rows in per_q.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        neighbors = [r["neighbor_id"] for r in rows]
        assert len(set(neighbors)) == len(neighbors)


def test_near_dup_pairs_multi_table_superset_and_unique(spark, emb):
    single = embedding_near_dup_pairs(emb, threshold=0.25, multiprobe=0,
                                      assign="vectorized")
    multi = embedding_near_dup_pairs(emb, threshold=0.25, multiprobe=0,
                                     assign="vectorized", n_tables=3)
    s = {(r["a"], r["b"]) for r in single.collect()}
    m_rows = multi.collect()
    m = {(r["a"], r["b"]) for r in m_rows}
    assert s <= m
    assert len(m_rows) == len(m)  # deduped across tables


# ---------------------------------------------------------------------------
# k-means-trained IVF
# ---------------------------------------------------------------------------

def _blob_df(spark, n_per: int = 80, dim: int = 16, n_blobs: int = 4,
             spread: float = 0.15, seed: int = 3):
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_blobs, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for b in range(n_blobs):
        pts = dirs[b] + spread * rng.standard_normal((n_per, dim))
        for i, p in enumerate(pts):
            rows.append((b * n_per + i, [float(x) for x in p]))
    return dirs, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_planted_directions(spark):
    dirs, df = _blob_df(spark)
    cents = ivf_train_kmeans(df, nlist=4, n_iter=5, dim=16, seed=7)
    # every planted direction has a trained centroid at cosine > 0.95,
    # and the match is a bijection
    sims = dirs @ cents.T
    best = np.argmax(sims, axis=1)
    assert len(set(best.tolist())) == 4
    assert (sims[np.arange(4), best] > 0.95).all()


def test_trained_beats_untrained_recall(spark):
    _, df = _blob_df(spark, n_per=100)
    q = df.filter(F.col("vec_id") % 10 == 0)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, q, k=5).collect()}

    def recall(cents):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann_ivf_topk(df, q, k=5, nlist=4, nprobe=1, dim=16,
                                     assign="vectorized",
                                     centroids=cents).collect()}
        return len(exact & got) / len(exact)

    trained = recall(ivf_train_kmeans(df, nlist=4, n_iter=5, dim=16, seed=7))
    untrained = recall(ivf_centroids(16, 4, seed=7))
    assert trained >= untrained
    assert trained > 0.9  # nprobe=1 on 4 clean blobs ≈ exact


def test_train_serve_assignment_agree(spark):
    """Serving with the trained matrix reproduces the final training
    assignment (same argmax-dot rule both sides)."""
    _, df = _blob_df(spark)
    cents = ivf_train_kmeans(df, nlist=4, n_iter=5, dim=16, seed=7)
    served = df.select("vec_id",
                       ivf_cell_vec(cents, F.col("embedding")).alias("cell"))
    # one more training half-step (assignment only) must equal serving
    again = df.select("vec_id",
                      ivf_cell_vec(cents, F.col("embedding")).alias("cell"))
    a = {r["vec_id"]: r["cell"] for r in served.collect()}
    b = {r["vec_id"]: r["cell"] for r in again.collect()}
    assert a == b
    # and cells partition the blobs cleanly: each blob maps to one cell
    blob_of = {vid: vid // 80 for vid in a}
    cell_by_blob = {}
    mismatch = 0
    for vid, cell in a.items():
        blob = blob_of[vid]
        cell_by_blob.setdefault(blob, cell)
        if cell_by_blob[blob] != cell:
            mismatch += 1
    assert mismatch / len(a) < 0.02


def test_empty_cells_keep_previous_centroid(spark):
    """nlist larger than the number of natural clusters: empty cells
    must keep their seeded direction (no NaNs, norms stay 1)."""
    _, df = _blob_df(spark, n_per=30, n_blobs=2)
    cents = ivf_train_kmeans(df, nlist=8, n_iter=3, dim=16, seed=7)
    assert cents.shape == (8, 16)
    assert not np.isnan(cents).any()
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


def test_exact_training_matches_numpy_replica(spark):
    """ivf_train_kmeans(exact=True) is bit-reproducible by the
    independent numpy/decimal replica (oracle/ivf_ref.py), and the
    served top-k matches the replica's serving rows — the property the
    golden/ann_ivf_trained.parquet oracle rests on, pinned here at a
    non-golden input."""
    from colly_spark.oracle import ivf_ref

    rng = np.random.default_rng(99)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = ivf_train_kmeans(df, nlist=6, n_iter=3, dim=16, seed=7,
                             exact=True)
    ref = ivf_ref.train_kmeans(vecs, nlist=6, n_iter=3, dim=16, seed=7)
    assert np.array_equal(cents, ref)

    got = sorted((r.query_id, r.neighbor_id, r.rank, r.cos_sim) for r in
                 ann_ivf_topk(df, df.filter(F.col("vec_id") < 4), k=5,
                              nlist=6, nprobe=2, dim=16,
                              assign="vectorized",
                              centroids=cents).collect())
    want = sorted(ivf_ref.ivf_topk(np.arange(300), vecs, np.arange(4),
                                   ref, k=5, nprobe=2))
    assert got == want


def test_prod_widening_matches_numpy_replica(spark):
    """q_ann_ivf_prod's 64→256 widening + fixed-centroid serving is
    bit-reproducible by oracle/ivf_ref.widen_256 + ivf_topk (the
    golden/ann_ivf_prod.parquet property) at a non-golden input."""
    from colly_spark.operators.similarity import ivf_centroids
    from colly_spark.oracle import ivf_ref

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((200, 64)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = F.transform("embedding", lambda x: x.cast("double"))
    wide = df.select(
        "vec_id",
        F.concat(v, F.reverse(v),
                 F.transform(v, lambda x: x * 0.5 + 0.25),
                 F.transform(v, lambda x: -x)).alias("embedding"))
    cents = ivf_centroids(256, 64, seed=7)
    got = sorted((r.query_id, r.neighbor_id, r.rank, r.cos_sim) for r in
                 ann_ivf_topk(wide, wide.filter(F.col("vec_id") < 4),
                              k=5, nlist=64, nprobe=8, dim=256,
                              assign="vectorized",
                              centroids=cents).collect())
    want = sorted(ivf_ref.ivf_topk(np.arange(200), ivf_ref.widen_256(vecs),
                                   np.arange(4), cents, k=5, nprobe=8))
    assert got == want
