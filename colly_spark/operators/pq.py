"""IVF-PQ: product-quantized approximate nearest neighbor search
(Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) — the memory-scale ANN tier above IVF-Flat.

Why it exists at 10^9+ vectors: raw float32 embeddings at dim 512 are
2 KiB/vector — a 10^9-vector corpus is 2 TB that must be re-shuffled
into probed cells on every query batch.  PQ stores each vector as
``m`` one-byte codes (m=8..64): 8-64 bytes/vector, a 30-250× shrink,
so every executor holds its cell shard's codes in memory and the
probe join moves codes, never floats.  IVF-Flat
(similarity.ann_ivf_topk) stays the within-cell EXACT tier; IVF-PQ
scans codes with per-query lookup tables (ADC — asymmetric distance
computation, §IV.A of the paper) and touches raw vectors again only
for the optional exact re-rank of the few best candidates per query.

Decomposition (all rules deterministic, ties to the smallest index):

- coarse cell: ``argmax_j dot(v, centroid_j)`` — IDENTICAL to
  IVF-Flat's rule (similarity.ivf_cell_vec), so the two tiers share
  coarse quantizers and cell layouts;
- residual: ``r = v − centroid_cell``, split into ``m`` contiguous
  ``dim/m``-dim subvectors;
- code_j: ``argmin_k ‖r_j − B_j[k]‖²`` over the 2^nbits codewords of
  subspace j's codebook;
- ADC score: ``dot(q, v̂) = dot(q, c_cell) + Σ_j dot(q_j, B_j[code_j])``
  (v̂ the reconstruction; dot is linear, so the per-query table
  ``T[j,k] = dot(q_j, B_j[k])`` is cell-independent and costs
  m × 2^nbits dots ONCE per query, after which each candidate is one
  fancy-indexed table sum — no vector arithmetic per candidate).

Scale shape: encode is an embarrassingly parallel stacked-matmul pass
(plan size O(1) in nlist/m/ksub — the broadcast-matrix discipline of
similarity.py's vectorized path); the candidate join hash-partitions
on ``cell`` (~n/nlist rows per probe); ADC scoring is numpy
fancy-indexing inside the Arrow batch; only ``refine`` candidates per
query ever touch the raw-vector table again, via one id equi-join.

Oracle discipline (the ann_ivf/ann_ivf_trained split): seeded harness
codebooks (``pq_codebooks``) make the whole pipeline bit-exact against
a plain-numpy replica → golden oracle ``ann_ivfpq``; the distributed
trainer (``pq_train_codebooks``) is the production source, exact up to
float-sum order in the Lloyd update, pinned by planted-structure
recall tests instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from colly_spark.operators.similarity import (_broadcast_matrix, _stack,
                                              cosine_expr, ivf_centroids,
                                              ivf_cell_vec, ivf_probes_vec)


def pq_codebooks(dim: int, m: int, nbits: int, seed: int = 11) -> np.ndarray:
    """Deterministic seeded codebooks, shape (m, 2^nbits, dim/m) — the
    harness stand-in for trained codebooks (same discipline as
    similarity.ivf_centroids: both engine and replica see identical
    constants).  Scaled to residual magnitude (≈ unit vectors minus
    unit centroids → O(1) coordinates split over m subspaces)."""
    assert dim % m == 0, "dim must divide into m subspaces"
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (m, 1 << nbits, dim // m)).astype(np.float64) / np.sqrt(dim // m)


def pq_codes_vec(centroids: np.ndarray, books: np.ndarray, vec_col, cell_col):
    """Vectorized PQ encoding: residual vs the row's coarse centroid,
    then per-subspace nearest codeword (``argmin ‖r_j − B_j[k]‖²``,
    ties → smallest k via np.argmin's first-minimum).  One einsum per
    Arrow batch; matrices travel as broadcasts."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType

    m, ksub, dsub = books.shape
    bc_c = _broadcast_matrix(centroids)          # (nlist, dim)
    bc_b = _broadcast_matrix(books)              # (m, ksub, dsub)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _codes(vs: pd.Series, cells: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        resid = _stack(vs) - bc_c.value[cells.to_numpy()]
        rs = resid.reshape(len(vs), m, dsub)
        b3 = bc_b.value
        # ‖r−B‖² argmin ≡ argmin(‖B‖² − 2 r·B); ‖r‖² is constant per (row, j)
        prod = np.einsum("bjd,jkd->bjk", rs, b3)
        d2 = (b3 * b3).sum(axis=2)[None, :, :] - 2.0 * prod
        return pd.Series(list(d2.argmin(axis=2).astype(np.int32)))

    return _codes(vec_col, cell_col)


def pq_encode(emb_df, centroids: np.ndarray, books: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Corpus → its PQ index rows (id, cell, codes): the table that
    replaces raw vectors at serving time (m × int per vector — stored
    as int32 here for Arrow simplicity; a byte column at deployment).
    Map-side only: no shuffle, no driver traffic."""
    from pyspark.sql import functions as F

    base = emb_df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"))
    base = base.withColumn("cell", ivf_cell_vec(centroids, F.col("v")))
    return base.select(
        "id", "cell",
        pq_codes_vec(centroids, books, F.col("v"), F.col("cell"))
        .alias("codes"))


def pq_train_codebooks(emb_df, centroids: np.ndarray, m: int = 8,
                       nbits: int = 4, n_iter: int = 5,
                       vec_col: str = "embedding",
                       seed: int = 11) -> np.ndarray:
    """Distributed per-subspace Lloyd k-means over coarse residuals —
    the production codebook trainer.  Per iteration: ONE map-side
    vectorized assignment pass (the serving path's own ``pq_codes_vec``
    rule, so training and serving agree) and ONE partial-aggregating
    groupBy over (subspace, code, coord) cells; the only driver traffic
    is the m × 2^nbits × dim/m stats matrix (k-scale, not n-scale).
    Empty codes keep their previous codeword.  Deterministic up to
    float-sum ordering in the cell means (assignment argmax/argmin and
    the seeded init are exact) — the same caveat as
    similarity.ivf_train_kmeans, and why the golden-oracled query uses
    seeded codebooks while THIS path is pinned by recall tests."""
    from pyspark.sql import functions as F

    dim = centroids.shape[1]
    dsub = dim // m
    ksub = 1 << nbits
    books = pq_codebooks(dim, m, nbits, seed)
    base = (emb_df.select(F.col(vec_col).alias("v"))
            .withColumn("cell", ivf_cell_vec(centroids, F.col("v"))))
    bc_c = _broadcast_matrix(centroids)
    sub_idx = np.arange(m)
    for _ in range(n_iter):
        bc_b = _broadcast_matrix(books)

        # map-side PARTIAL aggregation: each Arrow batch reduces to at
        # most m×ksub×dsub (j, code, d, s, n) rows via np.add.at, so
        # the shuffle/groupBy moves k-scale stats, never n-scale rows
        def _partials(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                resid = (_stack(pdf["v"])
                         - bc_c.value[pdf["cell"].to_numpy()]).reshape(
                    len(pdf), m, dsub)
                b3 = bc_b.value
                prod = np.einsum("bjd,jkd->bjk", resid, b3)
                d2 = (b3 * b3).sum(axis=2)[None, :, :] - 2.0 * prod
                cd = d2.argmin(axis=2)                     # (B, m)
                sums = np.zeros((m, ksub, dsub))
                counts = np.zeros((m, ksub), dtype=np.int64)
                np.add.at(sums, (sub_idx[None, :], cd), resid)
                np.add.at(counts, (sub_idx[None, :], cd), 1)
                j_i, c_i = np.nonzero(counts)
                rows = {"j": np.repeat(j_i, dsub),
                        "code": np.repeat(c_i, dsub),
                        "d": np.tile(np.arange(dsub), len(j_i)),
                        "s": sums[j_i, c_i].ravel(),
                        "n": np.repeat(counts[j_i, c_i], dsub)}
                yield pd.DataFrame(rows)

        stats = (base.mapInPandas(
                    _partials,
                    schema="j int, code int, d int, s double, n long")
                 .groupBy("j", "code", "d")
                 .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                 .collect())  # m×ksub×dsub scalars — stats-only traffic
        sums = np.zeros((m, ksub, dsub))
        counts = np.zeros((m, ksub))
        for r in stats:
            sums[r["j"], r["code"], r["d"]] = r["s"]
            counts[r["j"], r["code"]] = r["n"]
        nxt = books.copy()
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty][:, None]
        books = nxt
    return books


def adc_scores(joined_df, centroids: np.ndarray, books: np.ndarray):
    """(query_id, qv, cell, neighbor_id, codes) → (query_id,
    neighbor_id, adc): per Arrow batch, one lookup table per distinct
    query (m × 2^nbits dots, cell-independent) plus a per-(query, cell)
    bias dot(q, centroid); every candidate is then one fancy-indexed
    table sum — no per-candidate vector math."""
    m, ksub, dsub = books.shape
    bc_c = _broadcast_matrix(centroids)
    bc_b = _broadcast_matrix(books)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                    "neighbor_id": pd.Series([], dtype="int64"),
                                    "adc": pd.Series([], dtype="float64")})
                continue
            qids, first, qinv = np.unique(pdf["query_id"].to_numpy(),
                                          return_index=True,
                                          return_inverse=True)
            qmat = _stack(pdf["qv"].iloc[first])          # (Q, dim)
            # batch-shape-INDEPENDENT float ops only: per-query einsum
            # (fixed m×ksub×dsub shape) and per-row vector dots, so the
            # emitted bits never depend on how the join distributed
            # rows into Arrow batches (the replica mirrors these calls
            # exactly — a batched dgemm would reorder summation per
            # batch shape and jitter the last ulp)
            tables = np.stack([
                np.einsum("jd,jkd->jk", q.reshape(m, dsub), bc_b.value)
                for q in qmat])                           # (Q, m, ksub)
            cells = pdf["cell"].to_numpy()
            codes = np.stack([np.asarray(c, dtype=np.int64)
                              for c in pdf["codes"]])     # (B, m)
            t_rows = tables[qinv]                         # (B, m, ksub)
            sub = np.take_along_axis(
                t_rows, codes[:, :, None], axis=2)[:, :, 0]
            bias = np.array([np.dot(qmat[qi], bc_c.value[c])
                             for qi, c in zip(qinv, cells)])
            adc = bias + sub.sum(axis=1)
            yield pd.DataFrame({"query_id": pdf["query_id"].to_numpy(),
                                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                                "adc": adc})

    return joined_df.select("query_id", "qv", "cell", "neighbor_id",
                            "codes").mapInPandas(
        _score, schema="query_id long, neighbor_id long, adc double")


def ann_ivfpq_topk(corpus_df, query_df, k: int = 10, nlist: int = 16,
                   m: int = 8, nbits: int = 4, nprobe: int = 4,
                   refine: int = 0, id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64,
                   seed: int = 7, pq_seed: int = 11,
                   centroids: np.ndarray = None, books: np.ndarray = None):
    """IVF-PQ approximate top-k: encode the corpus to (cell, codes),
    probe each query's ``nprobe`` best cells, ADC-score codes, keep the
    top-k per query by (adc desc, neighbor_id).  ``refine > 0`` takes
    the top-``refine`` ADC candidates instead and re-ranks them by
    EXACT cosine against the raw vectors (one id equi-join — the only
    step that touches floats again), returning cos_sim; ``refine = 0``
    returns the raw ADC approximation as ``adc_sim``.  Pass trained
    ``centroids``/``books`` in production; the seeded defaults are the
    bit-exact oracle harness."""
    from pyspark.sql import Window, functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    bks = books if books is not None else pq_codebooks(dim, m, nbits, pq_seed)

    codes = pq_encode(corpus_df, cents, bks, id_col, vec_col) \
        .withColumnRenamed("id", "neighbor_id")
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(ivf_probes_vec(cents, nprobe, F.col(vec_col)))
        .alias("cell"))
    joined = (codes.join(F.broadcast(q), "cell")
              .filter(F.col("neighbor_id") != F.col("query_id")))
    scored = adc_scores(joined, cents, bks)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if refine <= 0:
        return (ranked.filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.col("adc").alias("adc_sim")))
    cand = ranked.filter(F.col("rank") <= refine) \
        .select("query_id", "neighbor_id")
    c = corpus_df.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("cv"))
    q2 = query_df.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv2"))
    exact = (cand.join(c, "neighbor_id").join(F.broadcast(q2), "query_id")
             .withColumn("cos_sim",
                         F.round(cosine_expr(F.col("cv"), F.col("qv2")), 6)))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))
