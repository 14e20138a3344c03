"""Similarity search over embedding columns (array<float>).

Training-data pipelines attach embeddings to crawled documents/images;
these operators provide nearest-neighbor retrieval at two scale points:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The dot product / norms are computed **JVM-side** with higher-order
  functions (``zip_with`` + ``aggregate``) — no Python in the loop, and
  the left-fold accumulation order is deterministic (bit-identical to
  the DuckDB oracle's ``list_reduce``). The query side is broadcast
  (queries ≪ corpus), so the scan is a single map-side pass over the
  corpus: at 10^9 vectors this is embarrassingly parallel with no
  shuffle except the final per-query top-k (tiny).
- ``ann_lsh_topk``: the scale path — random-hyperplane (sign) LSH:
  vectors bucketed by a b-bit signature; exact cosine evaluated only
  within matching buckets (+ multi-probe via allowing Hamming-1
  neighbors would be the next refinement). Recall < 1 by construction;
  the brute-force operator is the oracle for recall measurement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _dot_expr(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def cosine_expr(a, b):
    """cosine(a, b) as a deterministic JVM-side expression (operands
    cast to double before any arithmetic)."""
    from pyspark.sql import functions as F

    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot_expr(ad, bd) / (F.sqrt(_dot_expr(ad, ad)) * F.sqrt(_dot_expr(bd, bd)))


def cosine_topk(corpus_df, query_df, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k neighbors per query. Returns (query_id, neighbor_id,
    rank, cos_sim) with cos_sim rounded to 6 dp; ties broken by
    neighbor_id for full determinism."""
    from pyspark.sql import Window, functions as F

    q = query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus_df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_pairs(emb_df, threshold: float, n_bits: int = 8,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             dim: int = 64, seed: int = 42,
                             multiprobe: int = 8):
    """Embedding-cosine near-duplicate candidate pairs: sign-LSH
    bucket join (+ Hamming-1 multiprobe) → exact cosine ≥ threshold.
    Returns (a, b, cos_sim) with a < b. The bucketed join keeps the
    pair generation ~n/2^bits per probe — never all-pairs — which is
    the 10^9-vector shape; dedup policy on top is one anti-join
    (see q_embedding_dedup)."""
    from pyspark.sql import functions as F

    planes = hyperplanes(dim, n_bits, seed)
    base = emb_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                         lsh_bucket_expr(planes, F.col(vec_col)).alias("bucket"))
    left = base.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
              for j in range(min(multiprobe, n_bits))])
        left = left.select("a", "va", F.explode(probes).alias("bucket"))
    right = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        # no distinct needed: each vector owns ONE bucket and probe
        # sets are distinct values, so a pair matches exactly once
        # (Hamming-1 XOR is symmetric, so no orientation is missed)
        .select("a", "b", "cos_sim")
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def lsh_bucket_expr(planes: np.ndarray, vec_col):
    """embedding → int64 sign-LSH bucket as a pure-Catalyst expression:
    bit j = sign(dot(v, plane_j)) with the dot computed by the same
    deterministic JVM left-fold as ``cosine_expr`` — whole-stage
    codegen'd, no Python, and bit-identical to the DuckDB oracle's
    ``list_reduce`` (the previous numpy matmul used SIMD/pairwise
    summation, which is not reproducible in SQL)."""
    from functools import reduce

    from pyspark.sql import functions as F

    vd = F.transform(vec_col, lambda x: x.cast("double"))
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bits.append(F.when(_dot_expr(vd, lit_plane) > 0,
                           F.lit(int(1 << j))).otherwise(F.lit(0)))
    return reduce(lambda x, y: x + y, bits).cast("long")


def ann_lsh_topk(corpus_df, query_df, k: int = 10, n_bits: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, seed: int = 42, multiprobe: int = 0):
    """Approximate top-k: bucket by sign-LSH, exact cosine within the
    query's bucket only. Returns (query_id, neighbor_id, rank, cos_sim).
    At 10^9-vector scale the bucket join replaces the full cross
    product with a ~1/2^b fraction.

    ``multiprobe``: additionally probe the ``multiprobe`` nearest
    Hamming-1 neighbor buckets (bucket XOR bit j) per query — the
    standard recall/cost dial: each extra probe adds ~1/2^b of the
    corpus to the candidate set. Corpus vectors keep ONE bucket, so
    probes never duplicate a candidate pair."""
    from pyspark.sql import Window, functions as F

    planes = hyperplanes(dim, n_bits, seed)
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        lsh_bucket_expr(planes, F.col(vec_col)).alias("bucket"))
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        lsh_bucket_expr(planes, F.col(vec_col)).alias("bucket"))
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
              for j in range(min(multiprobe, n_bits))])
        q = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_centroids(dim: int, nlist: int, seed: int = 7) -> np.ndarray:
    """Deterministic L2-normalized coarse-quantizer centroids. A
    production IVF trains these offline (k-means over a sample) and
    passes them in; the harness uses seeded Gaussian directions so the
    DuckDB oracle can inline the exact same constants. The normalization
    happens here in numpy — both engines then see identical literals,
    so there is no cross-engine float-fold concern at this step."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((nlist, dim)).astype(np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_entries(centroids: np.ndarray, vec_col):
    """array<struct<d:double, nj:int>> of (dot(v, c_j), -j) — struct
    ordering makes max = (highest dot, ties → smallest j)."""
    from pyspark.sql import functions as F

    vd = F.transform(vec_col, lambda x: x.cast("double"))
    entries = []
    for j, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(v)) for v in c])
        entries.append(F.struct(_dot_expr(vd, lit_c).alias("d"),
                                F.lit(-j).alias("nj")))
    return F.array(*entries)


def ivf_cell_expr(centroids: np.ndarray, vec_col):
    """embedding → int cell id: argmax_j dot(v, centroid_j), ties to
    the smallest j. Pure Catalyst (same deterministic JVM left-fold
    dot as ``cosine_expr``), whole-stage codegen'd — the corpus-side
    assignment is a map-side pass with NO shuffle and no Python."""
    from pyspark.sql import functions as F

    best = F.array_max(_cell_entries(centroids, vec_col))
    return (-best["nj"]).cast("int")


def ann_ivf_topk(corpus_df, query_df, k: int = 10, nlist: int = 16,
                 nprobe: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64, seed: int = 7):
    """IVF-Flat approximate top-k (the inverted-file counterpart to
    ``ann_lsh_topk``): corpus vectors are assigned to their nearest of
    ``nlist`` coarse centroids map-side; each query probes its
    ``nprobe`` nearest cells and evaluates exact cosine only against
    those cells' members. Returns (query_id, neighbor_id, rank,
    cos_sim).

    Scale shape (10^9 vectors, trained centroids, nlist ≈ √n): cell
    assignment is embarrassingly parallel; the candidate join is
    hash-partitioned on ``cell`` so each probe touches ~n/nlist of the
    corpus; the query side is tiny and broadcast. nprobe is the
    recall/cost dial — recall vs ``cosine_topk`` is asserted in
    tests/test_training_ops."""
    from pyspark.sql import Window, functions as F

    cents = ivf_centroids(dim, nlist, seed)
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        ivf_cell_expr(cents, F.col(vec_col)).alias("cell"))
    # query side: rank ALL cells by dot desc (ties → smallest j) and
    # keep the first nprobe. reverse(array_sort) on struct(d, nj)
    # gives exactly that order; queries ≪ corpus so this stays tiny.
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.slice(F.reverse(F.array_sort(_cell_entries(cents, F.col(vec_col)))),
                1, nprobe).alias("_probes"))
    q = q.select("query_id", "qv",
                 F.explode(F.transform("_probes", lambda s: (-s["nj"]).cast("int")))
                  .alias("cell"))
    sims = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
