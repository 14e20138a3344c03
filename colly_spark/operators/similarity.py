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
                             multiprobe: int = 8, assign: str = "catalyst",
                             n_tables: int = 1):
    """Embedding-cosine near-duplicate candidate pairs: sign-LSH
    bucket join (+ Hamming-1 multiprobe) → exact cosine ≥ threshold.
    Returns (a, b, cos_sim) with a < b. The bucketed join keeps the
    pair generation ~n/2^bits per probe — never all-pairs — which is
    the 10^9-vector shape; dedup policy on top is one anti-join
    (see q_embedding_dedup). ``n_tables`` unions candidates from that
    many independent hyperplane draws (recall dial — see
    ``ann_lsh_topk``); cross-table duplicate pairs are deduped."""
    from pyspark.sql import functions as F

    if n_tables <= 1:
        planes = hyperplanes(dim, n_bits, seed)
        bucket_of = (lsh_bucket_vec if assign == "vectorized"
                     else lsh_bucket_expr)
        bucket_col = bucket_of(planes, F.col(vec_col))
        base = emb_df.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"),
                             bucket_col.alias("bucket"))
    else:
        planes_list = table_planes(dim, n_bits, n_tables, seed)
        if assign == "vectorized":
            buckets_col = lsh_buckets_multi_vec(planes_list, F.col(vec_col))
        else:
            buckets_col = F.array(*[
                (lsh_bucket_expr(p, F.col(vec_col))
                 + F.lit(t << n_bits)).cast("long")
                for t, p in enumerate(planes_list)])
        base = emb_df.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"),
                             F.explode(buckets_col).alias("bucket"))
    left = base.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
              for j in range(min(multiprobe, n_bits))])
        left = left.select("a", "va", F.explode(probes).alias("bucket"))
    right = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        # single-table: no distinct needed — each vector owns ONE
        # bucket and probe sets are distinct values, so a pair matches
        # exactly once (Hamming-1 XOR is symmetric, so no orientation
        # is missed). Multi-table: dedup the cross-table repeats.
        .select("a", "b", "cos_sim")
    )
    return pairs.distinct() if n_tables > 1 else pairs


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def table_planes(dim: int, n_bits: int, n_tables: int,
                 seed: int = 42) -> list:
    """Independent hyperplane draws for multi-table LSH — table t uses
    the deterministic stream seeded ``seed + t`` (table 0 is exactly
    the single-table ``hyperplanes(dim, n_bits, seed)``, so
    ``n_tables=1`` reproduces the existing plans/oracles bit-for-bit)."""
    return [hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)]


# ---------------------------------------------------------------------------
# production assignment path: broadcast matrix + numpy matmul
#
# The literal-Catalyst assignment expressions below (lsh_bucket_expr /
# ivf_cell_expr) inline every centroid/hyperplane coefficient into the
# plan — perfect for bit-exact SQL oracling, impossible at production
# shapes (nlist ≈ √n ≈ 3·10^4 at 10^9 vectors, dim 512+: the expression
# tree blows past codegen/plan-size limits). The production path ships
# the matrix ONCE as a Spark broadcast and assigns cells/buckets with
# one numpy matmul per Arrow batch — O(batch × dim × nlist) BLAS work,
# no per-row Python, plan size O(1) in nlist. Both paths sit behind the
# same operator signatures via ``assign="catalyst" | "vectorized"``.
# ---------------------------------------------------------------------------


def _broadcast_matrix(mat: np.ndarray):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.sparkContext.broadcast(
        np.ascontiguousarray(mat, dtype=np.float64))


def _stack(vs) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vs])


def lsh_bucket_vec(planes: np.ndarray, vec_col):
    """Vectorized sign-LSH bucket: (batch × dim) @ (dim × bits) matmul,
    sign bits packed into int64. Matrix travels as a broadcast, not as
    plan literals — works at any n_bits/dim."""
    from pyspark.sql import functions as F

    bc = _broadcast_matrix(planes.T)  # (dim, bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf("long")
    def _bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        dots = _stack(vs) @ bc.value
        return pd.Series(((dots > 0) @ weights).astype(np.int64))

    return _bucket(vec_col)


def lsh_buckets_multi_vec(planes_list: list, vec_col):
    """Vectorized multi-table sign-LSH: ONE (batch × dim) @
    (dim × n_tables·n_bits) matmul assigns every table's bucket, each
    tagged with its table id in the high bits (``bucket | t<<n_bits``)
    so a single join key spans all tables. Returns array<long> of
    n_tables tagged buckets per vector."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    n_tables = len(planes_list)
    n_bits = planes_list[0].shape[0]
    stacked = np.concatenate(planes_list, axis=0)  # (tables*bits, dim)
    bc = _broadcast_matrix(stacked.T)
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    tags = (np.arange(n_tables, dtype=np.int64) << n_bits)

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        bits = (_stack(vs) @ bc.value) > 0          # (batch, tables*bits)
        per_t = bits.reshape(len(vs), n_tables, n_bits) @ weights
        return pd.Series(list(per_t + tags))
    return _buckets(vec_col)


def ivf_cell_vec(centroids: np.ndarray, vec_col):
    """Vectorized IVF cell assignment: argmax_j dot(v, centroid_j),
    ties to the smallest j (np.argmax keeps the first maximum — the
    same tie rule as the Catalyst struct-max)."""
    from pyspark.sql import functions as F

    bc = _broadcast_matrix(centroids.T)  # (dim, nlist)

    @F.pandas_udf("int")
    def _cell(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(
            np.argmax(_stack(vs) @ bc.value, axis=1).astype(np.int32))

    return _cell(vec_col)


def ivf_probes_vec(centroids: np.ndarray, nprobe: int, vec_col):
    """Vectorized query-side probe list: the nprobe cells with highest
    dot, ties to the smallest j (stable argsort on -dots)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType

    bc = _broadcast_matrix(centroids.T)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        dots = _stack(vs) @ bc.value
        order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in order])

    return _probes(vec_col)


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
                 dim: int = 64, seed: int = 42, multiprobe: int = 0,
                 assign: str = "catalyst", n_tables: int = 1):
    """Approximate top-k: bucket by sign-LSH, exact cosine within the
    query's bucket only. Returns (query_id, neighbor_id, rank, cos_sim).
    At 10^9-vector scale the bucket join replaces the full cross
    product with a ~1/2^b fraction.

    ``multiprobe``: additionally probe the ``multiprobe`` nearest
    Hamming-1 neighbor buckets (bucket XOR bit j) per query — the
    standard recall/cost dial: each extra probe adds ~1/2^b of the
    corpus to the candidate set. Corpus vectors keep ONE bucket per
    table, so probes never duplicate a candidate pair within a table.

    ``n_tables``: union the candidates of that many INDEPENDENT
    hyperplane draws (seed+t per table) — the orthogonal recall dial:
    recall grows ~linearly in tables (1-(1-p^b)^T for per-bit
    agreement p) where multiprobe explores one table's neighborhood.
    Cost is n_tables× the bucketed-join candidate fraction AND
    n_tables corpus bucket entries (the classic LSH space/recall
    trade). Cross-table duplicate pairs are deduped before ranking
    (cos_sim is deterministic, so a distinct on the rounded value is
    exact). Table 0 with ``n_tables=1`` is bit-identical to the
    pre-existing single-table plan/oracle.

    ``assign="catalyst"`` inlines the hyperplanes as plan literals
    (bit-exact vs the SQL oracle, toy n_bits only);
    ``assign="vectorized"`` broadcasts the plane matrix and assigns
    buckets via numpy matmul in a pandas UDF — the production shape."""
    from pyspark.sql import Window, functions as F

    if n_tables <= 1:
        planes = hyperplanes(dim, n_bits, seed)
        bucket_of = (lsh_bucket_vec if assign == "vectorized"
                     else lsh_bucket_expr)
        c = corpus_df.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            bucket_of(planes, F.col(vec_col)).alias("bucket"))
        q = query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            bucket_of(planes, F.col(vec_col)).alias("bucket"))
    else:
        planes_list = table_planes(dim, n_bits, n_tables, seed)
        if assign == "vectorized":
            buckets_col = lsh_buckets_multi_vec(planes_list, F.col(vec_col))
        else:
            buckets_col = F.array(*[
                (lsh_bucket_expr(p, F.col(vec_col))
                 + F.lit(t << n_bits)).cast("long")
                for t, p in enumerate(planes_list)])
        c = corpus_df.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            F.explode(buckets_col).alias("bucket"))
        q = query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            F.explode(buckets_col).alias("bucket"))
    if multiprobe > 0:
        # XOR of bit j < n_bits flips within the low bucket bits only,
        # so a tagged bucket keeps its table id
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
    if n_tables > 1:
        sims = sims.select("query_id", "neighbor_id", "cos_sim").distinct()
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


def ivf_train_kmeans(emb_df, nlist: int = 16, n_iter: int = 5,
                     vec_col: str = "embedding", dim: int = 64,
                     seed: int = 7, exact: bool = True) -> np.ndarray:
    """Train IVF coarse centroids with distributed spherical k-means
    (Lloyd iterations under cosine similarity): assignment is
    argmax dot against L2-normalized centroids — exactly
    ``ivf_cell_vec``'s rule, so training and serving agree — and the
    update step renormalizes each cell's mean direction.

    Scale shape (10^9 vectors): per iteration, ONE map-side vectorized
    assignment pass (broadcast centroid matmul, no per-row Python) and
    ONE partial-aggregating groupBy over nlist×dim cells — the only
    driver traffic is the nlist×dim centroid matrix itself
    (stats-scale, ≈ the same matrix the serving path broadcasts).
    Empty cells keep their previous centroid. ``exact=True`` is the
    DEFAULT — the same repo-wide oracle-default as train_classifier /
    pagerank / dsir_select, so a caller assuming the family convention
    gets reproducible training here too. Under ``exact=False``
    (production mode, opt-in like the rest of the family) the result
    is deterministic up to float-sum ordering in the cell means (the
    assignment argmax and seeded init are exact);
    ``exact=True`` applies the repo's engine-neutral float
    discipline (operators/classifier.py): each coordinate is rounded
    to 12 dp and summed as DECIMAL(38,18), making the per-cell sums
    order-INDEPENDENT and the trained matrix bit-reproducible by the
    pure numpy/decimal replica (oracle/ivf_ref.py) — the golden-oracle
    harness mode; the DECIMAL tax is its documented price. Serve the
    returned matrix via ``ann_ivf_topk(..., centroids=...)``.

    Init is the seeded Gaussian-direction quantizer (``ivf_centroids``)
    that Lloyd then refines on the data — k-means++ would need
    sequential passes; refined-random converges equivalently for the
    coarse-quantizer use (nlist ≪ n, many points per cell)."""
    from pyspark.sql import functions as F

    cents = ivf_centroids(dim, nlist, seed)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb_df.select(vd.alias("v"))
    for _ in range(n_iter):
        assigned = base.select(
            ivf_cell_vec(cents, F.col("v")).alias("cell"),
            F.posexplode("v").alias("pos", "x"))
        s_expr = (F.sum(F.round(F.col("x"), 12).cast("decimal(38,18)"))
                  if exact else F.sum("x"))
        stats = (assigned.groupBy("cell", "pos")
                 .agg(s_expr.alias("s"), F.count("x").alias("n"))
                 .collect())  # nlist×dim scalars — stats-only traffic
        sums = np.zeros((nlist, dim))
        counts = np.zeros(nlist)
        for r in stats:
            sums[r["cell"], r["pos"]] = float(r["s"])
            counts[r["cell"]] = r["n"]
        nxt = cents.copy()
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(nxt, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = nxt / norms
    return cents


def ann_ivf_topk(corpus_df, query_df, k: int = 10, nlist: int = 16,
                 nprobe: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64, seed: int = 7,
                 assign: str = "catalyst", centroids: np.ndarray = None):
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
    tests/test_training_ops.

    ``assign="catalyst"`` inlines every centroid as a plan literal —
    bit-exact vs the DuckDB oracle but bounded to toy nlist (the
    expression tree is nlist×dim terms). ``assign="vectorized"`` is the
    production path: the centroid matrix ships once as a Spark
    broadcast and assignment is one numpy matmul per Arrow batch —
    works at nlist ≈ √n / dim 512+ where the literal form cannot plan.
    ``centroids`` overrides the seeded harness centroids with an
    offline-trained matrix (the production source)."""
    from pyspark.sql import Window, functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    if assign == "vectorized":
        c = corpus_df.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            ivf_cell_vec(cents, F.col(vec_col)).alias("cell"))
        q = query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            F.explode(
                ivf_probes_vec(cents, nprobe, F.col(vec_col))).alias("cell"))
    else:
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


def semdedup(emb_df, threshold: float, nlist: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, seed: int = 7, assign: str = "catalyst",
             centroids: np.ndarray = None, max_cell_size: int = 100_000,
             warn_oversized: bool = False):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine
    pruning. Cluster the embeddings with the IVF coarse quantizer
    (offline-trained ``centroids`` in production, the seeded harness
    quantizer for the oracle), then inside each cluster drop every
    point whose cosine to a LOWER-id cluster-mate is ≥ ``threshold``
    (keep-first — the same deterministic survivor rule as
    ``embedding_near_dup_pairs``' dedup policy and ``exact_dedup``).
    Returns the survivors as (id_col, cell).

    This is the missing middle between exact dedup (cos = 1) and the
    LSH near-dup path: LSH buckets catch near-IDENTICAL vectors (tiny
    Hamming radius), while SemDeDup's clusters catch semantic
    redundancy at much lower thresholds (paper: 0.7-0.95 on LAION),
    where sign-LSH recall collapses because far-apart-but-similar
    pairs straddle bucket boundaries.

    Scale shape (the paper runs this at LAION-5B scale): cell
    assignment is one map-side pass (broadcast matmul under
    ``assign="vectorized"``); the only shuffle is the equi-join on
    ``cell``; the within-cluster comparison is all-pairs BY DESIGN but
    bounded by cluster size ~ n/nlist (nlist ≈ √n keeps every cluster
    ~√n rows — the paper's tractability argument). A degenerate fat
    cluster (duplicate-heavy corpora produce exactly this) would make
    the join quadratic, so ``max_cell_size`` caps it: cells with more
    members than the cap are EXCLUDED from pair generation (their
    members all survive, un-deduped) — the same cap-and-report
    discipline as minhash's ``candidate_pairs``/``oversized_buckets``
    (text_dedup.py). The truncation is never silent: the returned
    DataFrame carries the (cell, n_members) exclusion report as a
    lazy ``.oversized_cells`` attribute (over the same assignment —
    no second, separately-parameterized call needed), and
    ``warn_oversized=True`` evaluates it eagerly (one extra ≤nlist-row
    agg scan) and raises a RuntimeWarning when any cell was excluded;
    the standalone ``semdedup_oversized_cells`` remains for callers
    that want only the report. Production remedies: more centroids
    (shrinks every cell) or re-clustering the reported cells with a
    sub-quantizer and re-running semdedup on just them
    (``semdedup_two_level``).
    ``max_cell_size=0`` disables the guard (oracle harness only).
    ``assign="catalyst"`` inlines centroid literals (bit-exact DuckDB
    oracling, toy nlist only); ``assign="vectorized"`` broadcasts the
    matrix (production nlist)."""
    from pyspark.sql import functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    cell_of = ivf_cell_vec if assign == "vectorized" else ivf_cell_expr
    base = (emb_df.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
            .withColumn("cell", cell_of(cents, F.col("v"))))
    pairable = base
    over = None
    if max_cell_size > 0:
        # ≤ nlist rows — broadcast the admit-list, never shuffle base twice
        counts = base.groupBy("cell").agg(F.count("*").alias("_n"))
        ok = counts.filter(F.col("_n") <= max_cell_size).select("cell")
        over = (counts.filter(F.col("_n") > max_cell_size)
                .select(F.col("cell").cast("int").alias("cell"),
                        F.col("_n").alias("n_members")))
        pairable = base.join(F.broadcast(ok), "cell", "left_semi")
        if warn_oversized:
            n_over = over.count()  # eager ≤nlist-row agg: one extra scan
            if n_over:
                import warnings
                warnings.warn(
                    f"semdedup: {n_over} cell(s) exceed max_cell_size="
                    f"{max_cell_size} and were EXCLUDED from pair "
                    "generation (members survive un-deduped); remedies: "
                    "more centroids, or semdedup_two_level",
                    RuntimeWarning, stacklevel=2)
    a = pairable.select(F.col("id").alias("a"), F.col("v").alias("va"), "cell")
    b = pairable.select(F.col("id").alias("b"), F.col("v").alias("vb"), "cell")
    dropped = (a.join(b, "cell")
               .where(F.col("b") < F.col("a"))
               .where(F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
                      >= F.lit(threshold))
               .select(F.col("a").alias("id")).distinct())
    out = (base.join(dropped, "id", "left_anti")
           .select(F.col("id").alias(id_col),
                   F.col("cell").cast("int").alias("cell")))
    # the guard's truncation is observable WITHOUT a second,
    # separately-parameterized call: the (cell, n_members) report over
    # the SAME assignment rides along as a lazy attribute (None when
    # the guard is disabled); `warn_oversized=True` additionally
    # evaluates it eagerly and warns
    out.oversized_cells = over
    return out


def semdedup_two_level(emb_df, threshold: float, nlist: int = 16,
                       sub_nlist: int = 4, max_cell_size: int = 100_000,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64, seed: int = 7, sub_seed: int = 101,
                       assign: str = "catalyst",
                       centroids: np.ndarray = None,
                       sub_centroids: np.ndarray = None):
    """SemDeDup with the PRODUCTION fat-cell remedy: instead of
    skipping cells past ``max_cell_size`` (plain ``semdedup``'s
    cap-and-report), their members are re-clustered by an INDEPENDENT
    sub-quantizer (seeded ``sub_seed``; trained sub-centroids in
    production) and deduped within (cell, sub_cell) — each fat cell's
    all-pairs cost drops by ~sub_nlist× while normal cells keep the
    exact level-1 semantics. Returns (id_col, cell, sub_cell);
    sub_cell is NULL for members of normal cells.

    Recall note (the paper's own cluster-restriction trade, one level
    deeper): near-dups straddling a sub-cell boundary inside a fat
    cell are not compared — the same accepted miss class as level-1
    cluster boundaries. A sub-cell that is STILL fat (thousands of
    bit-identical vectors) is exact-dedup's job upstream
    (text_dedup.exact_dedup / caption_dedup); it stays deduped here
    (the pair join runs within it, just quadratically), and
    ``semdedup_two_level_oversized_cells`` reports exactly these
    (cell, sub_cell)s under the same parameters so the residual
    quadratic exposure is detectable before it costs anything.

    Scale shape: adds exactly one map-side sub-assignment pass over
    the fat members and widens the pair-join key to (cell, sub_cell)
    for them — no new shuffle shapes; the fat-cell list is a ≤nlist-row
    broadcast. Lineage note: the assigned base feeds several consumers
    (fat agg, both pair sides, the survivor join), so Catalyst
    re-derives the pruned 2-column scan + matmul assignment per
    consumer — cheap relative to the pair join; at 100 TB persist the
    upstream emb_df (the dsir.py localCheckpoint trade-off,
    recompute-vs-footprint) if the scan itself dominates."""
    from pyspark.sql import functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    sub_cents = sub_centroids if sub_centroids is not None \
        else ivf_centroids(dim, sub_nlist, sub_seed)
    cell_of = ivf_cell_vec if assign == "vectorized" else ivf_cell_expr
    base = (emb_df.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
            .withColumn("cell", cell_of(cents, F.col("v"))))
    fat = (base.groupBy("cell").agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > max_cell_size).select("cell"))
    # sub-assign ONLY fat-cell members (a when() over the full corpus
    # would still run the vectorized pandas UDF on every row —
    # ExtractPythonUDFs hoists it out of the conditional); the
    # normal/fat split is two map-side joins against the ≤nlist-row
    # broadcast, unioned back — no extra shuffle
    normal = (base.join(F.broadcast(fat), "cell", "left_anti")
              .withColumn("sub", F.lit(None).cast("int")))
    fatm = (base.join(F.broadcast(fat), "cell", "left_semi")
            .withColumn("sub", cell_of(sub_cents, F.col("v")).cast("int")))
    tagged = normal.unionByName(fatm)
    # one pair join on the composite key: normal cells compare on
    # (cell, NULL≡NULL) via null-safe equality, fat cells on (cell, sub)
    a = tagged.select(F.col("id").alias("a"), F.col("v").alias("va"),
                      "cell", F.col("sub").alias("sa"))
    b = tagged.select(F.col("id").alias("b"), F.col("v").alias("vb"),
                      "cell", F.col("sub").alias("sb"))
    dropped = (a.join(b, [a["cell"] == b["cell"],
                          a["sa"].eqNullSafe(b["sb"])])
               .where(F.col("b") < F.col("a"))
               .where(F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
                      >= F.lit(threshold))
               .select(F.col("a").alias("id")).distinct())
    return (tagged.join(dropped, "id", "left_anti")
            .select(F.col("id").alias(id_col),
                    F.col("cell").cast("int").alias("cell"),
                    F.col("sub").cast("int").alias("sub_cell")))


def semdedup_oversized_cells(emb_df, nlist: int = 16,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 64, seed: int = 7,
                             assign: str = "catalyst",
                             centroids: np.ndarray = None,
                             max_cell_size: int = 100_000):
    """(cell, n_members) for cells ``semdedup`` would exclude from
    pair generation under the same parameters — callers log these so
    the fat-cell truncation is never silent (the twin of
    text_dedup.oversized_buckets)."""
    from pyspark.sql import functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    cell_of = ivf_cell_vec if assign == "vectorized" else ivf_cell_expr
    return (emb_df.select(cell_of(cents, F.col(vec_col)).alias("cell"))
            .groupBy("cell").agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_cell_size)
            .select(F.col("cell").cast("int").alias("cell"), "n_members"))


def semdedup_two_level_oversized_cells(emb_df, nlist: int = 16,
                                       sub_nlist: int = 4,
                                       max_cell_size: int = 100_000,
                                       id_col: str = "vec_id",
                                       vec_col: str = "embedding",
                                       dim: int = 64, seed: int = 7,
                                       sub_seed: int = 101,
                                       assign: str = "catalyst",
                                       centroids: np.ndarray = None,
                                       sub_centroids: np.ndarray = None):
    """(cell, sub_cell, n_members) for sub-cells that are STILL fat
    after ``semdedup_two_level``'s re-clustering under the same
    parameters — the level-2 twin of ``semdedup_oversized_cells``.
    A non-empty result means the residual miss class documented in
    ``semdedup_two_level`` (its sub-cell pair join stays quadratic in
    that sub-cell) is live for this corpus: the remedies are exact
    dedup upstream (bit-identical floods are exact_dedup's job), a
    larger ``sub_nlist``, or trained sub-centroids. Scale shape: the
    same broadcast fat-list + map-side sub-assignment as the operator
    itself, then one ≤nlist×sub_nlist-row agg — no new shuffles."""
    from pyspark.sql import functions as F

    cents = centroids if centroids is not None \
        else ivf_centroids(dim, nlist, seed)
    sub_cents = sub_centroids if sub_centroids is not None \
        else ivf_centroids(dim, sub_nlist, sub_seed)
    cell_of = ivf_cell_vec if assign == "vectorized" else ivf_cell_expr
    base = (emb_df.select(F.col(vec_col).alias("v"))
            .withColumn("cell", cell_of(cents, F.col("v"))))
    fat = (base.groupBy("cell").agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > max_cell_size).select("cell"))
    fatm = (base.join(F.broadcast(fat), "cell", "left_semi")
            .withColumn("sub", cell_of(sub_cents, F.col("v")).cast("int")))
    return (fatm.groupBy("cell", "sub")
            .agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_cell_size)
            .select(F.col("cell").cast("int").alias("cell"),
                    F.col("sub").alias("sub_cell"), "n_members"))
