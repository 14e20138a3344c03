"""Document deduplication operators for training-data pipelines.

The reference's dedup is URL-level (FNV-64a seen-set, colly.go:1484);
a 100 TB crawl corpus additionally needs *content*-level dedup before
training. These operators extend the same engine over the fetched
document corpus:

- exact dedup: content fingerprint (md5 of whitespace-normalized text)
  → keep lowest doc_id per fingerprint. Pure Catalyst (one shuffle on
  the fingerprint — the minimal possible).
- MinHash + LSH near-dup: word-shingles → n universal min-hashes
  (vectorized numpy over Arrow batches) → banded bucket keys → bucket
  self-join for candidate pairs → exact Jaccard verification. The
  classic Broder construction; at scale the band-bucket groupBy is the
  only wide dependency and is uniformly distributed by construction.
- SimHash: per-token 64-bit hash bit-vote → single int64 per doc;
  near-dups = small Hamming distance. Map-side only.
- n-gram Jaccard: exact set-overlap similarity for given pairs via
  explode + join + agg — fully Catalyst-native (used both standalone
  and as the LSH verification stage).

All Python stages are Arrow-batched pandas UDFs (input_hint: no
per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from colly_spark.functions.urlnorm import fnv64a_batch

# deterministic universal-hash parameters (seeded) for MinHash
_MERSENNE61 = (1 << 61) - 1


def _minhash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE61, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def normalized_fingerprint_cols(text_col):
    """(norm_text, fingerprint) Catalyst expressions: lowercase,
    collapse whitespace, md5. Exactly mirrored by the SQL oracle."""
    from pyspark.sql import functions as F

    norm = F.regexp_replace(F.lower(text_col), r"\s+", " ")
    return norm, F.md5(norm)


def exact_dedup(df, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the lowest-id representative per content fingerprint.
    Returns (fingerprint, keep_id, dup_count)."""
    from pyspark.sql import functions as F

    _, fp = normalized_fingerprint_cols(F.col(text_col))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingles_py(text: str, k: int) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature_udf(n_hashes: int = 64, shingle_k: int = 3, seed: int = 42):
    """text → array<long> MinHash signature. One numpy pass per Arrow
    batch: shingle-hash via the FNV column sweep, then the (a·x+b mod
    Mersenne61) min-reduction vectorized over (shingles × n_hashes)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    a, b = _minhash_params(n_hashes, seed)

    def _sig(texts):
        out = []
        for t in texts:
            sh = shingles_py(t or "", shingle_k)
            if not sh:
                out.append([0] * n_hashes)
                continue
            x = fnv64a_batch(sh).view(np.uint64) % np.uint64(_MERSENNE61)
            with np.errstate(over="ignore"):
                hv = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE61)
            out.append(hv.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return F.pandas_udf(_sig, ArrayType(LongType()))


def lsh_bucket_keys_udf(n_hashes: int = 64, bands: int = 16,
                        shingle_k: int = 3, seed: int = 42):
    """text → array<long> of ``bands`` bucket keys, or NULL for docs
    with no shingles. ONE fused Arrow pass: signature (vectorized
    numpy min-reduction) + per-band FNV-64a of the comma-joined
    signature slice. FNV (not xxhash) so the bucket assignment is
    exactly reproducible by the DuckDB SQL oracle.

    Empty/whitespace-only docs return NULL — on a real crawl corpus
    every empty doc otherwise shares one signature and the band join
    goes quadratic (the degenerate-bucket hazard)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    a, b = _minhash_params(n_hashes, seed)
    rows = n_hashes // bands

    def _keys(texts):
        # two passes: per-doc signature (vectorized over shingles ×
        # hashes), then ONE fnv sweep over every band key in the Arrow
        # batch (a per-row fnv call pays numpy setup cost ~16× per doc)
        starts: list = []
        all_keys: list = []
        for t in texts:
            sh = shingles_py(t or "", shingle_k)
            if not sh:
                starts.append(None)
                continue
            x = fnv64a_batch(sh).view(np.uint64) % np.uint64(_MERSENNE61)
            with np.errstate(over="ignore"):
                hv = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE61)
            sig = hv.min(axis=0).astype(np.int64)
            starts.append(len(all_keys))
            all_keys.extend(
                ",".join(str(int(v)) for v in sig[band * rows:(band + 1) * rows])
                for band in range(bands))
        hashed = (fnv64a_batch(all_keys).view(np.int64)
                  if all_keys else np.zeros(0, dtype=np.int64))
        out = [None if s is None else hashed[s:s + bands].tolist() for s in starts]
        return pd.Series(out)

    return F.pandas_udf(_keys, ArrayType(LongType()))


def lsh_buckets(df, id_col: str = "doc_id", text_col: str = "text",
                n_hashes: int = 64, bands: int = 16, shingle_k: int = 3,
                seed: int = 42):
    """(doc_id, band, bucket) — docs sharing a (band, bucket) are
    near-dup candidates. One UDF pass + posexplode (the previous shape
    unioned ``bands`` projections over the signature — bands× the scan
    work). Empty docs (NULL keys) are dropped — see lsh_bucket_keys_udf."""
    from pyspark.sql import functions as F

    keys = lsh_bucket_keys_udf(n_hashes, bands, shingle_k, seed)
    return (
        df.select(F.col(id_col).alias("doc_id"), keys(F.col(text_col)).alias("_bkeys"))
        .filter(F.col("_bkeys").isNotNull())
        .select("doc_id", F.posexplode("_bkeys").alias("band", "bucket"))
    )


def candidate_pairs(buckets_df, max_bucket_size: int = 1000):
    """Distinct (a, b) a<b doc pairs sharing any LSH bucket — the
    band-join. Self-join on (band, bucket); uniform buckets → no skew.

    ``max_bucket_size`` guards the quadratic blow-up: a (band, bucket)
    with more than this many members (boilerplate/empty-ish docs all
    colliding) contributes member²·bands pairs and is dropped instead —
    at 100 TB one degenerate bucket would otherwise emit ~n² rows.
    Use ``oversized_buckets`` to report what was dropped."""
    from pyspark.sql import functions as F

    if max_bucket_size > 0:
        sizes = buckets_df.groupBy("band", "bucket").agg(F.count("*").alias("_n"))
        keep = sizes.filter(F.col("_n") <= max_bucket_size).select("band", "bucket")
        buckets_df = buckets_df.join(keep, ["band", "bucket"], "left_semi")
    l = buckets_df.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("a"))
    r = buckets_df.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("b"))
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def oversized_buckets(buckets_df, max_bucket_size: int = 1000):
    """The (band, bucket, n_members) rows candidate_pairs would drop —
    callers log these so truncation is never silent."""
    from pyspark.sql import functions as F

    return (buckets_df.groupBy("band", "bucket")
            .agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_bucket_size))


def ngram_jaccard(df, pairs_df, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3):
    """Exact word-k-gram Jaccard for each (a, b) pair — Catalyst-native:
    explode distinct shingles, join on pair membership, count overlap.
    Returns (a, b, inter_n, union_n, jaccard)."""
    from pyspark.sql import functions as F

    # trim first so edge whitespace yields no empty tokens — matches
    # shingles_py/text_quality splits and the DuckDB oracle's
    # string_split_regex(trim(text), ...)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(sh)).alias("shingle"))
    sa = shingled.select(F.col("doc_id").alias("a"), "shingle")
    sb = shingled.select(F.col("doc_id").alias("b"), "shingle")
    pa = pairs_df.join(sa, "a").select("a", "b", "shingle")
    inter = pa.join(sb, ["b", "shingle"]).groupBy("a", "b").agg(
        F.count("*").alias("inter_n"))
    counts = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    out = (
        pairs_df
        .join(counts.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(counts.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .join(inter, ["a", "b"], "left")
        .na.fill({"inter_n": 0})
    )
    from pyspark.sql import functions as F2
    return out.select(
        "a", "b", "inter_n",
        (F2.col("na") + F2.col("nb") - F2.col("inter_n")).alias("union_n"),
        F2.round(F2.col("inter_n") / (F2.col("na") + F2.col("nb") - F2.col("inter_n")), 6).alias("jaccard"),
    )


def simhash_udf(seed: int = 42):
    """text → int64 SimHash: 64-bit FNV per token, bit-vote weighted by
    term frequency. Vectorized numpy (bit matrix unpack + sum)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    def _simhash(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            hv = fnv64a_batch(toks).view(np.uint64)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            # bit b of the result ⇔ votes[b] > 0 — packbits(little)
            # assembles the word in one vector op (no per-bit loop)
            word = np.packbits(votes > 0, bitorder="little").view(np.uint64)[0]
            out[i] = np.int64(word.astype(np.int64))
        return pd.Series(out)

    return F.pandas_udf(_simhash, LongType())


def winnow_udf(k: int = 8, w: int = 4):
    """text → array<struct<pos:int, fp:long>> — document fingerprints
    by winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    algorithm): normalize (lowercase, collapse whitespace), hash every
    char k-gram with FNV-64a, slide a w-window over the hash sequence
    and select each window's MINIMUM (rightmost on ties); the distinct
    selected (position, hash) pairs are the fingerprint set —
    guaranteed to share a fingerprint with any document overlapping in
    ≥ w+k-1 normalized characters.

    Whole computation is map-side inside one Arrow batch (numpy rolling
    FNV: k vector steps; window minima via a strided view — no Python
    per char); at corpus scale the only wide dependency is whatever the
    caller does with the fingerprints (e.g. groupBy(fp) for overlap
    clustering), which is uniformly distributed by construction.
    Documents shorter than k chars yield no fingerprints; with fewer
    than w k-grams the whole sequence is one window."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    out_t = ArrayType(StructType([
        StructField("pos", IntegerType()), StructField("fp", LongType())]))

    def _winnow_one(t: str):
        norm = " ".join((t or "").lower().split())
        # code points, not UTF-8 bytes: positions are character
        # positions and the hash folds ord(char) per char — matching
        # the DuckDB oracle's ord(substr(t,i,1)) on non-ASCII text
        data = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32)
        n = len(data) - k + 1
        if n <= 0:
            return []
        # rolling FNV-64a of every k-gram: k vectorized steps
        h = np.full(n, 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = (h ^ data[j:j + n].astype(np.uint64)) * prime
        hs = h.view(np.int64)
        if n <= w:
            # single window over the whole (short) sequence
            pos = int(np.flatnonzero(hs == hs.min())[-1])
            return [(pos + 1, int(hs[pos]))]
        win = np.lib.stride_tricks.sliding_window_view(hs, w)
        # rightmost minimum per window: argmin over the reversed view
        right_idx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        sel = np.arange(len(win)) + right_idx
        pairs = sorted({(int(p) + 1, int(hs[p])) for p in sel})
        return pairs

    def _winnow(texts):
        return pd.Series([_winnow_one(t) for t in texts])

    return F.pandas_udf(_winnow, out_t)


def near_dup_pairs_minhash(df, id_col: str = "doc_id", text_col: str = "text",
                           threshold: float = 0.7, n_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 3, seed: int = 42):
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify →
    pairs with jaccard ≥ threshold."""
    from pyspark.sql import functions as F

    buckets = lsh_buckets(df, id_col, text_col, n_hashes, bands, shingle_k, seed)
    pairs = candidate_pairs(buckets)
    verified = ngram_jaccard(df, pairs, id_col, text_col, shingle_k)
    return verified.filter(F.col("jaccard") >= threshold)


def connected_components(vertices_df, pairs_df, id_col: str = "doc_id",
                         a_col: str = "id_a", b_col: str = "id_b",
                         max_iter: int = 25, algorithm: str = "label"):
    """Near-dup cluster assignment: connected components over a pair
    graph. Returns (id_col, cluster_id) for EVERY vertex, cluster_id =
    min member id.

    ``algorithm="label"`` (default): iterative min-label propagation.
    Scale shape: edges are symmetrized once and persisted hash-
    partitioned on src; each round is one equi-join + one min-groupBy
    on the same key (AQE coalesces the tiny tail), and the label frame
    is localCheckpoint'ed so the plan does not compound across rounds.
    Rounds needed = graph diameter — near-dup graphs are
    overwhelmingly tiny cliques/chains (diameter ≤ ~3), where this is
    the cheapest shape (2-3 rounds, no edge rewriting).

    ``algorithm="star"``: the alternating large-star/small-star rounds
    of Kiveris et al. (Connected Components in MapReduce and Beyond,
    SoCC'14) — the adversarial-diameter path. Each round REWIRES the
    edge set toward the component minimum instead of propagating
    labels along fixed edges, so a diameter-d chain converges in
    O(log d) rounds instead of d. Same join/groupBy primitives, same
    localCheckpoint lineage discipline; both paths return identical
    labels (pinned by tests/test_training_ops long-chain equality).
    Convergence is detected by a stable (count, hash-sum) signature of
    the oriented edge set (one scalar action per round)."""
    from pyspark.sql import functions as F

    if algorithm == "star":
        labels, _rounds = _cc_star(vertices_df, pairs_df, id_col,
                                   a_col, b_col, max_iter)
        return labels

    sym = pairs_df.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")) \
        .unionByName(pairs_df.select(F.col(b_col).alias("src"),
                                     F.col(a_col).alias("dst")))
    edges = sym.repartition("src").persist()
    labels = vertices_df.select(F.col(id_col).alias("id"),
                                F.col(id_col).cast("long").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (edges.join(labels, edges["dst"] == labels["id"])
               .groupBy("src").agg(F.min("label").alias("nmin")))
        new = (labels.join(nbr, labels["id"] == nbr["src"], "left")
               .select(labels["id"],
                       F.least(F.col("label"),
                               F.coalesce(F.col("nmin"), F.col("label")))
                       .alias("label")))
        new = new.localCheckpoint(eager=True)
        cur_sum = new.agg(F.sum("label")).collect()[0][0]
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col),
                         F.col("label").alias("cluster_id"))


def _cc_star(vertices_df, pairs_df, id_col: str, a_col: str, b_col: str,
             max_iter: int = 25):
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14 §3). Returns (labels_df, rounds_run).

    Invariants per round (ids compared as longs):
    - large-star: for every node u, every STRICTLY LARGER neighbor v is
      re-pointed at m(u) = min(Γ(u) ∪ {u}); output edges are oriented
      (child > parent) and self-loop-free by construction (m ≤ u < v).
    - small-star: over the oriented edges, every node u with parents
      P(u) re-points P(u) ∪ {u} at m = min(P(u)) — one equi-groupBy +
      one join, output stays oriented.
    Each is one shuffle on the node key; edge count never grows beyond
    2|E| and monotonically collapses toward the star. At convergence
    every non-minimum node carries exactly one oriented edge to its
    component minimum. O(log d) rounds on a diameter-d graph vs the
    label-propagation body's d."""
    from pyspark.sql import functions as F

    oriented = (pairs_df.select(
        F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("hi"),
        F.least(F.col(a_col), F.col(b_col)).cast("long").alias("lo"))
        .filter(F.col("hi") != F.col("lo")).distinct())
    oriented = oriented.localCheckpoint(eager=True)

    def _sig(df):
        # (count, xor-of-hashes): order-independent, overflow-free
        # (ANSI sum(long) can overflow), collision-safe enough for a
        # convergence check over a DISTINCT edge set
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("h")).collect()[0]
        return row["n"], row["h"]

    prev = _sig(oriented)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized view
        sym = oriented.select("hi", "lo").unionByName(
            oriented.select(F.col("lo").alias("hi"), F.col("hi").alias("lo")))
        m = sym.groupBy(F.col("hi").alias("u")).agg(
            F.min("lo").alias("nmin"))
        m = m.select("u", F.least("nmin", "u").alias("m"))
        large = (sym.join(m, sym["hi"] == m["u"])
                 .filter(F.col("lo") > F.col("hi"))
                 .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
                 .distinct())
        # small-star over the oriented output
        sm = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (large.join(sm, "hi")
                 .select(F.col("lo").alias("child"), F.col("m"))
                 .filter(F.col("child") != F.col("m"))
                 .select(F.col("child").alias("hi"), F.col("m").alias("lo"))
                 .unionByName(sm.select(F.col("hi"), F.col("m").alias("lo")))
                 .distinct())
        oriented = small.localCheckpoint(eager=True)
        cur = _sig(oriented)
        if cur == prev:
            break
        prev = cur

    parents = oriented.groupBy(F.col("hi").alias("id")).agg(
        F.min("lo").alias("root"))
    return (vertices_df.select(F.col(id_col).cast("long").alias("id"))
            .join(parents, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("root", "id").alias("cluster_id")),
            rounds)


def remove_duplicate_spans(df, k: int = 5, id_col: str = "doc_id",
                           text_col: str = "text"):
    """Cross-document duplicate-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    occurrence of a duplicated k-token span is cut except the globally
    first one (min (doc_id, pos)); overlapping cuts union. Returns
    (doc_id, clean_text, n_kept, n_removed) with clean_text rebuilt
    from the surviving tokens in document order.

    Scale shape: one explode to ~n_tokens gram rows, ONE groupBy keyed
    by gram text (count + min-struct keeper in the same aggregation),
    a join back over duplicated grams only, a distinct on covered
    (doc, pos), an anti-join, and a per-document rebuild whose state is
    bounded by document size. No all-pairs comparison anywhere; at the
    production k (~50) the gram stream is near-unique so the groupBy
    has no skew. Pure Catalyst — zero Python in the hot path.
    """
    from pyspark.sql import functions as F

    from colly_spark.operators.text_quality import tokens_expr

    t = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), t.alias("t"),
                     F.size(t).alias("ntok"))
    toks = base.select("id", "ntok", F.posexplode("t").alias("pos", "tok"))
    gram = F.concat_ws(
        " ", *[F.element_at("t", F.col("pos") + F.lit(j + 1))
               for j in range(k)])
    grams = (base.filter(F.col("ntok") >= k)
             .select("id",
                     F.explode(F.sequence(
                         F.lit(0), F.col("ntok") - F.lit(k))).alias("pos"),
                     "t")
             .select("id", "pos", gram.alias("gram")))
    stats = grams.groupBy("gram").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("id", "pos")).alias("keep"))
    removed = (grams.join(stats.filter(F.col("cnt") >= 2), "gram")
               .filter(~((F.col("id") == F.col("keep.id"))
                         & (F.col("pos") == F.col("keep.pos"))))
               .select("id", "pos"))
    covered = removed.select(
        "id", F.explode(F.sequence(
            F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("pos")
    ).distinct()
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"]), " ").alias("clean_text"),
        F.count("*").alias("n_kept"),
        F.first("ntok").alias("ntok"))
    ids = df.select(F.col(id_col).alias("id"),
                    F.size(tokens_expr(F.col(text_col))).alias("ntok0"))
    return (ids.join(rebuilt, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
                    (F.col("ntok0") - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


def decontaminate(df, bench_df, k: int = 5, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Benchmark decontamination (GPT-3 style, Brown et al. 2020
    App. C): flag every corpus document sharing at least one k-token
    span with a benchmark/eval set; reports the distinct shared-span
    count per document so thresholds other than >0 are a filter away.

    Scale shape: the benchmark side is distinct k-grams from a small
    eval set — broadcast; corpus grams stream map-side through the
    broadcast hash join (no corpus-side shuffle for the match), then
    one distinct + one groupBy keyed by doc. The corpus is never
    self-joined and never collected.
    """
    from pyspark.sql import functions as F

    from colly_spark.operators.text_quality import _gram_frame

    grams_c = _gram_frame(df, id_col, text_col, (k,)).select("id", "gram")
    grams_b = (_gram_frame(bench_df, id_col, text_col, (k,))
               .select("gram").distinct())
    hits = (grams_c.join(F.broadcast(grams_b), "gram")
            .select("id", "gram").distinct())
    agg = hits.groupBy("id").agg(
        F.count("*").cast("long").alias("n_shared_grams"))
    return (df.select(F.col(id_col).alias("id"))
            .join(agg, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("n_shared_grams", F.lit(0)).cast("long")
                    .alias("n_shared_grams"),
                    (F.coalesce("n_shared_grams", F.lit(0)) > 0)
                    .alias("contaminated")))
