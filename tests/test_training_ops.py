"""Unit tests for the training-data pipeline operators that have no
SQL oracle: MinHash/LSH near-dup recall, SimHash locality, ANN-LSH
recall vs brute force, multimodal decode plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """100 base docs + 20 near-dup copies (every 5th doc with one token
    in ~15 changed) + 1 exact dup. Deterministic."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(100):
        toks = [words[rng.randrange(len(words))] for _ in range(60)]
        rows.append((i, " ".join(toks)))
    base = dict(rows)
    for i in range(0, 100, 5):
        toks = base[i].split()
        toks[7] = "CHANGED"
        rows.append((1000 + i, " ".join(toks)))
    rows.append((2000, base[3]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_near_dup_recall(spark, near_dup_docs):
    from colly_spark.operators.text_dedup import near_dup_pairs_minhash

    found = near_dup_pairs_minhash(near_dup_docs, threshold=0.6).collect()
    pairs = {(r["a"], r["b"]) for r in found}
    expected = {(i, 1000 + i) for i in range(0, 100, 5)} | {(3, 2000)}
    # LSH with 16 bands × 4 rows catches jaccard≥0.6 pairs w.h.p.
    missing = expected - pairs
    assert not missing, f"missed near-dup pairs: {missing}"
    # verification stage kills false positives: every reported pair
    # must genuinely have jaccard ≥ 0.6
    for r in found:
        assert r["jaccard"] >= 0.6


def test_exact_dup_has_jaccard_1(spark, near_dup_docs):
    from colly_spark.operators.text_dedup import ngram_jaccard

    pairs = spark.createDataFrame([(3, 2000)], "a long, b long")
    out = ngram_jaccard(near_dup_docs, pairs).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_simhash_locality(spark, near_dup_docs):
    """Near-dup docs must land within small Hamming distance; random
    doc pairs far apart."""
    from colly_spark.operators.text_dedup import simhash_udf

    sh = {r["doc_id"]: r["sh"] for r in near_dup_docs.select(
        "doc_id", simhash_udf()(F.col("text")).alias("sh")).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(sh[3], sh[2000]) == 0  # exact dup
    near = [ham(sh[i], sh[1000 + i]) for i in range(0, 100, 5)]
    far = [ham(sh[i], sh[i + 1]) for i in range(0, 20)]
    # locality: every near-dup pair closer than every unrelated pair
    # (measured on this corpus: near max 5, far min 10)
    assert max(near) < min(far), f"near {near} vs far {far}"
    assert max(near) <= 8


def test_ann_lsh_recall(spark):
    """On clustered data (the near-dup retrieval use case), sign-LSH
    bucketing must retrieve most true top-5 neighbors. (On isotropic
    random vectors — the testdata embeddings — sign-LSH recall is
    legitimately poor; cosine_topk is the exact path for that regime.)"""
    from colly_spark.operators.similarity import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64)) * 3.0
    rows = []
    for i in range(200):
        v = centers[i % 10] + rng.standard_normal(64) * 0.2
        rows.append((i, [float(x) for x in v], i % 10))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_lsh_topk(emb, queries, k=5, n_bits=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"ANN recall too low on clustered data: {recall}"
    # every approx sim must equal the exact sim for that pair
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert r["cos_sim"] == exact_sims[key]


def test_ann_multiprobe_recall_not_worse(spark):
    """Hamming-1 multi-probe must retrieve a superset-or-equal
    candidate pool → recall ≥ single-probe on the same data."""
    from colly_spark.operators.similarity import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((10, 64)) * 3.0
    rows = []
    for i in range(200):
        v = centers[i % 10] + rng.standard_normal(64) * 0.35
        rows.append((i, [float(x) for x in v], i % 10))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in ann_lsh_topk(emb, queries, k=5, n_bits=8).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in ann_lsh_topk(emb, queries, k=5, n_bits=8, multiprobe=8).collect()}
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.8


def test_ann_ivf_recall(spark):
    """IVF-Flat with nprobe=4/16 cells must retrieve most true top-5
    neighbors on clustered data, and in-cell sims must equal the exact
    path's sims (same cosine expression)."""
    from colly_spark.operators.similarity import ann_ivf_topk, cosine_topk

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((10, 64)) * 3.0
    rows = []
    for i in range(200):
        v = centers[i % 10] + rng.standard_normal(64) * 0.2
        rows.append((i, [float(x) for x in v], i % 10))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_ivf_topk(emb, queries, k=5, nlist=16, nprobe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"IVF recall too low on clustered data: {recall}"
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert r["cos_sim"] == exact_sims[key]


def test_multimodal_roundtrip(spark):
    from colly_spark.operators.multimodal import (decode_meta, resize_nearest,
                                                  synthesize_images)

    imgs = synthesize_images(spark, 32, size=16).persist()
    meta = decode_meta(imgs).collect()
    assert len(meta) == 32
    assert all(r["decode_ok"] for r in meta)
    assert all(r["w"] == 16 and r["h"] == 16 for r in meta)
    # phash from decode matches the one stored at synthesis
    stored = {r["image_id"]: r["phash"] for r in imgs.collect()}
    for r in meta:
        assert r["phash"] == stored[r["image_id"]]
    # resize → still decodable PNG at 8×8
    small = resize_nearest(imgs, out_size=8)
    small_meta = decode_meta(small.withColumn("fmt", F.lit("png"))).collect()
    assert all(r["decode_ok"] and r["w"] == 8 for r in small_meta)
    imgs.unpersist()


def test_phash_near_dup_banded_equals_bruteforce(spark):
    """The 4×16-bit banded Hamming join must find EXACTLY the
    brute-force pair set for k < n_bands (pigeonhole), including on
    adversarial phashes whose differing bits straddle band borders."""
    from colly_spark.operators.multimodal import phash_near_dup_pairs

    rng = np.random.default_rng(7)
    hashes = [int(x) for x in rng.integers(-(1 << 63), 1 << 63, 40, dtype=np.int64)]
    # planted near-dups: flip ≤3 bits at band-straddling positions
    for i, bits in [(0, [15, 16]), (1, [31, 32, 33]), (2, [63]), (3, [0, 16, 48])]:
        h = hashes[i]
        for b in bits:
            h ^= (1 << b) if b < 63 else -(1 << 63)
        hashes.append(h)
    rows = [(f"im{i:04d}", h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = sorted((r["id_a"], r["id_b"], r["hamming"])
                 for r in phash_near_dup_pairs(df, k=3).collect())
    want = sorted(
        (a_id, b_id, bin((a ^ b) & ((1 << 64) - 1)).count("1"))
        for i, (a_id, a) in enumerate(rows) for b_id, b in rows[i + 1:]
        if bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 3)
    assert got == want
    assert len(want) >= 4  # every planted variant found


def test_phash_near_dup_finds_reencoded_variants(spark):
    from colly_spark.operators.multimodal import (decode_meta,
                                                  phash_near_dup_pairs,
                                                  synthesize_images)

    meta = decode_meta(synthesize_images(spark, 24, n_variants=24))
    pairs = {(r["id_a"], r["id_b"]) for r in phash_near_dup_pairs(meta, k=3).collect()}
    hits = sum((f"img{j:08d}", f"img{j + 24:08d}") in pairs for j in range(24))
    assert hits == 24  # lossy re-encode measured at Hamming 0-2 << k=3


def test_winnow_guarantee_and_determinism(spark):
    """Schleimer et al. guarantee: two documents sharing a normalized
    substring of ≥ w+k-1 (=11) chars share at least one fingerprint —
    a full w-window of identical k-gram hashes lies inside the match
    and its rightmost-minimum is selected identically in both."""
    from colly_spark.operators.text_dedup import winnow_udf

    shared = "a very distinctive shared passage"
    rows = [(0, "prefix text one " + shared + " suffix alpha"),
            (1, "Totally   different opener " + shared + "\tand closer"),
            (2, "no overlap with anything else at all here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sel = df.select("doc_id", F.explode(winnow_udf()(F.col("text"))).alias("s")) \
            .select("doc_id", F.col("s.fp").alias("fp"))
    a = sorted(map(tuple, sel.collect()))
    by: dict = {}
    for doc_id, fp in a:
        by.setdefault(doc_id, set()).add(fp)
    assert by[0] & by[1], "shared passage must yield a shared fingerprint"
    assert by[2]  # every non-trivial doc gets fingerprints
    b = sorted(map(tuple, sel.collect()))
    assert a == b  # deterministic


def test_lsh_buckets_deterministic(spark, near_dup_docs):
    from colly_spark.operators.text_dedup import lsh_buckets

    a = sorted(map(tuple, lsh_buckets(near_dup_docs).collect()))
    b = sorted(map(tuple, lsh_buckets(near_dup_docs).collect()))
    assert a == b


def test_image_corpus_filter_clauses(spark):
    """Each admission clause independently rejects its degenerate class,
    and the phash keep-min drops exact perceptual duplicates."""
    from colly_spark.operators.multimodal import image_corpus_filter

    rows = [
        # image_id, w, h, fmt, caption, phash
        ("img0", 256, 256, "png", "three token caption", 1),     # keeps
        ("img1", 32, 256, "png", "three token caption", 2),      # tiny side
        ("img2", 1024, 64, "png", "three token caption", 3),     # aspect 16
        ("img3", 256, 256, "tiff", "three token caption", 4),    # fmt (no decoder)
        ("img4", 256, 256, "jpeg", "two tokens", 5),             # caption
        ("img5", 256, 256, "jpeg", "   ", 6),                    # blank caption
        ("img6", 256, 256, "webp", "dup of img0 pixels here", 1),  # phash dup
        ("img7", 128, 128, "jpeg", "another fine caption", 7),   # keeps
        ("img8", 256, 256, "gif", "gif is decodable now", 8),    # keeps: gif codec landed
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string, phash long")
    out = {r["image_id"]: r for r in image_corpus_filter(df).collect()}
    assert set(out) == {"img0", "img7", "img8"}
    assert out["img0"]["n_caption_tokens"] == 3
    assert out["img0"]["megapixels"] == 0.0655


def test_connected_components_toy_graph(spark):
    """Min-label propagation vs hand-computed components: a 4-chain,
    a 2-clique, and two singletons — including label flow AGAINST edge
    direction (symmetrization)."""
    from colly_spark.operators.text_dedup import connected_components

    v = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    p = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 5)], "id_a long, id_b long")
    out = {r.doc_id: r.cluster_id
           for r in connected_components(v, p).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_connected_components_converges_on_long_chain(spark):
    """A 30-vertex path needs many propagation rounds — the fixpoint
    (and the convergence detector) must still land on one component."""
    from colly_spark.operators.text_dedup import connected_components

    n = 30
    v = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    p = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                              "id_a long, id_b long")
    out = connected_components(v, p, max_iter=40).collect()
    assert {r.cluster_id for r in out} == {0} and len(out) == n


def test_stratified_sample_stable_under_growth(spark):
    """A document's admission is a pure function of its id: sampling a
    grown corpus preserves every earlier decision, and per-stratum
    rates land near their thresholds."""
    from colly_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 2}") for i in range(2000)]
    small = spark.createDataFrame(rows[:1000], "doc_id long, source string")
    grown = spark.createDataFrame(rows, "doc_id long, source string")
    th = {"s0": 800, "s1": 200}
    keep_small = {r.doc_id for r in stratified_sample(small, th, 500).collect()}
    keep_grown = {r.doc_id for r in stratified_sample(grown, th, 500).collect()}
    assert keep_small == {d for d in keep_grown if d < 1000}
    n0 = sum(1 for d in keep_grown if d % 2 == 0)
    n1 = len(keep_grown) - n0
    assert abs(n0 / 1000 - 0.8) < 0.05 and abs(n1 / 1000 - 0.2) < 0.05


def test_token_shards_budget_property(spark):
    """Shard ids replay the packing rule exactly (floor of the
    exclusive prefix token sum ÷ budget per stratum in key order), a
    shard's non-final documents span < one budget, and numbering is
    contiguous from 0 per stratum."""
    from colly_spark.operators.sampling import token_shards

    rows = [(i, "s", 60 + (i * 37) % 90) for i in range(200)] + \
           [(i, "t", 30 + (i * 17) % 50) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = token_shards(df, budget=256).collect()
    # independent replay of the rule
    expected, acc = {}, {}
    for doc_id, src, tok in sorted(rows, key=lambda r: (r[1], r[0])):
        pe = acc.get(src, 0)
        expected[(src, doc_id)] = pe // 256
        acc[src] = pe + tok
    assert {(r.source, r.doc_id): r.shard for r in out} == expected
    per = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        per.setdefault((r.source, r.shard), []).append(r.n_tokens)
    for src in ("s", "t"):
        shards = sorted(k[1] for k in per if k[0] == src)
        assert shards == list(range(len(shards)))  # contiguous from 0
    for toks in per.values():
        assert sum(toks[:-1]) < 256  # only the last doc may cross


def test_cc_star_equals_label_propagation(spark):
    """Large-star/small-star (Kiveris et al.) and min-label propagation
    must return identical labels — toy graph (chain + clique +
    singletons, label flow against edge direction) and a random sparse
    graph with several mid-size components."""
    from colly_spark.operators.text_dedup import connected_components

    v = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    p = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 5)], "id_a long, id_b long")
    lab = {r.doc_id: r.cluster_id
           for r in connected_components(v, p, algorithm="label").collect()}
    star = {r.doc_id: r.cluster_id
            for r in connected_components(v, p, algorithm="star").collect()}
    assert lab == star == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}

    # deterministic pseudo-random sparse graph: 60 vertices, edges from
    # a fixed LCG — several components of varying shape
    n, edges, s = 60, [], 12345
    for _ in range(55):
        s = (s * 1103515245 + 12345) % (1 << 31)
        a = s % n
        s = (s * 1103515245 + 12345) % (1 << 31)
        b = s % n
        if a != b:
            edges.append((a, b))
    v = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    p = spark.createDataFrame(edges, "id_a long, id_b long")
    lab = {r.doc_id: r.cluster_id
           for r in connected_components(v, p, algorithm="label").collect()}
    star = {r.doc_id: r.cluster_id
            for r in connected_components(v, p, algorithm="star").collect()}
    assert lab == star and len(lab) == n


def test_cc_star_long_chain_logarithmic_rounds(spark):
    """The adversarial case the star path exists for: a diameter-d path
    graph must converge in O(log d) star rounds (label propagation
    needs d). 64-vertex path: log2(63) ≈ 6 — assert ≤ 9 rounds with
    headroom, and exactly one component labeled by its minimum."""
    from colly_spark.operators.text_dedup import _cc_star

    n = 64
    v = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    p = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                              "id_a long, id_b long")
    labels, rounds = _cc_star(v, p, "doc_id", "id_a", "id_b", max_iter=25)
    out = labels.collect()
    assert {r.cluster_id for r in out} == {0} and len(out) == n
    assert rounds <= 9, rounds


def test_avif_poison_rows_counted_not_raised(spark):
    """A mixed column containing avif rows must never fail a stage:
    (a) with avif treated as undecodable (the no-libavif container),
    image_corpus_filter drops the rows map-side and
    undecodable_fmt_report counts them — truncation is never silent;
    (b) malformed avif BYTES in a decode stage yield decode_ok=false
    rows, not a mid-job raise."""
    from colly_spark.functions.images import DECODABLE_WEB_FMTS
    from colly_spark.operators.multimodal import (image_corpus_filter,
                                                  image_stats,
                                                  undecodable_fmt_report)

    rows = [
        ("img0", 256, 256, "png", "three token caption", 1),
        ("img1", 256, 256, "avif", "three token caption", 2),
        ("img2", 256, 256, "avif", "three token caption", 3),
        ("img3", 256, 256, "tiff", "three token caption", 4),
        ("img4", 256, 256, None, "three token caption", 5),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string,"
              " phash long")
    # (a) admission excludes + report counts (fmts pinned to the
    # from-scratch set = the libavif-absent container's default);
    # NULL fmt is rejected by isin() and must be COUNTED too — the
    # report may not itself truncate silently
    kept = {r.image_id for r in
            image_corpus_filter(df, fmts=DECODABLE_WEB_FMTS).collect()}
    assert kept == {"img0"}
    rep = {r.fmt: r.n_rows for r in
           undecodable_fmt_report(df, fmts=DECODABLE_WEB_FMTS).collect()}
    assert rep == {"avif": 2, "tiff": 1, "(null)": 1}
    # (b) poison BYTES (truncated avif container) survive the decode
    # stage as decode_ok=false rows regardless of libavif presence
    bad = spark.createDataFrame(
        [("p0", bytearray(b"\x00\x00\x00 ftypavif"), "avif"),
         ("p1", bytearray(b"not an image at all"), "png")],
        "image_id string, bytes binary, fmt string")
    out = {r.image_id: r.decode_ok for r in image_stats(bad).collect()}
    assert out == {"p0": False, "p1": False}
