"""Cross-modal curation ops (operators/multimodal.py):
caption_alignment (CLIP-score-shaped admission) and cross_modal_dedup
(best-caption keep-one per identical image)."""

from pyspark.sql import functions as F


def test_caption_alignment_endpoints(spark):
    """Formula endpoints: phash == caption-simhash → cosine exactly
    1.0; phash == ~simhash → -1.0; captionless rows are never admitted
    even at a perfect score."""
    from colly_spark.operators.multimodal import caption_alignment
    from colly_spark.operators.text_dedup import simhash_udf

    caps = spark.createDataFrame(
        [("a", "wooden pier at sunset"), ("b", "two dogs on the beach"),
         ("c", ""), ("d", "   ")],
        "image_id string, caption string")
    sims = {r.image_id: r.s for r in caps.select(
        "image_id", simhash_udf()(F.col("caption")).alias("s")).collect()}
    assert sims["c"] == 0 and sims["d"] == 0  # tokenless → hash 0

    rows = [("a", sims["a"], "wooden pier at sunset"),     # aligned
            ("b", ~sims["b"], "two dogs on the beach"),    # anti-aligned
            ("c", 0, ""), ("d", 0, "   ")]                 # captionless
    df = spark.createDataFrame(
        rows, "image_id string, phash long, caption string")
    out = {r.image_id: r for r in
           caption_alignment(df, threshold=0.0).collect()}
    assert out["a"].align_score == 1.0 and out["a"].aligned
    assert out["b"].align_score == -1.0 and not out["b"].aligned
    # xor(0, 0) = 0 → score 1.0, but zero tokens gates admission
    assert out["c"].align_score == 1.0 and not out["c"].aligned
    assert out["d"].n_caption_tokens == 0 and not out["d"].aligned


def test_caption_alignment_threshold(spark):
    """One flipped bit costs exactly 2/64 of cosine; the threshold
    cuts between adjacent Hamming levels."""
    from colly_spark.operators.multimodal import caption_alignment
    from colly_spark.operators.text_dedup import simhash_udf

    cap = "ball near old pier"
    s = spark.createDataFrame([(cap,)], "caption string").select(
        simhash_udf()(F.col("caption")).alias("s")).collect()[0].s
    rows = [(f"h{k}", s ^ ((1 << k) - 1), cap) for k in range(4)]
    df = spark.createDataFrame(
        rows, "image_id string, phash long, caption string")
    out = {r.image_id: r for r in
           caption_alignment(df, threshold=1.0 - 4.0 / 64).collect()}
    # Hamming k → score (64-2k)/64; threshold 60/64 admits k ≤ 2
    for k in range(4):
        got = out[f"h{k}"]
        assert got.align_score == (64 - 2 * k) / 64.0
        assert got.aligned == (k <= 2)


def test_cross_modal_dedup_kat(spark):
    from colly_spark.operators.multimodal import cross_modal_dedup

    rows = [
        ("i1", 77, "a dog"),                 # 2 tokens
        ("i2", 77, "a dog on the beach"),    # 5 tokens → kept
        ("i3", 77, "dog beach photo inside"),  # 4 tokens
        ("i4", 88, "x"), ("i5", 88, "y"),    # tie on tokens → min id
        ("i6", 99, ""),                      # singleton, empty caption
    ]
    df = spark.createDataFrame(
        rows, "image_id string, phash long, caption string")
    out = {r.phash: r for r in cross_modal_dedup(df).collect()}
    assert len(out) == 3
    assert out[77].image_id == "i2" and out[77].n_dups == 3
    assert out[77].n_caption_tokens == 5
    assert out[88].image_id == "i4" and out[88].n_dups == 2
    assert out[99].image_id == "i6" and out[99].n_caption_tokens == 0


def test_cross_modal_topk_ranking_kat(spark):
    """Hand-built phashes at known Hamming distances from the query
    caption's simhash: the ranking and 6-dp scores are closed-form."""
    import numpy as np

    from colly_spark.functions.urlnorm import fnv64a_batch
    from colly_spark.operators.multimodal import cross_modal_topk

    cap = "a dog on the beach"
    # plain replica of text_dedup.simhash_udf's bit-vote
    hv = np.asarray(fnv64a_batch(cap.split())).view(np.uint64)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    base = int(np.packbits(votes > 0,
                           bitorder="little").view(np.uint64)[0])

    def flip(h, bits):
        for b in bits:
            h ^= 1 << b
        return h - (1 << 64) if h >= (1 << 63) else h

    sbase = base - (1 << 64) if base >= (1 << 63) else base
    rows = [("a0", sbase, cap),             # distance 0 → score 1.0
            ("i1", flip(base, [3]), "x"),   # distance 1
            ("i2", flip(base, [3, 17]), "y"),       # distance 2
            ("i3", flip(base, [3, 17, 40]), "z")]   # distance 3
    df = spark.createDataFrame(
        rows, "image_id string, phash long, caption string")
    got = [(r.image_id, r.rank, r.align_score)
           for r in cross_modal_topk(df, k=3, n_queries=1)
           .orderBy("rank").collect()]
    assert got == [("a0", 1, 1.0), ("i1", 2, round(62 / 64, 6)),
                   ("i2", 3, round(60 / 64, 6))]


def test_cross_modal_topk_shape(spark):
    from pyspark.sql import functions as F

    from colly_spark.operators.multimodal import (cross_modal_topk,
                                                  synthesize_images)

    imgs = synthesize_images(spark, 24)
    out = cross_modal_topk(imgs, k=4, n_queries=3).collect()
    assert len(out) == 12
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_q.values())
    # deterministic across repartitioning
    again = cross_modal_topk(imgs.repartition(5), k=4,
                             n_queries=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
