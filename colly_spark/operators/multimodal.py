"""Multimodal (image) column plumbing for training-data pipelines.

Images travel as opaque ``binary`` columns with typed metadata
(BASELINE.json input_hint schema: image_id, bytes, w, h, fmt, caption,
phash). This module provides the Spark-side plumbing — schema, Arrow
batch shape, partitioning — around the codecs in functions/images.py:

- ``decode_meta``: binary → (w, h, fmt, phash, decode_ok) via
  ``mapInPandas`` (one Python call per Arrow batch; numpy per image).
- ``resize_nearest``: deterministic nearest-neighbor downsample →
  re-encoded PNG bytes (the "thumbnail" stage of an image pipeline).
- ``synthesize_images``: deterministic in-Spark image generation (the
  sandbox stand-in for reading a real image lake) — pixels seeded per
  id, encoded with the real PNG codec / the stand-in lossy codec.

Codecs: png/jpeg/webp decode through the from-scratch implementations
(functions/{images,jpeg,webp}.py); avif and lossy-VP8 fallback ride
the container's native libavif/libwebp via ctypes
(functions/native_codecs.py). Decode runs map-side only; rows are
round-robin repartitioned first so a few huge images can't skew a
partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _meta_schema():
    from pyspark.sql.types import (BooleanType, IntegerType, LongType, StringType,
                                   StructField, StructType)

    return StructType([
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("phash", LongType()),
        StructField("decode_ok", BooleanType()),
    ])


def decode_meta(df, id_col: str = "image_id", bytes_col: str = "bytes",
                fmt_col: str = "fmt", repartition_to: int | None = None):
    """binary column → decoded metadata rows (w, h, fmt, phash,
    decode_ok). Arrow-batched; unknown formats yield decode_ok=false
    rather than failing the job (poison-row tolerance)."""
    sel = df.select(df[id_col].alias("image_id"), df[bytes_col].alias("bytes"),
                    df[fmt_col].alias("fmt"))
    if repartition_to:
        sel = sel.repartition(repartition_to)

    def _decode(iterator):
        from colly_spark.functions.images import decode_image, phash64
        for pdf in iterator:
            w, h, ph, ok = [], [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    h.append(px.shape[0]); w.append(px.shape[1])
                    ph.append(phash64(px)); ok.append(True)
                except Exception:
                    w.append(0); h.append(0); ph.append(0); ok.append(False)
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "w": np.array(w, dtype=np.int32),
                "h": np.array(h, dtype=np.int32), "fmt": pdf["fmt"],
                "phash": np.array(ph, dtype=np.int64), "ok_": ok,
            }).rename(columns={"ok_": "decode_ok"})

    return sel.mapInPandas(_decode, schema=_meta_schema())


def luma_stats(px: np.ndarray):
    """Pixel-quality statistics over the ITU-R BT.601 integer luma
    (exactly ⌊(299R + 587G + 114B)/1000⌋, so the value set is 0..255
    and replica-exact): mean, population std (contrast), Shannon
    entropy of the 256-bin histogram in bits, and mean |4-neighbor
    Laplacian| over interior pixels (the classic variance-of-Laplacian
    blur proxy's L1 sibling — 0 for flat images, large for noise).
    All rounded to 6 dp. Pure numpy — shared by the operator and the
    golden replica; the stat MATH is pinned by hand-computed KATs
    (tests/test_image_stats.py), the golden pins the decode round-trip
    + Arrow plumbing (the audio_features discipline)."""
    lum = ((299 * px[..., 0].astype(np.int64)
            + 587 * px[..., 1].astype(np.int64)
            + 114 * px[..., 2].astype(np.int64)) // 1000)
    mean = round(float(lum.mean()), 6)
    contrast = round(float(lum.std()), 6)
    hist = np.bincount(lum.ravel(), minlength=256)
    p = hist[hist > 0] / lum.size
    entropy = round(float(-(p * np.log2(p)).sum()), 6)
    if lum.shape[0] >= 3 and lum.shape[1] >= 3:
        lap = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1] - lum[2:, 1:-1]
               - lum[1:-1, :-2] - lum[1:-1, 2:])
        sharpness = round(float(np.abs(lap).mean()), 6)
    else:
        sharpness = None
    return mean, contrast, entropy, sharpness


def image_stats(df, id_col: str = "image_id", bytes_col: str = "bytes",
                fmt_col: str = "fmt", with_phash: bool = False):
    """LAION-style pixel-quality admission signals: decode each image
    and compute luma_stats — the flat/low-entropy/blurred screens a
    web image corpus filters before training. Arrow-batched
    mapInPandas, map-side only (the binary column never shuffles);
    poison rows yield decode_ok=false + NULL stats instead of failing
    the job. Downstream: filter on the columns (e.g. entropy ≥ 1 bit,
    contrast ≥ 5) exactly like image_corpus_filter's metadata gates.

    ``with_phash`` additionally emits the decoded-pixel phash64 from
    the SAME decode — quality gates and near-dup candidates out of one
    pass over the binary column (the composed curation pipeline's
    shape; decoding twice would double the dominant cost)."""
    from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    sel = df.select(df[id_col].alias("image_id"),
                    df[bytes_col].alias("bytes"), df[fmt_col].alias("fmt"))
    fields = [
        StructField("image_id", StringType()),
        StructField("fmt", StringType()),
        StructField("mean_luma", DoubleType()),
        StructField("contrast", DoubleType()),
        StructField("entropy", DoubleType()),
        StructField("sharpness", DoubleType()),
        StructField("decode_ok", BooleanType()),
    ]
    if with_phash:
        fields.append(StructField("phash", LongType()))
    schema = StructType(fields)
    cols = [f.name for f in fields]

    def _stats(iterator):
        from colly_spark.functions.images import decode_image, phash64
        for pdf in iterator:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    m, c, e, s = luma_stats(px)
                    row = (iid, fmt, m, c, e, s, True)
                    if with_phash:
                        row += (phash64(px),)
                except Exception:
                    row = (iid, fmt, None, None, None, None, False)
                    if with_phash:
                        row += (0,)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return sel.mapInPandas(_stats, schema=schema)


def synthesize_images(spark, n: int, seed: int = 42, size: int = 16,
                      n_variants: int = 0,
                      fmt_cycle: tuple = ("png", "jpeg", "webp"),
                      variant_fmt: str = "jpeg", scene: str = "noise"):
    """Deterministic image table (input_hint schema) generated
    *distributed*: ids partitioned via spark.range, pixels seeded per
    id, encoded with codec ``fmt_cycle[id % len(fmt_cycle)]``. Cycle
    entries are encoder names: ``png`` / ``jpeg`` (from-scratch
    baseline JPEG) / ``webp`` (from-scratch VP8-L lossless) /
    ``webp_lossy`` (system libwebp VP8, fmt column still "webp") /
    ``avif`` (system libavif). Stand-in for reading an image lake at
    100 TB — the downstream plumbing is identical.

    ``n_variants`` appends near-duplicate rows: id ``n + j`` is a lossy
    re-encode (``variant_fmt``) of base image ``j``'s pixels (same
    scene, different bytes/format) — the crawl-corpus situation phash
    dedup exists for. Measured phash Hamming distance of these
    variants is 0–2 bits.

    ``scene``: pixel generator variant (functions/images.synth_pixels)
    — "noise" (default, byte-identical to the original generator) or
    "mixed" (even ids smooth / odd ids noise, the heterogeneous corpus
    the image-quality classifier trains on)."""
    from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.images import synth_encode, synth_pixels
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base = i if i < n else i - n
                px = synth_pixels(base, seed, size, scene)
                if i < n:
                    enc = fmt_cycle[i % len(fmt_cycle)]
                    fmt, data, ph = synth_encode(px, enc)
                    caption = f"synthetic caption {i}"
                else:
                    fmt, data, ph = synth_encode(px, variant_fmt)
                    caption = f"synthetic caption {base} (re-encoded)"
                rows.append(dict(
                    image_id=f"img{i:08d}", bytes=data, w=size, h=size, fmt=fmt,
                    caption=caption, phash=ph))
            yield pd.DataFrame(rows)

    return spark.range(n + n_variants).mapInPandas(_gen, schema=schema)


def phash_near_dup_pairs(meta_df, k: int = 3, n_bands: int = 4,
                         id_col: str = "image_id", phash_col: str = "phash"):
    """Image near-duplicate pairs by perceptual-hash Hamming distance
    ≤ ``k`` — the banded exact-Hamming join of Manku et al. (WWW'07,
    "Detecting Near-Duplicates for Web Crawling"), re-expressed as pure
    Catalyst (no UDF, whole-stage codegen end to end):

    split the 64-bit phash into ``n_bands`` disjoint bit blocks; by
    pigeonhole any pair within Hamming ``k < n_bands`` agrees exactly on
    at least one block, so an equi-join on (band, block_value) followed
    by an exact ``bit_count(xor)`` filter finds EXACTLY the brute-force
    pair set — never all-pairs. With 4×16-bit bands each band key has
    2^16 values; at 10^10 images you'd raise to 6–8 permuted-prefix
    tables (same pigeonhole argument) to keep per-bucket candidate
    counts flat. The DuckDB oracle runs the O(n²) brute-force join —
    provably the same result for k < n_bands.

    Returns (id_a, id_b, hamming) with id_a < id_b, one row per pair."""
    from pyspark.sql import functions as F

    assert k < n_bands, "pigeonhole completeness requires k < n_bands"
    assert 64 % n_bands == 0
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    band_structs = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("ph"), i * bits)
            .bitwiseAND(F.lit(mask)).alias("val"))
        for i in range(n_bands)])
    base = (meta_df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
            .select("id", "ph", F.explode(band_structs).alias("bv"))
            .select("id", "ph", F.col("bv.band").alias("band"),
                    F.col("bv.val").alias("val")))
    left = base.select(F.col("id").alias("id_a"), F.col("ph").alias("pa"),
                       "band", "val")
    right = base.select(F.col("id").alias("id_b"), F.col("ph").alias("pb"),
                        "band", "val")
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming",
                    F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int"))
        .filter(F.col("hamming") <= k)
        # a pair can agree on >1 band → one row per matching band; the
        # pair set is what near-dup policy consumes, so collapse
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def resize_nearest(df, out_size: int = 8, id_col: str = "image_id",
                   bytes_col: str = "bytes", fmt_col: str = "fmt"):
    """Decode → nearest-neighbor resize → re-encode PNG. Returns
    (image_id, bytes, w, h). The thumbnail/feature-extract stage shape:
    binary in, binary out, map-side only."""
    from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
    ])
    sel = df.select(df[id_col].alias("image_id"), df[bytes_col].alias("bytes"),
                    df[fmt_col].alias("fmt"))

    def _resize(iterator):
        from colly_spark.functions.images import decode_image, encode_png
        for pdf in iterator:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    ys = (np.arange(out_size) * px.shape[0] // out_size)
                    xs = (np.arange(out_size) * px.shape[1] // out_size)
                    small = px[ys][:, xs]
                    out.append(dict(image_id=iid, bytes=encode_png(small),
                                    w=out_size, h=out_size))
                except Exception:
                    out.append(dict(image_id=iid, bytes=None, w=0, h=0))
            yield pd.DataFrame(out)

    return sel.mapInPandas(_resize, schema=schema)


def caption_token_count_expr(caption_col):
    """caption → whitespace token count (0 for empty/blank), matching
    text_quality's tokenization and the DuckDB oracle's
    string_split_regex(trim(...))."""
    from pyspark.sql import functions as F

    t = F.trim(caption_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


def image_corpus_filter(df, min_side: int = 64, max_aspect: float = 3.0,
                        min_caption_tokens: int = 3, fmts: tuple = None):
    """Training-corpus admission over the image+caption table (the
    LAION-style cleanroom pass): keep rows whose format is decodable,
    whose short side is ≥ ``min_side`` px, whose aspect ratio is
    bounded, and whose caption has enough tokens; then exact-dedup on
    the perceptual hash keeping the lowest image_id (near-dup policy
    is ``phash_near_dup_pairs``'s job, composable on top).

    Returns (image_id, w, h, fmt, n_caption_tokens, megapixels).

    Scale shape: all predicates are map-side Catalyst over scan columns
    (w/h/fmt/caption — the parquet scan prunes ``bytes``, by far the
    widest column, entirely); the only shuffle is the keep-min groupBy
    on phash, which is uniformly distributed by construction.

    ``fmts`` defaults to the set this engine can actually decode
    (functions/images.decodable_web_fmts(): the from-scratch codecs
    plus avif when the container's libavif loads), so a metadata-
    admitted row can never poison a downstream decode stage."""
    from pyspark.sql import functions as F

    if fmts is None:
        from colly_spark.functions.images import decodable_web_fmts
        fmts = decodable_web_fmts()

    base = df.select(
        "image_id", "w", "h", "fmt", "phash",
        caption_token_count_expr(F.col("caption")).alias("n_caption_tokens"),
        F.round(F.col("w").cast("double") * F.col("h").cast("double") / 1e6, 4)
         .alias("megapixels"))
    admitted = base.filter(
        F.col("fmt").isin(*fmts)
        & (F.least("w", "h") >= min_side)
        & ((F.greatest("w", "h").cast("double")
            / F.least("w", "h").cast("double")) <= max_aspect)
        & (F.col("n_caption_tokens") >= min_caption_tokens))
    keep = admitted.groupBy("phash").agg(F.min("image_id").alias("image_id"))
    return (admitted.join(keep, ["image_id", "phash"], "left_semi")
                    .select("image_id", "w", "h", "fmt",
                            "n_caption_tokens", "megapixels"))


def undecodable_fmt_report(df, fmts: tuple = None, fmt_col: str = "fmt"):
    """(fmt, n_rows) for rows ``image_corpus_filter`` rejects on
    format grounds — callers log this so format-based truncation is
    never silent (the image twin of text_dedup.oversized_buckets and
    similarity.semdedup_oversized_cells). The canonical avif case:
    when the container's libavif is absent, ``decodable_web_fmts()``
    excludes ``avif``, the filter drops those rows map-side, and this
    report says how many — instead of a decode stage raising
    mid-job on bytes no decoder can read. Pure metadata (scan columns
    only, bytes pruned); one ~|fmts|-key groupBy."""
    from pyspark.sql import functions as F

    if fmts is None:
        from colly_spark.functions.images import decodable_web_fmts
        fmts = decodable_web_fmts()
    # NULL fmt is rejected by the admission filter's isin() (NULL
    # predicate → dropped) — count it here too, as '(null)', or the
    # report would itself commit the silent truncation it prevents
    return (df.filter(~F.col(fmt_col).isin(*fmts)
                      | F.col(fmt_col).isNull())
            .groupBy(F.coalesce(F.col(fmt_col), F.lit("(null)"))
                     .alias("fmt"))
            .agg(F.count("*").alias("n_rows")))


# SDXL-style aspect-ratio bucket ladder scaled to a 256x256 area
# budget, sides multiples of 64. A training loader packs batches
# per-bucket so every sample in a batch shares the resize target.
DEFAULT_ASPECT_LADDER = (
    (256, 256), (320, 192), (192, 320), (384, 160), (160, 384),
    (448, 128), (128, 448), (512, 128), (128, 512),
)


def aspect_bucket_assign(df, ladder=DEFAULT_ASPECT_LADDER,
                         id_col: str = "image_id"):
    """Assign each image to the ladder bucket minimizing
    |ln(w/h) - ln(bw/bh)| (ties -> lowest ladder index), with the
    resize scale max(bw/w, bh/h) a loader would apply before the
    center crop. Pure Catalyst map-side work: the ladder is a
    constant array literal, argmin via array_sort on (dist, index)
    structs — no shuffle at all, so this runs at scan speed over any
    corpus size; the per-bucket rollup downstream is one groupBy on
    ~|ladder| keys.
    """
    from pyspark.sql import functions as F

    w, h = F.col("w").cast("double"), F.col("h").cast("double")
    lad = F.array(*[
        F.struct(F.lit(float(bw) / bh).alias("bar"),
                 F.lit(i).alias("i"),
                 F.lit(bw).alias("bw"), F.lit(bh).alias("bh"))
        for i, (bw, bh) in enumerate(ladder)])
    scored = F.transform(
        lad, lambda b: F.struct(
            F.abs(F.log(w / h) - F.log(b["bar"])).alias("d"),
            b["i"].alias("i"), b["bw"].alias("bw"), b["bh"].alias("bh")))
    best = F.array_sort(scored)[0]
    return df.select(
        F.col(id_col),
        best["bw"].alias("bucket_w"),
        best["bh"].alias("bucket_h"),
        F.round(F.greatest(best["bw"] / w, best["bh"] / h), 6).alias("scale"))


def scrub_metadata(df, id_col: str = "image_id", bytes_col: str = "bytes",
                   fmt_col: str = "fmt", repartition_to: int | None = None):
    """EXIF/XMP/comment scrubbing over a binary image column — the
    privacy pass of an image training pipeline (camera EXIF carries
    GPS/serial/timestamps).  Container-level walk only
    (functions/imagemeta.py): entropy-coded pixel data is copied
    verbatim, so decoded pixels are bit-identical.  Arrow-batched
    mapInPandas, map-side only; unknown containers pass through with
    zero counts (scrubbing never drops an image).

    Returns (image_id, fmt, bytes=clean, n_removed, bytes_removed).
    """
    from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    sel = df.select(df[id_col].alias("image_id"),
                    df[bytes_col].alias("bytes"), df[fmt_col].alias("fmt"))
    if repartition_to:
        sel = sel.repartition(repartition_to)
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("fmt", StringType()),
        StructField("n_removed", IntegerType()),
        StructField("bytes_removed", LongType()),
    ])

    def _scrub(iterator):
        from colly_spark.functions.imagemeta import strip_metadata
        for pdf in iterator:
            out, nrem, brem = [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    clean, n, b = strip_metadata(bytes(data), fmt)
                except Exception:
                    clean, n, b = bytes(data), 0, 0  # poison-row tolerance
                out.append(clean); nrem.append(n); brem.append(b)
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "bytes": out, "fmt": pdf["fmt"],
                "n_removed": np.array(nrem, dtype=np.int32),
                "bytes_removed": np.array(brem, dtype=np.int64),
            })

    return sel.mapInPandas(_scrub, schema=schema)


def caption_alignment(df, threshold: float = 0.0, id_col: str = "image_id",
                      caption_col: str = "caption",
                      phash_col: str = "phash"):
    """CLIP-score-style image-text alignment scoring + admission over
    the image+caption table — the LAION-5B curation step (Schuhmann et
    al. 2022: drop pairs whose image/text embedding cosine falls below
    a threshold).

    The container ships no vision-language model, so the two
    embeddings are deterministic 64-bit stand-ins with the REAL
    pipeline shape: the image side is the perceptual hash already in
    the input_hint schema, the text side is the SimHash of the caption
    (operators/text_dedup.simhash_udf) — each packs a 64-dim ±1 vector
    into an int64, so cosine(img, txt) = (64 - 2·hamming)/64 computed
    by ONE bit_count(xor) Catalyst expression.  Swapping in a real
    model touches only the two embedding columns; the score + threshold
    admission below — the part that must survive 100 TB — is unchanged
    and stays entirely map-side (no shuffle, binary column never read).

    Returns (image_id, n_caption_tokens, align_score, aligned);
    captionless rows score against hash 0 but are never admitted.
    """
    from pyspark.sql import functions as F

    from colly_spark.operators.text_dedup import simhash_udf

    ntok = caption_token_count_expr(F.col(caption_col))
    ham = F.bit_count(
        F.col(phash_col).bitwiseXOR(simhash_udf()(F.col(caption_col))))
    score = F.round((F.lit(64) - 2 * ham) / F.lit(64.0), 6)
    return df.select(
        F.col(id_col).alias("image_id"),
        ntok.alias("n_caption_tokens"),
        score.alias("align_score"),
        ((ntok >= 1) & (score >= F.lit(threshold))).alias("aligned"))


def cross_modal_topk(df, k: int = 5, n_queries: int = 8,
                     id_col: str = "image_id",
                     caption_col: str = "caption",
                     phash_col: str = "phash"):
    """Caption→image retrieval: rank every image by the ±1-embedding
    cosine ``(64 − 2·hamming)/64`` between a QUERY caption's SimHash
    and the image's perceptual hash — the retrieval twin of
    ``caption_alignment`` (same deterministic embedding stand-ins;
    a real model swaps in through the two hash columns only).

    Exact top-k: query side broadcast, corpus scanned once (the
    ``cosine_topk`` discipline — candidate work is n_queries × corpus,
    map-side). At 10^9 pairs the threshold-retrieval form uses the
    banded Hamming join instead (``phash_near_dup_pairs``'s Manku
    bands); top-k over an UNBOUNDED score needs the exact pass, so
    keep n_queries per job bounded. Self-retrieval is legitimate here
    (an image's own caption should rank it) — no self-filter.

    Returns (query_id, image_id, rank, align_score), ties by
    image_id."""
    from pyspark.sql import Window, functions as F

    from colly_spark.operators.text_dedup import simhash_udf

    qids = (df.select(F.col(id_col).alias("query_id"),
                      F.col(caption_col).alias("_q_caption"))
            .orderBy("query_id").limit(n_queries))
    q = qids.select(
        "query_id",
        simhash_udf()(F.col("_q_caption")).alias("_q_sim"))
    c = df.select(F.col(id_col).alias("image_id"),
                  F.col(phash_col).alias("_phash"))
    ham = F.bit_count(F.col("_phash").bitwiseXOR(F.col("_q_sim")))
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("align_score",
                          F.round((F.lit(64) - 2 * ham) / F.lit(64.0), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("align_score").desc(), F.col("image_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "image_id", "rank", "align_score"))


def cross_modal_dedup(df, id_col: str = "image_id",
                      caption_col: str = "caption",
                      phash_col: str = "phash"):
    """Cross-modal exact dedup: the same image scraped from many pages
    arrives with many captions; training wants it once, with its BEST
    caption.  Keep, per identical phash, the row with the most caption
    tokens (ties → lowest image_id), carrying how many copies were
    folded.  ONE window shuffle on phash — the key is uniform by
    construction (it's a hash), so no salting is needed at corpus
    scale; the binary column is never touched.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ntok = caption_token_count_expr(F.col(caption_col))
    by_phash = Window.partitionBy("phash")
    best_first = by_phash.orderBy(F.col("n_caption_tokens").desc(),
                                  F.col("image_id"))
    return (df.select(F.col(id_col).alias("image_id"),
                      F.col(phash_col).alias("phash"),
                      ntok.alias("n_caption_tokens"))
            .withColumn("n_dups", F.count("*").over(by_phash).cast("int"))
            .withColumn("_rn", F.row_number().over(best_first))
            .filter(F.col("_rn") == 1)
            .select("image_id", "phash", "n_caption_tokens", "n_dups"))


def avif_params(i: int, seed: int = 42) -> dict:
    """Deterministic per-id parameter draw shared by `synthesize_avifs`
    and the golden-oracle generator (which never touches the bytes) —
    the mp4_params discipline (operators/av.py)."""
    return dict(
        w=(64, 320, 1024, 4096)[i % 4],
        h=(64, 240, 768, 2160)[(i // 2) % 4],
        depth=(8, 8, 10, 12)[(i // 3) % 4],
        alpha=bool(i % 5 == 0),
        rotation=(0, 0, 90, 180, 270)[i % 5],
        mirror=(None, None, 0, 1)[(i // 5) % 4],
        seq_profile=(0, 0, 1, 2)[(i // 7) % 4],
        brand=("avif", "avif", "avif", "avis")[(i // 4) % 4],
        pitm_version=(i // 11) % 2,
        wide_ipma=bool((i // 13) % 2),
        decoy_ispe=bool(i % 3 == 0))


def synthesize_avifs(spark, n: int, seed: int = 42):
    """Deterministic AVIF metadata table (image_id, bytes): per-id
    structurally-valid HEIF containers (functions/avif.encode_avif_stub)
    with no decodable AV1 payload — exactly what a decode-free
    admission stage consumes. A third of the rows carry a decoy
    leading ispe so the probe's pitm+ipma primary-item resolution is
    exercised distributedly, not just in unit KATs."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.avif import encode_avif_stub
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = avif_params(i, seed)
                rows.append(dict(
                    image_id=f"avf{i:08d}",
                    bytes=encode_avif_stub(mdat=b"\x00" * (32 + i % 256),
                                           **p)))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)


def avif_probe_features(df, id_col: str = "image_id",
                        bytes_col: str = "bytes"):
    """(id, brand, w, h, depth, n_items, alpha, rotation, mirror,
    seq_profile, animated, probe_ok): AVIF container metadata WITHOUT
    decoding — image_stats-class coverage for avif rows while decode
    stays gated on the system libavif (functions/native_codecs.py).
    Map-side mapInPandas, poison-tolerant (probe_ok=false, never a
    mid-stage raise — the undecodable_fmt_report discipline); at an
    object store this is one range GET stopping at mdat per file."""
    from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("brand", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("n_items", IntegerType()),
        StructField("alpha", BooleanType()),
        StructField("rotation", IntegerType()),
        StructField("mirror", IntegerType()),
        StructField("seq_profile", IntegerType()),
        StructField("animated", BooleanType()),
        StructField("probe_ok", BooleanType()),
    ])

    def _probe(iterator):
        from colly_spark.functions.avif import probe_avif
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    info = probe_avif(bytes(data))
                    rows.append({id_col: rid, "probe_ok": True,
                                 "brand": info["brand"],
                                 "w": info["w"], "h": info["h"],
                                 "depth": info["depth"],
                                 "n_items": info["n_items"],
                                 "alpha": info["alpha"],
                                 "rotation": info["rotation"],
                                 "mirror": info["mirror"],
                                 "seq_profile": info["seq_profile"],
                                 "animated": info["animated"]})
                except Exception:
                    rows.append({id_col: rid, "probe_ok": False,
                                 "brand": None, "w": None, "h": None,
                                 "depth": None, "n_items": None,
                                 "alpha": None, "rotation": None,
                                 "mirror": None, "seq_profile": None,
                                 "animated": None})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_probe, schema=schema)


def image_probe_meta(df, id_col: str = "image_id",
                     bytes_col: str = "bytes"):
    """(id, fmt_detected, w, h, depth, alpha, animated, probe_ok):
    decode-free header probe for EVERY corpus format (png/jpeg/gif/
    webp/avif — functions/imageprobe.py) — the admission tier BELOW
    decode_meta: dimensions/aspect/format gating from O(100) header
    bytes per object, no pixels touched, avif covered even where its
    decode is native-gated. Format is SNIFFED from magic bytes, never
    trusted from a fmt column. Map-side mapInPandas, poison-tolerant
    (probe_ok=false — the undecodable_fmt_report discipline)."""
    from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("fmt_detected", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("alpha", BooleanType()),
        StructField("animated", BooleanType()),
        StructField("probe_ok", BooleanType()),
    ])

    def _probe(iterator):
        from colly_spark.functions.imageprobe import probe_image
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    info = probe_image(bytes(data))
                    rows.append({id_col: rid, "probe_ok": True,
                                 "fmt_detected": info["fmt"],
                                 "w": info["w"], "h": info["h"],
                                 "depth": info["depth"],
                                 "alpha": info["alpha"],
                                 "animated": info["animated"]})
                except Exception:
                    rows.append({id_col: rid, "probe_ok": False,
                                 "fmt_detected": None, "w": None,
                                 "h": None, "depth": None, "alpha": None,
                                 "animated": None})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_probe, schema=schema)


def synthesize_animated_gifs(spark, n: int, seed: int = 42,
                             size: int = 16, n_frames: int = 3):
    """Deterministic animated-GIF rows (image_id, bytes): per-id
    frame stacks (functions/images.synth_pixels over consecutive ids)
    through the from-scratch GIF89a animation writer."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.gif import encode_gif_animated
        from colly_spark.functions.images import synth_pixels
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                frames = [synth_pixels(i * n_frames + j, seed, size)
                          for j in range(n_frames)]
                rows.append(dict(
                    image_id=f"anm{i:08d}",
                    bytes=encode_gif_animated(frames,
                                              [10] * n_frames)))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)
