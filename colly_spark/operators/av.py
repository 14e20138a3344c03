"""Audio/video curation operators: Arrow-batched feature extraction
and frame sampling over opaque binary columns.

Same contract as operators/multimodal.py's image stack: the media
bytes stay opaque binary through every shuffle (never decoded
JVM-side), decode happens once inside mapInPandas, and poison rows
(truncated/foreign bytes) degrade to decode_ok=False instead of
failing the stage — at 100 TB a corpus WILL contain undecodable rows.

- ``audio_features``: PCM16 WAV parse (functions/audio.py, real
  from-scratch RIFF codec) → duration/RMS/peak/ZCR admission signals.
- ``video_frame_sample``: MJPEG-AVI container walk (functions/avi.py)
  → every Nth frame decoded by the from-scratch T.81 JPEG codec →
  per-frame phash64, ready for the image near-dup/quality operators.
  One input row fans out to ≤ ceil(n_frames/every) output rows; the
  explode happens inside the Arrow batch, so the full frame set is
  never materialized as a column.

Scale shape: both are map-side only (zero shuffles); partitioning and
skew follow the input table. Synthesis mirrors synthesize_images —
deterministic per-id signal generated DISTRIBUTED via spark.range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def synthesize_audio(spark, n: int, seed: int = 42):
    """Deterministic audio table (audio_id, bytes, caption): per-id
    sine+noise PCM16 WAVs (functions/audio.synth_samples), generated
    distributed."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("audio_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("caption", StringType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.audio import encode_wav, synth_samples
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rate, samples = synth_samples(i, seed)
                rows.append(dict(audio_id=f"aud{i:08d}",
                                 bytes=encode_wav(samples, rate),
                                 caption=f"synthetic utterance {i}"))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)


def audio_features(df, id_col: str = "audio_id", bytes_col: str = "bytes"):
    """(id, rate, channels, n_frames, duration_ms, rms, peak, zcr,
    decode_ok) — one WAV parse per row, poison-tolerant."""
    from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                                   StringType, StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("decode_ok", BooleanType()),
    ])

    def _extract(iterator):
        from colly_spark.functions.audio import audio_stats, decode_wav
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    rate, samples = decode_wav(bytes(data))
                    st = audio_stats(samples, rate)
                    rows.append(dict({id_col: rid, "decode_ok": True}, **st))
                except Exception:
                    rows.append({id_col: rid, "rate": None, "channels": None,
                                 "n_frames": None, "duration_ms": None,
                                 "rms": None, "peak": None, "zcr": None,
                                 "decode_ok": False})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_extract, schema=schema)


def synthesize_audio_fp(spark, n: int, seed: int = 42,
                        n_variants: int = 0, shift: int = 512,
                        gain: float = 0.8):
    """Deterministic audio table for FINGERPRINTING (audio_id, bytes):
    per-id multi-segment tone signals (functions/audio.synth_fp_samples
    — long enough for landmark fan-out, time-varying constellation).

    ``n_variants`` appends near-duplicate rows: audio ``n + j`` is
    audio ``j`` delayed by ``shift`` samples (zero-prefix, same
    length) at ``gain`` — the re-encode/re-broadcast situation audio
    fingerprint dedup exists for. With shift a multiple of the STFT
    hop, the true pair aligns at one coherent frame offset."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("audio_id", StringType()),
        StructField("bytes", BinaryType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.audio import encode_wav, synth_fp_samples
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base_i = i if i < n else i - n
                rate, x = synth_fp_samples(base_i, seed)
                if i >= n:
                    y = np.zeros_like(x)
                    y[shift:] = x[:-shift]
                    x = np.clip(np.round(y * gain),
                                -32768, 32767).astype(np.int16)
                rows.append(dict(audio_id=f"aud{i:08d}",
                                 bytes=encode_wav(x, rate)))
            yield pd.DataFrame(rows)

    return spark.range(n + n_variants).mapInPandas(_gen, schema=schema)


def audio_fingerprints(df, id_col: str = "audio_id",
                       bytes_col: str = "bytes", **landmark_kw):
    """(id, fp_hash, t, decode_ok): Shazam-style constellation
    landmarks (functions/audio.spectral_landmarks) per WAV, one
    decode per row inside mapInPandas, poison-tolerant (an
    undecodable container yields one decode_ok=False row). Map-side
    only; the landmark fan-out happens inside the Arrow batch."""
    from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("fp_hash", LongType()),
        StructField("t", IntegerType()),
        StructField("decode_ok", BooleanType()),
    ])

    def _fp(iterator):
        from colly_spark.functions.audio import decode_wav, spectral_landmarks
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    _rate, samples = decode_wav(bytes(data))
                    for h, t in spectral_landmarks(samples, **landmark_kw):
                        rows.append({id_col: rid, "fp_hash": h, "t": t,
                                     "decode_ok": True})
                except Exception:
                    rows.append({id_col: rid, "fp_hash": None, "t": None,
                                 "decode_ok": False})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_fp, schema=schema)


def audio_near_dup_pairs(fp_df, min_matches: int = 40,
                         hash_cap: int = 64, id_col: str = "audio_id"):
    """Audio near-duplicate pairs by time-coherent fingerprint
    matching (Wang, ISMIR 2003) — the audio member of the media
    dedup triptych (image phash / video frame-phash / this), pure
    Catalyst end to end:

    1. STOP-HASHES — a hash appearing in more than ``hash_cap``
       distinct audios is dropped first (the LSH oversized-bucket
       discipline: a constant-tone hash shared by 10^6 files would
       otherwise explode the candidate join quadratically).
    2. CANDIDATES — equi-join on fp_hash (bucketed by the hash key,
       never all-pairs), id_a < id_b, each match carrying the frame
       offset Δt = t_a − t_b.
    3. VERIFY — true duplicates agree on ONE coherent offset: vote
       per (pair, Δt), keep pairs whose best offset gathers
       ≥ ``min_matches`` votes (spurious hash collisions scatter
       across offsets and never line up: on the synthetic variant
       corpus chance alignment tops out at 30 votes while planted
       shifted/re-gained duplicates carry 228+ — the default sits
       in that gap with margin both ways).

    Returns (audio_a, audio_b, aligned, best_dt) — ``aligned`` the
    winning offset's vote count, ``best_dt`` the smallest offset
    among tied winners (deterministic). Integer arithmetic end to
    end; the DuckDB oracle replays it bit-exactly.

    CALLER CONTRACT: the plan references ``fp_df`` four ways (stop-
    hash count + the rare filter + both join sides) — materialize
    the fingerprint pass first (parquet, or localCheckpoint in
    session) or the WAV decode re-runs per reference."""
    from pyspark.sql import functions as F

    f = (fp_df.filter(F.col("decode_ok") & F.col("fp_hash").isNotNull())
         .select(F.col(id_col).alias("id"), "fp_hash", "t"))
    rare = (f.groupBy("fp_hash")
            .agg(F.countDistinct("id").alias("n_ids"))
            .filter(F.col("n_ids") <= hash_cap)
            .select("fp_hash"))
    f = f.join(rare, "fp_hash")
    a = f.select(F.col("id").alias("audio_a"), "fp_hash",
                 F.col("t").alias("ta"))
    b = f.select(F.col("id").alias("audio_b"), "fp_hash",
                 F.col("t").alias("tb"))
    votes = (a.join(b, "fp_hash")
             .filter(F.col("audio_a") < F.col("audio_b"))
             .withColumn("dt", F.col("ta") - F.col("tb"))
             .groupBy("audio_a", "audio_b", "dt")
             .agg(F.count(F.lit(1)).alias("v")))
    best = (votes.groupBy("audio_a", "audio_b")
            .agg(F.max(F.struct(F.col("v").alias("v"),
                                (-F.col("dt")).alias("ndt")))
                 .alias("best"))
            .select("audio_a", "audio_b",
                    F.col("best.v").alias("aligned"),
                    (-F.col("best.ndt")).cast("int").alias("best_dt")))
    return (best.filter(F.col("aligned") >= min_matches)
            .select("audio_a", "audio_b", "aligned", "best_dt"))


def synth_video_frames(i: int, seed: int = 42, size: int = 16):
    """Deterministic per-(video, frame) pixel planes: seeded base
    scene + per-frame brightness drift (so consecutive frames are
    near-dups — the shape frame-level phash dedup exists for)."""
    n_frames = 3 + (i % 3)
    rng = np.random.default_rng(seed * 7_777_777 + i)
    base = rng.integers(0, 200, size=(size, size, 3), dtype=np.uint8)
    return [np.clip(base.astype(np.int16) + 11 * k, 0, 255).astype(np.uint8)
            for k in range(n_frames)]


def synthesize_videos(spark, n: int, seed: int = 42, size: int = 16,
                      quality: int = 95, n_variants: int = 0,
                      variant_quality: int = 60):
    """Deterministic MJPEG-AVI table (video_id, bytes, w, h, n_frames,
    fps), frames JPEG-encoded by the from-scratch codec, generated
    distributed.

    ``n_variants`` appends near-duplicate rows (the synthesize_images
    discipline): video ``n + j`` is a lossy re-encode of video ``j``'s
    frames at ``variant_quality`` — same pixels, different bytes, the
    re-upload/re-compression situation video near-dup exists for.
    Measured per-frame phash Hamming of these variants is 0-2 bits."""
    from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.avi import encode_mjpeg_avi
        from colly_spark.functions.jpeg import encode_jpeg
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base_i = i if i < n else i - n
                q = quality if i < n else variant_quality
                frames = [encode_jpeg(px, quality=q)
                          for px in synth_video_frames(base_i, seed, size)]
                fps = (5, 10, 15)[base_i % 3]
                rows.append(dict(
                    video_id=f"vid{i:08d}",
                    bytes=encode_mjpeg_avi(frames, size, size, fps),
                    w=size, h=size, n_frames=len(frames), fps=fps))
            yield pd.DataFrame(rows)

    return spark.range(n + n_variants).mapInPandas(_gen, schema=schema)


def video_frame_sample(df, every: int = 2, id_col: str = "video_id",
                       bytes_col: str = "bytes"):
    """(id, frame_idx, w, h, phash, decode_ok): every Nth frame of
    each container, decoded and phashed. Undecodable containers yield
    one decode_ok=False row; undecodable single frames yield
    decode_ok=False for that frame only.

    Containers are sniffed per row: RIFF MJPEG-AVI (functions/avi.py,
    frames decoded by the from-scratch T.81 JPEG codec) and animated
    GIF (functions/gif.py, frames composited then sampled) — so a
    mixed media column flows through ONE operator and both feed the
    same frame-phash near-dup stack."""
    from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("phash", LongType()),
        StructField("decode_ok", BooleanType()),
    ])

    def _sample(iterator):
        from colly_spark.functions.avi import sample_frames
        from colly_spark.functions.gif import decode_gif_frames
        from colly_spark.functions.images import phash64
        from colly_spark.functions.jpeg import decode_jpeg
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data)
                if data[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: compositing is sequential, so all
                    # frames decode once and every Nth is kept
                    try:
                        frames = decode_gif_frames(data)
                    except Exception:
                        rows.append({id_col: rid, "frame_idx": None,
                                     "w": None, "h": None, "phash": None,
                                     "decode_ok": False})
                        continue
                    for idx, (px, _delay) in enumerate(frames):
                        if idx % every:
                            continue
                        rows.append({id_col: rid, "frame_idx": idx,
                                     "w": px.shape[1], "h": px.shape[0],
                                     "phash": phash64(px),
                                     "decode_ok": True})
                    continue
                try:
                    picks = sample_frames(data, every)
                except Exception:
                    rows.append({id_col: rid, "frame_idx": None, "w": None,
                                 "h": None, "phash": None,
                                 "decode_ok": False})
                    continue
                for idx, jpg in picks:
                    try:
                        px = decode_jpeg(jpg)
                        rows.append({id_col: rid, "frame_idx": idx,
                                     "w": px.shape[1], "h": px.shape[0],
                                     "phash": phash64(px),
                                     "decode_ok": True})
                    except Exception:
                        rows.append({id_col: rid, "frame_idx": idx,
                                     "w": None, "h": None, "phash": None,
                                     "decode_ok": False})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_sample, schema=schema)


def synthesize_animated_gifs(spark, n: int, seed: int = 42, size: int = 16,
                             n_variants: int = 0):
    """Deterministic animated-GIF table (video_id, bytes, w, h,
    n_frames) over the SAME per-(video, frame) pixel generator as
    synthesize_videos (synth_video_frames), encoded by the
    from-scratch GIF writer — so GIFs exercise the identical frame
    pipeline through a second container format.

    ``n_variants`` appends near-duplicate rows: gif ``n + j`` encodes
    video ``j``'s frames JPEG-degraded at q85 first (pixels drift like
    a re-encode, bytes/container differ) — the cross-format re-upload
    situation the frame-phash near-dup stack exists for."""
    from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.gif import encode_gif_animated
        from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base_i = i if i < n else i - n
                frames = synth_video_frames(base_i, seed, size)
                if i >= n:
                    frames = [decode_jpeg(encode_jpeg(px, quality=85))
                              for px in frames]
                data = encode_gif_animated(frames, [10] * len(frames))
                rows.append(dict(video_id=f"gif{i:08d}", bytes=data,
                                 w=size, h=size, n_frames=len(frames)))
            yield pd.DataFrame(rows)

    return spark.range(n + n_variants).mapInPandas(_gen, schema=schema)


def video_near_dup_pairs(frames_df, k: int = 3, n_bands: int = 4,
                         tau: float = 0.5, align_window: int = 1,
                         id_col: str = "video_id"):
    """Video near-duplicate pairs from sampled frame phashes — the
    temporal extension of the image stack's ``phash_near_dup_pairs``
    (Manku et al. WWW'07), pure Catalyst end to end.

    Input: ``video_frame_sample``'s output (id, frame_idx, phash,
    decode_ok). Two stages, both candidate-bounded:

    1. CANDIDATES — split each sampled frame's 64-bit phash into
       ``n_bands`` disjoint blocks; by pigeonhole a frame pair within
       Hamming ``k < n_bands`` agrees exactly on ≥1 block, so an
       equi-join on (band, block_value) finds every video pair that
       shares even ONE near-identical frame. Never all-pairs: the
       join is bucketed by the 2^16-value band key, and at 10^10
       frames the same permuted-prefix-table scaling as the image
       operator applies.
    2. VERIFY — for candidate pairs only, count the distinct frames
       of each video with a temporally-aligned partner
       (|Δframe_idx| ≤ ``align_window``, Hamming ≤ ``k``); a pair is
       a near-dup when matched / min(n_a, n_b) ≥ ``tau``. The score
       is emitted as integral parts-per-million (floor) so the
       DuckDB oracle replays it bit-exactly — no float division in
       the decision.

    Returns (video_a, video_b, matched, n_a, n_b, score_ppm),
    video_a < video_b. Undecodable rows are excluded up front (a
    poison frame can't create or destroy a pair beyond its absence).

    CALLER CONTRACT: this plan references ``frames_df`` four ways
    (sizes + band explode + both verify sides) — materialize the
    frame-sampling pass first (write the phash table to parquet; in
    session, localCheckpoint) or the container decode re-runs per
    reference.
    """
    from pyspark.sql import functions as F

    assert k < n_bands, "pigeonhole completeness requires k < n_bands"
    assert 64 % n_bands == 0
    tau_ppm = int(round(tau * 1_000_000))
    f = (frames_df
         .filter(F.col("decode_ok") & F.col("phash").isNotNull())
         .select(F.col(id_col).alias("id"), "frame_idx", "phash"))
    sizes = f.groupBy("id").agg(
        F.countDistinct("frame_idx").alias("nf"))
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    band_structs = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("phash"), i * bits)
            .bitwiseAND(F.lit(mask)).alias("val"))
        for i in range(n_bands)])
    bands = (f.select("id", F.explode(band_structs).alias("bv"))
             .select("id", F.col("bv.band").alias("band"),
                     F.col("bv.val").alias("val")))
    cand = (bands.select(F.col("id").alias("video_a"), "band", "val")
            .join(bands.select(F.col("id").alias("video_b"), "band", "val"),
                  ["band", "val"])
            .filter(F.col("video_a") < F.col("video_b"))
            .select("video_a", "video_b").distinct())
    fa = f.select(F.col("id").alias("video_a"),
                  F.col("frame_idx").alias("ia"), F.col("phash").alias("pa"))
    fb = f.select(F.col("id").alias("video_b"),
                  F.col("frame_idx").alias("ib"), F.col("phash").alias("pb"))
    matched = (cand.join(fa, "video_a").join(fb, "video_b")
               .filter((F.abs(F.col("ia") - F.col("ib"))
                        <= F.lit(align_window))
                       & (F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                          <= F.lit(k)))
               .groupBy("video_a", "video_b")
               .agg(F.countDistinct("ia").alias("matched")))
    na = sizes.select(F.col("id").alias("video_a"), F.col("nf").alias("n_a"))
    nb = sizes.select(F.col("id").alias("video_b"), F.col("nf").alias("n_b"))
    return (matched.join(na, "video_a").join(nb, "video_b")
            .withColumn("score_ppm",
                        F.floor(F.col("matched") * F.lit(1_000_000)
                                / F.least("n_a", "n_b")).cast("long"))
            .filter(F.col("matched") * F.lit(1_000_000)
                    >= F.lit(tau_ppm) * F.least("n_a", "n_b"))
            .select("video_a", "video_b", "matched", "n_a", "n_b",
                    "score_ppm"))


def synthesize_mp4s(spark, n: int, seed: int = 42):
    """Deterministic MP4 metadata table (video_id, bytes): per-id
    dims/duration/codec/brand stubs (functions/mp4.encode_mp4_stub) —
    structurally valid ISO BMFF with no decodable bitstream, which is
    exactly what a metadata-admission stage consumes."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
    ])

    def _gen(iterator):
        from colly_spark.functions.mp4 import encode_mp4_stub
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = mp4_params(i, seed)
                rows.append(dict(
                    video_id=f"mp4{i:08d}",
                    bytes=encode_mp4_stub(p["w"], p["h"], p["duration_ms"],
                                          codec=p["codec"], brand=p["brand"],
                                          timescale=p["timescale"],
                                          mdat=b"\x00" * (64 + i % 512))))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)


def mp4_params(i: int, seed: int = 42) -> dict:
    """The deterministic per-id parameter draw shared by synthesis and
    the golden-oracle generator (which never touches the bytes)."""
    return dict(
        w=(320, 640, 1280, 1920)[i % 4],
        h=(240, 360, 720, 1080)[i % 4],
        duration_ms=1000 + (i * 731) % 600_000,
        codec=("avc1", "hvc1", "av01", "mp4v")[(i // 4) % 4],
        brand=("isom", "mp42")[(i // 16) % 2],
        timescale=(600, 1000, 90000)[i % 3])


def mp4_probe_features(df, id_col: str = "video_id",
                       bytes_col: str = "bytes"):
    """(id, brand, codec, w, h, duration_ms, n_tracks, video_tracks,
    probe_ok): container metadata WITHOUT decoding — the admission
    gate for codecs (H.264+) outside honest from-scratch decode reach.
    Map-side, poison-tolerant; at an object store this is a range GET
    of the moov box per file."""
    from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField(id_col, StringType()),
        StructField("brand", StringType()),
        StructField("codec", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_tracks", IntegerType()),
        StructField("video_tracks", IntegerType()),
        StructField("probe_ok", BooleanType()),
    ])

    def _probe(iterator):
        from colly_spark.functions.mp4 import probe_mp4
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    info = probe_mp4(bytes(data))
                    rows.append({id_col: rid, "probe_ok": True,
                                 "brand": info["brand"],
                                 "codec": info["codec"],
                                 "w": info["w"], "h": info["h"],
                                 "duration_ms": info["duration_ms"],
                                 "n_tracks": info["n_tracks"],
                                 "video_tracks": info["video_tracks"]})
                except Exception:
                    rows.append({id_col: rid, "probe_ok": False,
                                 "brand": None, "codec": None, "w": None,
                                 "h": None, "duration_ms": None,
                                 "n_tracks": None, "video_tracks": None})
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(_probe, schema=schema)
