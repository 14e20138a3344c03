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
                      quality: int = 95):
    """Deterministic MJPEG-AVI table (video_id, bytes, w, h, n_frames,
    fps), frames JPEG-encoded by the from-scratch codec, generated
    distributed."""
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
                frames = [encode_jpeg(px, quality=quality)
                          for px in synth_video_frames(i, seed, size)]
                fps = (5, 10, 15)[i % 3]
                rows.append(dict(
                    video_id=f"vid{i:08d}",
                    bytes=encode_mjpeg_avi(frames, size, size, fps),
                    w=size, h=size, n_frames=len(frames), fps=fps))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)


def video_frame_sample(df, every: int = 2, id_col: str = "video_id",
                       bytes_col: str = "bytes"):
    """(id, frame_idx, w, h, phash, decode_ok): every Nth frame of
    each container, decoded and phashed. Undecodable containers yield
    one decode_ok=False row; undecodable single frames yield
    decode_ok=False for that frame only."""
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
        from colly_spark.functions.images import phash64
        from colly_spark.functions.jpeg import decode_jpeg
        for pdf in iterator:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    picks = sample_frames(bytes(data), every)
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
