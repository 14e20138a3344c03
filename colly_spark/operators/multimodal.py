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

Real JPEG/WebP/AVIF decoders are not in this container — the codecs
module stubs them (NotImplementedError) behind the same interface; the
Spark plumbing (binary columns, mapInPandas batch shape, metadata
schema) is identical in deployment and is what's tested here. Decode
runs map-side only; rows are round-robin repartitioned first so a few
huge images can't skew a partition.
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


def synthesize_images(spark, n: int, seed: int = 42, size: int = 16):
    """Deterministic image table (input_hint schema) generated
    *distributed*: ids partitioned via spark.range, pixels seeded per
    id, encoded with the real PNG codec (even ids) / stand-in lossy
    codec (odd ids). Stand-in for reading an image lake at 100 TB —
    the downstream plumbing is identical."""
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
        from colly_spark.functions.images import (encode_lossy, encode_png,
                                                  decode_image, phash64)
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
                fmt = "png" if i % 2 == 0 else "jpeg"
                data = encode_png(px) if fmt == "png" else encode_lossy(px)
                rows.append(dict(
                    image_id=f"img{i:08d}", bytes=data, w=size, h=size, fmt=fmt,
                    caption=f"synthetic caption {i}",
                    phash=phash64(decode_image(data, fmt))))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(_gen, schema=schema)


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
