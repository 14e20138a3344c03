"""Image payload codecs + validation (the BASELINE.json image axis).

The reference treats images as opaque bytes (response.go:189-194
noTextualData skips charset work for image/*); the payload semantics —
decode, pixel validation, PSNR — come from ``BASELINE.json``
input_hint: "decoded-pixel allclose (PSNR≥40dB for lossy) + caption
equality".

This container has no Python imaging packages, so the portable codecs
are from scratch (the system's native libwebp/libavif, bound via
ctypes in functions/native_codecs.py, back them up and independently
verify them):

- ``png``: a REAL minimal PNG codec (RGB8, filter 0) over stdlib zlib.
  Lossless → decoded pixels must match exactly.
- ``jpeg``: a REAL from-scratch JPEG (ITU-T T.81/JFIF) codec —
  ``functions/jpeg.py`` — pure numpy, standard-decoder-compatible
  output; the decoder handles baseline, extended-sequential AND
  progressive (SOF2, all four Annex-G scan kinds), verified against
  libjpeg-produced files (tests/test_jpeg.py,
  tests/test_jpeg_progressive.py). Default quality 98 keeps PSNR ≈ 45dB even on
  the worst-case pure-noise fixture images (above the 40dB gate, below
  lossless). The round-1 stand-in codec ("QNT1": 6-bit quantization +
  zlib) remains readable for legacy payloads via magic sniffing.
- ``webp``: REAL from-scratch codecs for BOTH coding modes —
  VP8-L lossless (``functions/webp.py``, bit-exact vs genuine libwebp
  streams) and lossy VP8 intra (``functions/vp8.py``, YUV planes
  bit-exact vs libwebp's own decoder across quality/size/content
  sweeps).
- ``avif``: native-only via the system libavif (dav1d/aom) — a
  from-scratch AV1 decoder is out of honest reach.

All decode paths are vectorized at the Arrow-batch level (one Python
call per batch, numpy per image). ~100TB scale: images stay as opaque
``binary`` columns end-to-end; decode runs map-side only on the
partitions that need pixel validation, never in a shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QNT_MAGIC = b"QNT1"
_QNT_BITS = 6  # keep top 6 bits → step 4 → PSNR ≈ 46 dB


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG (filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode the subset of PNG produced by :func:`encode_png`
    (8-bit RGB, filter 0 or 1/2 unsupported → ValueError)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w * 3 + 1)
    if (raw[:, 0] != 0).any():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_lossy(pixels: np.ndarray, quality: int = 98) -> bytes:
    """Lossy encode = real baseline JPEG (functions/jpeg.py). Quality 98
    keeps even pure-noise fixture images above the 40dB PSNR gate."""
    from colly_spark.functions.jpeg import encode_jpeg

    return encode_jpeg(pixels, quality=quality)


def encode_qnt(pixels: np.ndarray) -> bytes:
    """Round-1 legacy stand-in codec (deterministic 6-bit quantization +
    zlib), kept so old parquet payloads remain decodable."""
    h, w, c = pixels.shape
    q = (pixels >> (8 - _QNT_BITS)).astype(np.uint8)
    header = _QNT_MAGIC + struct.pack(">HHB", w, h, _QNT_BITS)
    return header + zlib.compress(q.tobytes(), 6)


def decode_qnt(data: bytes) -> np.ndarray:
    if data[:4] != _QNT_MAGIC:
        raise ValueError("not a QNT1 payload")
    w, h, bits = struct.unpack(">HHB", data[4:9])
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    shift = 8 - bits
    # mid-rise reconstruction: center of the quantization bin
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


# back-compat alias (round-1 name)
decode_lossy = decode_qnt


# the formats this engine can decode from scratch, portable to any
# environment (pure Python/numpy, no native libraries)
DECODABLE_WEB_FMTS = ("png", "jpeg", "webp", "gif")


def decodable_web_fmts() -> tuple:
    """The formats THIS process can actually decode: the from-scratch
    set plus avif when the container's libavif is loadable (checked
    with a round-trip self-validation on first call). The
    corpus-admission default (operators/multimodal.image_corpus_filter)
    derives from this so metadata admission never outruns decode."""
    from colly_spark.functions.native_codecs import avif_native_available

    return DECODABLE_WEB_FMTS + (("avif",) if avif_native_available() else ())


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    data = bytes(data)
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg", "qnt"):
        # sniff: real JPEG (SOI marker) vs legacy QNT1 payloads
        if data[:2] == b"\xFF\xD8":
            from colly_spark.functions.jpeg import decode_jpeg

            return decode_jpeg(data)
        return decode_qnt(data)
    if fmt == "webp":
        # fully from scratch: VP8-L lossless + VP8 intra (functions/
        # webp.py + functions/vp8.py); the pure path is the canonical
        # one (deterministic in any environment) — use
        # native_codecs.decode_webp_native directly for bulk speed
        from colly_spark.functions.webp import decode_webp

        return decode_webp(data)
    if fmt == "gif":
        # from scratch (functions/gif.py, LZW + compositing), verified
        # bit-exact against giflib streams in both directions; animated
        # payloads decode to their first composited frame here (frame
        # sampling lives in operators/av.video_frame_sample)
        from colly_spark.functions.gif import decode_gif

        return decode_gif(data)
    if fmt == "avif":
        # native-only: a from-scratch AV1 decoder is out of honest
        # reach; libavif (dav1d/aom) is the production decode path
        from colly_spark.functions.native_codecs import decode_avif_native

        return decode_avif_native(data)
    raise NotImplementedError(
        f"format {fmt!r}: no decoder in this container; plug PIL/"
        "turbojpeg here in deployment (jpeg/png/webp are from-scratch, "
        "avif rides the system libavif)"
    )


def synth_pixels(i: int, seed: int = 42, size: int = 16,
                 scene: str = "noise") -> np.ndarray:
    """Deterministic per-id synthetic pixels — the one generator shared
    by operators/multimodal.synthesize_images and the golden replicas
    (scripts/make_golden.py), so engine and oracle see identical
    scenes. ``scene="noise"`` (default) is the original uniform-noise
    draw, byte-identical to the pre-scene generator (the noise block
    is always the FIRST rng draw). ``scene="mixed"`` makes even ids
    smooth (flat base + gentle ramp: near-zero sharpness, low entropy)
    and odd ids noise — the heterogeneous corpus an image-quality
    classifier needs (noise stats are indistinguishable across noise
    images, so a single-scene corpus has nothing to learn)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    if scene == "noise" or (scene == "mixed" and i % 2 == 1):
        return px
    if scene != "mixed":
        raise ValueError(f"unknown scene {scene!r}")
    base = rng.integers(0, 200, size=3)
    ramp = np.arange(size) * float(rng.integers(1, 4)) / 2.0
    sm = base[None, None, :] + ramp[None, :, None] + ramp[:, None, None]
    return np.clip(sm, 0, 255).astype(np.uint8)


def synth_encode(px: np.ndarray, enc: str):
    """Encode synthetic pixels with one of the corpus codecs and return
    ``(fmt, data, phash_of_decoded)``. Encoder names: png / jpeg
    (from-scratch baseline JPEG) / webp (from-scratch VP8-L) /
    webp_lossy (system libwebp VP8; fmt column stays "webp") / avif
    (system libavif). Shared by operators/multimodal.synthesize_images
    and the golden-fixture generator so both sides encode identically;
    the phash is always computed from the DECODED pixels, so lossy
    codecs contribute their real reconstruction."""
    if enc == "png":
        fmt, data = "png", encode_png(px)
    elif enc == "jpeg":
        fmt, data = "jpeg", encode_lossy(px)
    elif enc == "webp":
        from colly_spark.functions.webp import encode_webp

        fmt, data = "webp", encode_webp(px)
    elif enc == "gif":
        from colly_spark.functions.gif import encode_gif

        fmt, data = "gif", encode_gif(px)
    elif enc == "webp_lossy":
        from colly_spark.functions.native_codecs import encode_webp_native

        fmt, data = "webp", encode_webp_native(px, quality=95.0)
    elif enc == "avif":
        from colly_spark.functions.native_codecs import encode_avif_native

        fmt, data = "avif", encode_avif_native(px, max_quantizer=4)
    else:
        raise ValueError(f"unknown synthetic encoder {enc!r}")
    return fmt, data, phash64(decode_image(data, fmt))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: average-hash over an 8×8 luma downsample
    (public aHash construction). Deterministic, numpy-only; used to
    populate/validate the ``phash`` column of the images table."""
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    )
    h, w = luma.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out


def validate_batch(bodies, fmts, ref_bodies, ref_fmts, min_psnr_db: float = 40.0):
    """Batch validation kernel used by the images pytest oracle and the
    crawl pipeline's image-validation stage: decode fetched bytes and
    reference bytes, return (ok: list[bool], psnr_db: list[float]).

    Lossless (png, webp/VP8-L): exact pixel equality required.
    Lossy (jpeg, webp/VP8, avif): PSNR ≥ min_psnr_db against the
    reference pixels.
    """

    def _is_lossless(body: bytes, fmt: str) -> bool:
        if fmt == "png":
            return True
        if fmt == "webp":  # VP8L chunk = lossless, 'VP8 ' = lossy
            return b"VP8L" in body[:32]
        return False

    oks, psnrs = [], []
    for body, fmt, ref_body, ref_fmt in zip(bodies, fmts, ref_bodies, ref_fmts):
        try:
            body, ref_body = bytes(body), bytes(ref_body)
            got = decode_image(body, fmt)
            ref = decode_image(ref_body, ref_fmt)
            if got.shape != ref.shape:
                oks.append(False), psnrs.append(0.0)
                continue
            p = psnr(got, ref)
            if _is_lossless(body, fmt) and _is_lossless(ref_body, ref_fmt):
                oks.append(bool(np.array_equal(got, ref)))
            else:
                oks.append(bool(p >= min_psnr_db))
            psnrs.append(p if p != float("inf") else 99.0)
        except Exception:
            oks.append(False)
            psnrs.append(0.0)
    return oks, psnrs
