"""Progressive (SOF2) JPEG decode — functions/jpeg.py Annex-G path.

Evidence strategy:

- A hermetic KAT: a real libjpeg-produced progressive stream
  (jpeg_simple_progression's 10-scan script + restart_interval=3,
  deterministic 21x37 gradient) is embedded as base64 with the decoded
  pixel sha256 pinned.  Runs everywhere, no native library needed.
- libjpeg-gated sweeps (functions/native_codecs.py binding): for the
  same pixels encoded baseline AND progressive by libjpeg, our decoder
  must produce BIT-IDENTICAL output for both — the scan script changes
  the entropy coding, never the quantized coefficients, so any
  coefficient mistake in the DC-first / DC-refine / AC-first(EOB-run) /
  AC-refine(correction-bit) paths breaks the equality.
- Grayscale cross-validation directly against libjpeg's own pixel
  output (single component -> no upsampler ambiguity; |diff| <= 1 is
  the islow-integer-IDCT-vs-float-IDCT rounding envelope).
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
from colly_spark.functions.native_codecs import (
    decode_jpeg_native,
    encode_jpeg_native,
    jpeg_native_available,
)

needs_libjpeg = pytest.mark.skipif(
    not jpeg_native_available(), reason="libjpeg.so.62 backend unavailable")

# libjpeg-turbo encode of a deterministic 21x37 gradient (q80,
# jpeg_simple_progression, restart_interval=3); see the generator in
# this file's git history / test_embedded_fixture_regen below.
PROG_21X37_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAYEBQYFBAYGBQYHBwYIChAKCgkJChQODwwQFxQY"
    "GBcUFhYaHSUfGhsjHBYWICwgIyYnKSopGR8tMC0oMCUoKSj/2wBDAQcHBwoIChMKChMoGhYa"
    "KCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCj/wgAR"
    "CAAVACUDASIAAhEBAxEB/8QAGAAAAwEBAAAAAAAAAAAAAAAAAAUGBAP/xAAYAQADAQEAAAAA"
    "AAAAAAAAAAACAwUEBv/dAAQAA//aAAwDAQACEAMQAAABiqxVWElDxe49yW53I0r/0M1YFS2q"
    "xhxx1ACpH//EABsQAAICAwEAAAAAAAAAAAAAAAADAQQCBREi/9oACAEBAAEFAqyyss3Cz//Q"
    "rLFL81ln/9Gss3CxHIP/0lxMxWxK2J//093PStiKx8//xAAcEQABBAMBAAAAAAAAAAAAAAAC"
    "AAEEEQOBsQX/2gAIAQMBAT8Bnw1ihXGHfUXnPa//0J4ssQC0Ud9Ri1r/xAAdEQACAgIDAQAA"
    "AAAAAAAAAAABAwACEeEEBRMh/9oACAECAQE/AWIi/NHFFmHA3LdwoH5Uz//QaIpt3JFmHJ3C"
    "J//EABgQAAMBAQAAAAAAAAAAAAAAAAQQgsEA/9oACAEBAAY/AkPWd//Qf//R4esX/9J//9Me"
    "sf8A/8QAHBAAAgICAwAAAAAAAAAAAAAAAAEhMRARQVFx/9oACAEBAAE/IaCjFP/QoxKD/9Gj"
    "FIKS2z//0tl214JgRB//02da4IIgUP/aAAwDAQACAAMAAAAQB+N//9AB37//xAAZEQADAQEB"
    "AAAAAAAAAAAAAAAAASER8DH/2gAIAQMBAT8Q9YPSS4xun//QrgsEuMacP//EABwRAAICAgMA"
    "AAAAAAAAAAAAAAABITFRcRFhkf/aAAgBAgEBPxDqHQ6S9qVvSHlPLMI//9BGBwyS9vBPNH//"
    "xAAcEAADAQACAwAAAAAAAAAAAAAAAVERECExgfD/2gAIAQEAAT8QlJSUf//QlISU/9GUkFHY"
    "H00vC9n/0pQOmaXN/wD/08Bv2D4/HP/Z"
)


def _fixture_pixels():
    yy, xx = np.mgrid[0:21, 0:37]
    return np.stack([(yy * 11 + 3) % 256, (xx * 13 + 7) % 256,
                     (xx * 5 + yy * 9) % 256], axis=-1).astype(np.uint8)


def test_embedded_progressive_kat():
    """Hermetic: a real libjpeg progressive stream (SOF2 + RSTn)
    decodes; pixel sha256 pinned as a regression golden."""
    assert b"\xff\xc2" in PROG_21X37_JPG            # really SOF2
    assert b"\xff\xd0" in PROG_21X37_JPG            # really has restarts
    px = decode_jpeg(PROG_21X37_JPG)
    assert px.shape == (21, 37, 3)
    assert hashlib.sha256(px.tobytes()).hexdigest() == (
        "5b3439153dbe7b4544bc43c669cac0bc03d7c6ea5bfc21442a47704ae1918e88")


@needs_libjpeg
def test_embedded_fixture_regen():
    """The embedded bytes are exactly what the pinned generator inputs
    produce under the container's libjpeg (provenance check)."""
    data = encode_jpeg_native(_fixture_pixels(), quality=80,
                              progressive=True, restart_interval=3)
    assert data == PROG_21X37_JPG


@needs_libjpeg
def test_progressive_equals_baseline_sweep():
    """Core invariant: for the same pixels and quality, libjpeg's
    baseline and progressive encodes decode to bit-identical pixels
    through our decoder (identical coefficients, different entropy
    coding).  Sweeps dims (incl. sub-8x8 and non-multiples), quality,
    grayscale/color, restart intervals."""
    rng = np.random.default_rng(77)
    for _ in range(16):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        q = int(rng.choice([5, 25, 50, 75, 92, 99]))
        gray = bool(rng.integers(0, 2))
        restart = int(rng.choice([0, 0, 1, 2, 5]))
        kind = rng.choice(["noise", "gradient", "flat"])
        shape = (h, w) if gray else (h, w, 3)
        if kind == "noise":
            px = rng.integers(0, 256, shape, dtype=np.uint8)
        elif kind == "flat":
            px = np.full(shape, int(rng.integers(256)), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
            px = g if gray else np.stack([g, (255 - g), g // 2], axis=-1)
        base = encode_jpeg_native(px, q, progressive=False, restart_interval=restart)
        prog = encode_jpeg_native(px, q, progressive=True, restart_interval=restart)
        assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
        mb = decode_jpeg(base)
        mp = decode_jpeg(prog)
        assert np.array_equal(mb, mp), (h, w, q, gray, restart, kind)


@needs_libjpeg
def test_grayscale_matches_libjpeg_within_idct_rounding():
    """Single-component progressive: our pixels vs libjpeg's own decode
    differ by at most 1 LSB (float vs islow integer IDCT)."""
    rng = np.random.default_rng(3)
    for q in (10, 50, 90, 99):
        g = rng.integers(0, 256, (33, 47), dtype=np.uint8)
        data = encode_jpeg_native(g, q, progressive=True)
        mine = decode_jpeg(data)[..., 0].astype(int)
        ref = decode_jpeg_native(data).astype(int)
        assert np.abs(mine - ref).max() <= 1, q


@needs_libjpeg
def test_color_matches_libjpeg_psnr():
    """3-component progressive vs libjpeg decode: the only systematic
    difference is box vs fancy 4:2:0 chroma upsampling; PSNR stays
    high on smooth content."""
    from colly_spark.functions.images import psnr
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack([(yy * 3) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256],
                  axis=-1).astype(np.uint8)
    data = encode_jpeg_native(px, 92, progressive=True)
    assert psnr(decode_jpeg(data), decode_jpeg_native(data)) >= 38.0


@needs_libjpeg
def test_our_encoder_survives_libjpeg():
    """Independent check the other way: libjpeg decodes our from-scratch
    baseline bytes to the same pixels our decoder sees (4:4:4, so no
    upsampler ambiguity; |diff| <= 2 — float fDCT feeding islow iIDCT
    compounds two rounding envelopes)."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    data = encode_jpeg(px, quality=95)
    mine = decode_jpeg(data).astype(int)
    ref = decode_jpeg_native(data).astype(int)
    assert np.abs(mine - ref).max() <= 2


def test_invalid_progressive_scan_header_rejected():
    """A baseline stream whose SOF0 marker is flipped to SOF2 presents
    a Ss=0/Se=63 scan — illegal for progressive DC; clear error, not
    garbage pixels."""
    rng = np.random.default_rng(23)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
    idx = bytes(data).find(b"\xFF\xC0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))


def test_truncated_progressive_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(PROG_21X37_JPG[: len(PROG_21X37_JPG) // 3])
