"""From-scratch baseline JPEG codec (functions/jpeg.py) — roundtrip,
spec KATs, and cross-validation against real libjpeg-produced files.

The two KAT payloads are tiny public test images embedded as base64 so
the suite stays hermetic:

- PY_LOGO_JPG: CPython Lib/test/imghdrdata/python.jpg (PSF-licensed
  CPython test data) — baseline SOF0, 3 components, 4:2:0 (luma 2×2
  sampling), two quant tables, four Huffman tables.  Produced by a real
  libjpeg encoder, so decoding it exercises marker parsing, chroma
  upsampling, and Huffman streams our own encoder never emits.
- GRAY_2X2_JPG: IPython test data (BSD) — grayscale baseline 2×2.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from colly_spark.functions.jpeg import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _canonical_codes,
    _quality_table,
    _T,
    QT_LUMA,
    decode_jpeg,
    encode_jpeg,
)
from colly_spark.functions.images import psnr

PY_LOGO_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)
GRAY_2X2_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
    "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
    "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
    "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
    "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
    "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
    "AAA/ACv/2Q=="
)


def test_dct_matrix_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)


def test_annex_k_canonical_codes():
    # publicly tabulated code assignments (T.81 Annex K.3):
    # luma DC category 0 → '00' (2 bits); luma AC EOB (0x00) → '1010'
    # (4 bits); luma AC ZRL (0xF0) → 11 bits '11111111001'
    dc = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    assert dc[0] == (0b00, 2)
    assert dc[1] == (0b010, 3)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0x01] == (0b00, 2)
    assert ac[0xF0] == (0b11111111001, 11)


def test_quality_table_scaling():
    # IJG formula: q=50 → base table unchanged; q=100 → all ones
    assert np.array_equal(_quality_table(QT_LUMA, 50), QT_LUMA)
    assert np.array_equal(_quality_table(QT_LUMA, 100), np.ones(64, dtype=np.int64))
    assert _quality_table(QT_LUMA, 10)[0] == (16 * 500 + 50) // 100


def test_roundtrip_noise_psnr():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=98))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0  # noise is JPEG's worst case


def test_roundtrip_smooth_high_psnr():
    yy, xx = np.mgrid[0:48, 0:80]
    px = np.stack([(yy * 3) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256],
                  axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert psnr(px, out) >= 50.0


def test_roundtrip_grayscale():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=98))
    assert out.shape == (16, 24, 3)
    assert psnr(np.stack([g] * 3, axis=-1), out) >= 40.0


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(9, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=98))
    assert out.shape == (9, 17, 3)
    assert psnr(px, out) >= 40.0


def test_deterministic_bytes():
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert encode_jpeg(px) == encode_jpeg(px)


def test_decode_real_libjpeg_420_file():
    """Cross-validation: a real libjpeg-produced 4:2:0 baseline file
    decodes; pixel sha256 pinned as a regression golden."""
    px = decode_jpeg(PY_LOGO_JPG)
    assert px.shape == (16, 16, 3)
    assert hashlib.sha256(px.tobytes()).hexdigest() == (
        "2a250932a73d84184d7996ac55ab3fb2f8c761ea3e2ce85731437fa0426aaece")


def test_decode_real_grayscale_file():
    px = decode_jpeg(GRAY_2X2_JPG)
    assert px.shape == (2, 2, 3)
    # flat mid-gray image (all three replicated channels equal)
    assert np.array_equal(px[..., 0], px[..., 1])
    assert hashlib.sha256(px.tobytes()).hexdigest() == (
        "c24a626b5e13b2275e5692f61559d553b5ec7cc1668b5808e91bddfc27993b69")


def test_output_is_valid_marker_stream():
    """Structural check of our own bytes: SOI..EOI, well-formed
    segments, no bare 0xFF inside the entropy stream."""
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(px)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    import struct
    pos, saw_sos = 2, False
    while not saw_sos:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker == 0xDA:
            saw_sos = True
        pos += 2 + ln
    scan = data[pos:-2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 2
        else:
            i += 1


def test_lossless_sof_rejected():
    # flip SOF0 to SOF3 (lossless) in a minimal stream → clear error
    # (progressive SOF2 is now SUPPORTED — tests/test_jpeg_progressive.py)
    rng = np.random.default_rng(23)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
    idx = bytes(data).find(b"\xFF\xC0")
    data[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg(bytes(data))


def test_truncated_stream_rejected():
    rng = np.random.default_rng(29)
    data = encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_roundtrip_property_random_dims():
    """Property sweep: any (h, w) in [1, 40], any content class, the
    codec round-trips with correct dims and bounded error (q=98 step
    sizes bound per-coefficient error; 25dB is a loose floor that only
    a codec bug would cross)."""
    rng = np.random.default_rng(101)
    for _ in range(25):
        h = int(rng.integers(1, 41))
        w = int(rng.integers(1, 41))
        kind = rng.choice(["noise", "flat", "gradient"])
        if kind == "noise":
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == "flat":
            px = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(yy * 5) % 256, (xx * 5) % 256,
                           ((xx + yy) * 3) % 256], axis=-1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=98))
        assert out.shape == (h, w, 3), (h, w, kind)
        assert psnr(px, out) >= 25.0, (h, w, kind, psnr(px, out))
