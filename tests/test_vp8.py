"""From-scratch VP8 intra decoder (functions/vp8.py) — RFC 6386.

The gate is adversarial and binary: decoded Y/U/V planes must be
BIT-EXACT equal to the independent system libwebp's own decoder
(WebPDecodeYUV) on genuine libwebp-encoded streams. One wrong byte in
any normative table (vp8_tables.py), one off-by-one in a predictor,
context rule, dequant clamp, or loop-filter tap, and these fail.

Coverage axes: content class (flat / gradients / noise / block
mosaic / photo-like), frame size (single MB, multi-MB, width and
height NOT multiples of 16), quality 5..99 (low q exercises strong
loop filtering and segment quantizers; high q exercises dense token
streams), plus the genuine third-party file python.webp (CPython test
data). The RGB conversion path is checked against libwebp's RGB output
by PSNR (different upsampler — closeness, not equality).

Honest gaps (not exercised by libwebp's simple encode API, noted in
the module): multi-partition token streams, the simple loop filter,
and nonzero sharpness are implemented per spec but not covered by
these fixtures.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from colly_spark.functions import native_codecs as nc
from colly_spark.functions.vp8 import decode_vp8, yuv420_to_rgb
from colly_spark.functions.webp import decode_webp, webp_dimensions

from tests.test_webp import _EXPECTED_ALPHA, _PYTHON_WEBP

pytestmark = pytest.mark.skipif(
    not nc.webp_native_available(),
    reason="libwebp unavailable: no independent decoder to verify against")


def _vp8_chunk(webp: bytes) -> bytes:
    off = 12
    while off < len(webp):
        tag = webp[off:off + 4]
        size = struct.unpack("<I", webp[off + 4:off + 8])[0]
        if tag == b"VP8 ":
            return webp[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)
    raise KeyError("no VP8 chunk")


def _content(kind, h, w, seed=0):
    rng = np.random.RandomState(seed)
    if kind == "flat":
        return np.full((h, w, 3), 120, np.uint8)
    if kind == "noise":
        return rng.randint(0, 256, (h, w, 3), np.uint8)
    if kind == "grad":
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([yy * 255 // max(h - 1, 1),
                         xx * 255 // max(w - 1, 1),
                         (yy + xx) * 255 // max(h + w - 2, 1)],
                        2).astype(np.uint8)
    if kind == "blocks":
        px = np.zeros((h, w, 3), np.uint8)
        for i in range(0, h, 8):
            for j in range(0, w, 8):
                px[i:i + 8, j:j + 8] = rng.randint(0, 256, 3)
        return px
    # photo-like: smooth waves + noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([128 + 60 * np.sin(yy / 9.0),
                     128 + 60 * np.cos(xx / 7.0),
                     128 + 50 * np.sin((xx + yy) / 11.0)], 2)
    return np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)


def _assert_exact(data: bytes):
    Yr, Ur, Vr = nc.decode_webp_yuv_native(data)
    Y, U, V = decode_vp8(_vp8_chunk(data))
    assert np.array_equal(Y, Yr), "Y plane mismatch"
    assert np.array_equal(U, Ur), "U plane mismatch"
    assert np.array_equal(V, Vr), "V plane mismatch"


class TestBitExactVsLibwebp:
    @pytest.mark.parametrize("kind", ["flat", "grad", "noise", "blocks"])
    @pytest.mark.parametrize("q", [10, 40, 75, 95])
    def test_single_mb(self, kind, q):
        _assert_exact(nc.encode_webp_native(
            _content(kind, 16, 16, seed=q), quality=float(q)))

    @pytest.mark.parametrize("size", [(32, 48), (48, 33), (17, 23), (64, 64)])
    def test_multi_mb_and_crop(self, size):
        h, w = size
        for q in (25, 80):
            _assert_exact(nc.encode_webp_native(
                _content("grad", h, w, seed=h * w), quality=float(q)))
            _assert_exact(nc.encode_webp_native(
                _content("blocks", h, w, seed=h + w), quality=float(q)))

    @pytest.mark.parametrize("q", [5, 20, 50, 80, 99])
    def test_photo_like_quality_sweep(self, q):
        _assert_exact(nc.encode_webp_native(
            _content("photo", 128, 160, seed=99), quality=float(q)))

    def test_python_webp_genuine_file(self):
        """CPython's python.webp: a stream this engine did not encode."""
        _assert_exact(_PYTHON_WEBP)


class TestDecodeWebpDispatch:
    def test_lossy_rgb_close_to_libwebp(self):
        px = _content("photo", 64, 48, seed=3)
        data = nc.encode_webp_native(px, quality=85.0)
        ours = decode_webp(data)
        theirs = nc.decode_webp_native(data)
        assert ours.shape == theirs.shape == (64, 48, 3)
        # same decoded YUV, different (documented) upsampler/rounding
        diff = ours.astype(float) - theirs.astype(float)
        mse = float((diff ** 2).mean())
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) >= 30.0

    def test_lossy_with_alpha_merges_alph_chunk(self):
        rgba = decode_webp(_PYTHON_WEBP, keep_alpha=True)
        assert rgba.shape == (16, 16, 4)
        assert np.array_equal(rgba[:, :, 3], _EXPECTED_ALPHA)

    def test_dimensions_from_vp8_chunk(self):
        px = _content("grad", 24, 40)
        data = nc.encode_webp_native(px, quality=70.0)
        assert webp_dimensions(data) == (40, 24)

    def test_yuv_to_rgb_known_values(self):
        # BT.601 limited-range spot checks: black/white/grey
        Y = np.array([[16, 235, 126]], np.uint8)
        U = np.array([[128, 128]], np.uint8)
        V = np.array([[128, 128]], np.uint8)
        rgb = yuv420_to_rgb(Y, U, V)
        assert rgb[0, 0].tolist() == [0, 0, 0]
        assert rgb[0, 1].tolist() == [255, 255, 255]
        assert abs(int(rgb[0, 2, 0]) - 128) <= 1
