"""Native codec bindings (functions/native_codecs.py) + cross-engine
verification of the from-scratch codecs against the container's REAL
libwebp/libavif.

The highest-value tests here are adversarial cross-checks that no
committed fixture can provide:

- every stream our from-scratch VP8L ENCODER emits must decode to the
  exact pixels under the independent industry decoder (libwebp), across
  the full encoder option grid — palette tiers, predictor modes, color
  transform, LZ77/cache toggles;
- the genuine libwebp-produced lossy file (CPython's python.webp) must
  decode through the engine's ``decode_image`` dispatch (native VP8
  path) with the alpha plane matching the PNG-derived expectation
  bit-exactly.

All tests skip when the native libraries are absent (portable
environments); in the deployment container they always run.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from colly_spark.functions import native_codecs as nc
from colly_spark.functions.images import (decode_image, decodable_web_fmts,
                                          psnr, synth_encode, validate_batch)
from colly_spark.functions.webp import encode_vp8l, encode_webp

from tests.test_webp import _EXPECTED_ALPHA, _PYTHON_WEBP

webp_required = pytest.mark.skipif(not nc.webp_native_available(),
                                   reason="libwebp not loadable")
avif_required = pytest.mark.skipif(not nc.avif_native_available(),
                                   reason="libavif not loadable")


def _pixels(h, w, seed=0, smooth=False, alpha=False):
    rng = np.random.RandomState(seed)
    c = 4 if alpha else 3
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([
            (yy * 255 // max(h - 1, 1)),
            (xx * 255 // max(w - 1, 1)),
            ((yy + xx) * 255 // max(h + w - 2, 1)),
        ], axis=2).astype(np.uint8)
        if alpha:
            base = np.concatenate(
                [base, np.full((h, w, 1), 200, np.uint8)], axis=2)
        return base
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@webp_required
class TestWebpNative:
    def test_lossless_round_trip_exact(self):
        px = _pixels(23, 31, seed=1)
        assert np.array_equal(
            nc.decode_webp_native(nc.encode_webp_native(px, lossless=True)), px)

    def test_lossy_smooth_image_psnr(self):
        px = _pixels(64, 64, seed=2, smooth=True)
        back = nc.decode_webp_native(nc.encode_webp_native(px, quality=95.0))
        assert back.shape == px.shape
        assert psnr(px, back) >= 38.0

    def test_alpha_round_trip(self):
        px = _pixels(17, 19, seed=3, alpha=True)
        back = nc.decode_webp_native(
            nc.encode_webp_native(px, lossless=True), keep_alpha=True)
        assert np.array_equal(back, px)

    def test_yuv_plane_shapes(self):
        px = _pixels(33, 47, seed=4, smooth=True)
        Y, U, V = nc.decode_webp_yuv_native(nc.encode_webp_native(px))
        assert Y.shape == (33, 47) and U.shape == (17, 24) == V.shape


@webp_required
class TestFromScratchVsLibwebp:
    """Our VP8L encoder's streams decoded by the REAL libwebp."""

    GRID = [
        dict(),
        dict(use_subtract_green=False),
        dict(use_lz77=False),
        dict(cache_bits=0),
        dict(cache_bits=8),
        dict(use_palette=False),
        dict(use_palette=False, predictor_mode=2),
        dict(use_palette=False, predictor_mode=11),
        dict(use_palette=False, predictor_mode=13),
        dict(use_palette=False, color_element=0x1B,
             use_subtract_green=False),
    ]

    @pytest.mark.parametrize("kwargs", GRID,
                             ids=[str(sorted(g)) for g in GRID])
    def test_option_grid_decodes_exact(self, kwargs):
        px = _pixels(21, 26, seed=7, smooth=True)  # smooth: palette-able
        data = encode_webp(px, **kwargs)
        assert np.array_equal(nc.decode_webp_native(data), px)

    def test_noise_rgba_exact(self):
        px = _pixels(13, 12, seed=8, alpha=True)
        data = encode_webp(px)
        assert np.array_equal(nc.decode_webp_native(data, keep_alpha=True), px)

    def test_tiny_palette_tiers(self):
        # 2 / 4 / 16 / 256 distinct colors exercise xbits 3/2/1/0
        for n_colors, seed in ((2, 10), (4, 11), (16, 12), (200, 13)):
            rng = np.random.RandomState(seed)
            palette = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
            idx = rng.randint(0, n_colors, size=(19, 23))
            px = palette[idx]
            data = encode_webp(px)
            assert np.array_equal(nc.decode_webp_native(data), px), n_colors


@webp_required
class TestPythonWebpLossy:
    def test_decode_image_dispatch(self):
        """The genuine lossy python.webp now decodes through the
        engine's decode_image (VP8 via the native path)."""
        px = decode_image(_PYTHON_WEBP, "webp")
        assert px.shape == (16, 16, 3)

    def test_alpha_matches_png_derivation(self):
        rgba = nc.decode_webp_native(_PYTHON_WEBP, keep_alpha=True)
        assert np.array_equal(rgba[:, :, 3], _EXPECTED_ALPHA)


@avif_required
class TestAvifNative:
    def test_round_trip_psnr(self):
        px = _pixels(48, 40, seed=20, smooth=True)
        back = nc.decode_avif_native(nc.encode_avif_native(px, max_quantizer=4))
        assert back.shape == px.shape
        assert psnr(px, back) >= 40.0

    def test_noise_high_quality(self):
        px = _pixels(24, 24, seed=21)
        back = nc.decode_avif_native(nc.encode_avif_native(px, max_quantizer=2))
        assert psnr(px, back) >= 40.0

    def test_decode_image_dispatch_and_fmt_set(self):
        assert "avif" in decodable_web_fmts()
        px = _pixels(16, 16, seed=22)
        data = nc.encode_avif_native(px, max_quantizer=4)
        assert data[4:12] == b"ftypavif"
        got = decode_image(data, "avif")
        assert psnr(px, got) >= 40.0

    def test_alpha_channel(self):
        px = _pixels(20, 18, seed=23, alpha=True)
        back = nc.decode_avif_native(
            nc.encode_avif_native(px, max_quantizer=2), keep_alpha=True)
        assert back.shape == (20, 18, 4)
        # alpha is coded near-losslessly at maxQ=2
        assert np.abs(back[:, :, 3].astype(int) - px[:, :, 3].astype(int)).max() <= 4


@avif_required
class TestPipelineIntegration:
    def test_synth_encode_all_codecs(self):
        px = _pixels(16, 16, seed=30)
        fmts = set()
        for enc in ("png", "jpeg", "webp", "webp_lossy", "avif"):
            fmt, data, ph = synth_encode(px, enc)
            fmts.add((enc, fmt))
            # every synthesized payload decodes through the dispatch
            decoded = decode_image(data, fmt)
            assert decoded.shape == px.shape
            assert isinstance(ph, int)
        assert ("webp_lossy", "webp") in fmts and ("avif", "avif") in fmts

    def test_validate_batch_lossy_webp_and_avif(self):
        px = _pixels(32, 32, seed=31, smooth=True)
        ref = synth_encode(px, "png")[1]
        lossy_webp = synth_encode(px, "webp_lossy")[1]
        avif = synth_encode(px, "avif")[1]
        vp8l = synth_encode(px, "webp")[1]
        oks, psnrs = validate_batch(
            [lossy_webp, avif, vp8l], ["webp", "avif", "webp"],
            [ref, ref, ref], ["png", "png", "png"])
        # VP8L vs PNG are both lossless → exact equality required & true
        assert oks == [True, True, True], psnrs
        # lossy rows took the PSNR path (finite, above the gate)
        assert psnrs[0] >= 38.0 and psnrs[1] >= 40.0

    def test_validate_batch_rejects_corrupt(self):
        px = _pixels(16, 16, seed=32)
        data = synth_encode(px, "avif")[1]
        ref = synth_encode(px, "png")[1]
        oks, _ = validate_batch([data[:40]], ["avif"], [ref], ["png"])
        assert oks == [False]
