"""Image metadata scrubbing KATs (functions/imagemeta.py) — container
walks only; the oracle gate (image_metadata_scrub golden) proves the
distributed pipeline, these pin the per-format byte-level semantics."""

import struct

import numpy as np
import pytest

from colly_spark.functions import imagemeta as im
from colly_spark.functions.images import decode_image, encode_png, synth_encode
from colly_spark.functions.jpeg import encode_jpeg


def _px(seed=7, size=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


class TestJpeg:
    def test_inject_strip_restores_original(self):
        data = encode_jpeg(_px())
        dirty = im.inject_jpeg_metadata(data, exif=b"GPS 51.5 -0.1",
                                        comment=b"cam X100")
        assert dirty != data and len(dirty) > len(data)
        clean, n, b = im.strip_jpeg_metadata(dirty)
        assert clean == data
        assert n == 2 and b == len(dirty) - len(data)

    def test_pixels_bit_identical_across_scrub(self):
        data = encode_jpeg(_px(11))
        dirty = im.inject_jpeg_metadata(data, exif=b"x" * 100, comment=b"y")
        clean, _, _ = im.strip_jpeg_metadata(dirty)
        assert np.array_equal(decode_image(dirty, "jpeg"),
                              decode_image(clean, "jpeg"))

    def test_strip_is_idempotent_and_keeps_app0(self):
        # JFIF APP0 (structural) must survive; second strip is a no-op
        data = encode_jpeg(_px(3))
        clean, n, b = im.strip_jpeg_metadata(data)
        assert (n, b) == (0, 0)
        if b"\xFF\xE0" in data:
            assert b"\xFF\xE0" in clean

    def test_metadata_after_sos_untouched(self):
        # bytes from SOS onward are copied verbatim even if they
        # contain 0xFFFE-looking sequences inside entropy data
        data = encode_jpeg(_px(5))
        clean, _, _ = im.strip_jpeg_metadata(data)
        sos = data.find(b"\xFF\xDA")
        assert clean[clean.find(b"\xFF\xDA"):] == data[sos:]


class TestPng:
    def test_inject_strip_restores_original(self):
        data = encode_png(_px())
        dirty = im.inject_png_metadata(data, text=b"GPS here")
        clean, n, b = im.strip_png_metadata(dirty)
        assert clean == data and n == 1
        assert b == len(dirty) - len(data) == 20 + len(b"GPS here")

    def test_injected_chunk_has_valid_crc_and_decodes(self):
        data = encode_png(_px(9))
        dirty = im.inject_png_metadata(data, text=b"secret")
        assert np.array_equal(decode_image(dirty, "png"),
                              decode_image(data, "png"))


class TestWebp:
    def test_inject_strip_restores_original(self):
        fmt, data, _ = synth_encode(_px(13), "webp")
        assert fmt == "webp"
        dirty = im.inject_webp_metadata(data, exif=b"GPS 1.23")
        # RIFF size header must stay consistent
        (sz,) = struct.unpack("<I", dirty[4:8])
        assert sz == len(dirty) - 8
        clean, n, b = im.strip_webp_metadata(dirty)
        assert clean == data and n == 1
        assert np.array_equal(decode_image(dirty, "webp"),
                              decode_image(clean, "webp"))

    def test_odd_payload_padding(self):
        fmt, data, _ = synth_encode(_px(17), "webp")
        dirty = im.inject_webp_metadata(data, exif=b"odd")  # 3 bytes
        clean, n, b = im.strip_webp_metadata(dirty)
        assert clean == data and b == 8 + 3 + 1


class TestDispatch:
    def test_unknown_fmt_passes_through(self):
        blob = b"\x00\x01\x02not-an-image"
        assert im.strip_metadata(blob, "avif") == (blob, 0, 0)
        assert im.inject_metadata(blob, "avif", b"x") == blob

    def test_dispatch_matches_direct(self):
        data = encode_jpeg(_px(2))
        dirty = im.inject_metadata(data, "jpeg", b"payload")
        clean, n, b = im.strip_metadata(dirty, "jpeg")
        assert clean == data and n == 2
