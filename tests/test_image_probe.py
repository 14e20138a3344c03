"""KATs for the unified decode-free image header probe
(functions/imageprobe.py): every container family's writer↔prober
round-trip, hand-assembled spec fixtures that pin the byte layouts
independently of the writers, magic-byte sniffing (a fmt column is
never consulted), and poison tolerance."""

import struct

import numpy as np
import pytest

from colly_spark.functions.imageprobe import probe_image


def _px(i=3, size=16):
    from colly_spark.functions.images import synth_pixels

    return synth_pixels(i, 42, size)


def test_png_roundtrip():
    from colly_spark.functions.images import encode_png

    info = probe_image(encode_png(_px(size=24)))
    assert info == dict(fmt="png", w=24, h=24, depth=8, alpha=False,
                        animated=False)


def test_jpeg_roundtrip_baseline_and_progressive():
    from colly_spark.functions.images import encode_lossy
    from colly_spark.functions.jpeg import encode_jpeg

    for data in (encode_lossy(_px(size=24)),
                 encode_jpeg(_px(size=24), quality=80)):
        info = probe_image(data)
        assert (info["fmt"], info["w"], info["h"], info["depth"]) == \
            ("jpeg", 24, 24, 8)


def test_webp_lossless_roundtrip():
    from colly_spark.functions.webp import encode_webp

    info = probe_image(encode_webp(_px()))
    assert info == dict(fmt="webp", w=16, h=16, depth=8, alpha=False,
                        animated=False)


def test_webp_lossy_native_roundtrip():
    from colly_spark.functions.native_codecs import webp_native_available

    if not webp_native_available():
        pytest.skip("libwebp absent")
    from colly_spark.functions.native_codecs import encode_webp_native

    info = probe_image(encode_webp_native(_px(size=32), quality=90.0))
    assert (info["fmt"], info["w"], info["h"]) == ("webp", 32, 32)


def test_gif_static_and_animated():
    from colly_spark.functions.gif import encode_gif, encode_gif_animated

    st = probe_image(encode_gif(_px()))
    assert st == dict(fmt="gif", w=16, h=16, depth=8, alpha=False,
                      animated=False)
    frames = [_px(i) for i in range(3)]
    an = probe_image(encode_gif_animated(frames, [10, 10, 10]))
    assert an["animated"] and an["fmt"] == "gif"


def test_gif_transparency_flag_sets_alpha():
    from colly_spark.functions.gif import encode_gif

    data = bytearray(encode_gif(_px()))
    # splice a GCE with the transparency flag set right after the
    # global color table (0x21 0xF9 4-byte block, flag bit0)
    pos = 13 + 3 * (2 << (data[10] & 7))
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(data[:pos]) + gce + bytes(data[pos:])
    assert probe_image(spliced)["alpha"]


def test_avif_delegation():
    from colly_spark.functions.avif import encode_avif_stub

    info = probe_image(encode_avif_stub(640, 360, depth=12, alpha=True,
                                        brand="avis"))
    assert info == dict(fmt="avif", w=640, h=360, depth=12, alpha=True,
                        animated=True)


def test_hand_assembled_vp8x_fixture():
    """VP8X extended header per the public WebP container spec —
    independent of any writer in this repo (none emits VP8X)."""
    flags = 0x10 | 0x02  # alpha + animation
    body = (b"VP8X" + struct.pack("<I", 10)
            + bytes([flags, 0, 0, 0])
            + (799).to_bytes(3, "little") + (599).to_bytes(3, "little"))
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    info = probe_image(data)
    assert info == dict(fmt="webp", w=800, h=600, depth=8, alpha=True,
                        animated=True)


def test_hand_assembled_vp8_lossy_fixture():
    """RFC 6386 §9.1 keyframe header, hand-packed."""
    body = (b"VP8 " + struct.pack("<I", 10)
            + b"\x00\x00\x00"            # frame tag (keyframe)
            + b"\x9d\x01\x2a"            # start code
            + struct.pack("<HH", 1280, 720))
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    info = probe_image(data)
    assert (info["w"], info["h"]) == (1280, 720)


def test_sniffs_magic_not_labels():
    """The probe consumes ONLY bytes — png bytes report png no matter
    what any metadata claims, and a label cannot rescue wrong bytes."""
    from colly_spark.functions.images import encode_png

    assert probe_image(encode_png(_px()))["fmt"] == "png"


@pytest.mark.parametrize("bad", [
    b"", b"\x00" * 64,
    b"RIFF\x00\x00\x00\x00WAVEdata",        # RIFF but not WEBP
    b"\xff\xd8\xff\xd9",                     # JPEG with no SOF
    b"GIF89a\x10\x00\x10\x00\x00\x00\x00",   # GIF with no descriptor
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,      # PNG without IHDR
    b"RIFF\x08\x00\x00\x00WEBPVP8L\x01\x00\x00\x00\x00",  # bad VP8L sig
])
def test_poison_raises(bad):
    with pytest.raises(ValueError):
        probe_image(bad)


def test_depth_follows_png_bitdepth():
    """16-bit PNG IHDR reports depth 16 (hand-tweaked header + crc
    irrelevant to the probe)."""
    from colly_spark.functions.images import encode_png

    data = bytearray(encode_png(_px()))
    data[24] = 16
    assert probe_image(bytes(data))["depth"] == 16
