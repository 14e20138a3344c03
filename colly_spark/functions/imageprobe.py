"""Unified decode-free image header probe: (fmt, w, h, depth, alpha,
animated) from the first O(100) bytes of a binary image column, for
EVERY corpus format — png, jpeg, gif, webp (lossy VP8, lossless VP8L,
extended VP8X), and avif/heif (delegated to functions/avif.py's meta
box walk).

This is the admission tier BELOW decode: a 100-TB image lake filters
on dimensions/aspect/format before any pixel is touched
(operators/multimodal.image_corpus_filter documents the decode-path
twin), and the probe needs only a ranged header read per object —
including for formats whose full decode is gated on native libs
(avif). Format is SNIFFED from magic bytes, never trusted from the
`fmt` column — a mislabeled row probes as what it actually is, which
is exactly what an admission gate wants to know.

All layouts are public specs: PNG (RFC 2083 / ISO 15948), JPEG
(ITU-T T.81 §B), GIF87a/89a (the 1990 spec), WebP container + VP8
(RFC 6386 §9.1) + VP8L (the public lossless bitstream spec), HEIF
(ISO 23008-12). Reference seam: colly stores response bodies opaquely
(OnResponse, colly.go); format-aware admission is this repo's
LLM-pipeline extension, same tier as functions/mp4.py.
"""

from __future__ import annotations

import struct

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def probe_image(data: bytes) -> dict:
    """Sniff the container from magic bytes and return dict(fmt, w, h,
    depth, alpha, animated). Raises ValueError on anything that is not
    a recognizable image header (the caller counts these —
    operators/multimodal.undecodable_fmt_report discipline)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _probe_png(data)
    if data[:2] == b"\xff\xd8":
        return _probe_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _probe_gif(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _probe_webp(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from colly_spark.functions.avif import probe_avif

        info = probe_avif(data)
        return dict(fmt="avif", w=info["w"], h=info["h"],
                    depth=info["depth"], alpha=info["alpha"],
                    animated=info["animated"])
    raise ValueError("unrecognized image container")


def _probe_png(data: bytes) -> dict:
    if len(data) < 33 or data[12:16] != b"IHDR":
        raise ValueError("png: no IHDR")
    w, h = struct.unpack(">II", data[16:24])
    depth, colortype = data[24], data[25]
    # APNG: an acTL chunk before IDAT marks animation
    animated = b"acTL" in data[: data.find(b"IDAT") if b"IDAT" in data
                               else len(data)]
    return dict(fmt="png", w=w, h=h, depth=depth,
                alpha=bool(colortype & 4), animated=animated)


def _probe_jpeg(data: bytes) -> dict:
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len, = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker in _SOF_MARKERS:
            if pos + 9 > n:
                break
            precision = data[pos + 4]
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return dict(fmt="jpeg", w=w, h=h, depth=precision,
                        alpha=False, animated=False)
        if marker == 0xDA:  # SOS before any SOF: broken
            break
        pos += 2 + seg_len
    raise ValueError("jpeg: no SOF before SOS/EOF")


def _probe_gif(data: bytes) -> dict:
    if len(data) < 13:
        raise ValueError("gif: truncated screen descriptor")
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 7))
    frames, alpha = 0, False
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(data):
                break
            if data[pos + 1] == 0xF9 and pos + 4 <= len(data):
                alpha = alpha or bool(data[pos + 3] & 1)
            pos += 2
            pos = _skip_subblocks(data, pos)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(data):
                break
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 7))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(data, pos)
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    if frames == 0:
        raise ValueError("gif: no image descriptor")
    return dict(fmt="gif", w=w, h=h, depth=8, alpha=alpha,
                animated=frames > 1)


def _skip_subblocks(data: bytes, pos: int) -> int:
    while pos < len(data):
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size
    return pos


def _probe_webp(data: bytes) -> dict:
    tag = data[12:16]
    if tag == b"VP8X":
        flags = data[20]
        w = 1 + int.from_bytes(data[24:27], "little")
        h = 1 + int.from_bytes(data[27:30], "little")
        return dict(fmt="webp", w=w, h=h, depth=8,
                    alpha=bool(flags & 0x10),
                    animated=bool(flags & 0x02))
    if tag == b"VP8L":
        if data[20] != 0x2F:
            raise ValueError("webp: bad VP8L signature")
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return dict(fmt="webp", w=w, h=h, depth=8,
                    alpha=bool((bits >> 28) & 1), animated=False)
    if tag == b"VP8 ":
        # lossy keyframe: 3-byte frame tag, 3-byte start code, then
        # 14-bit w/h (RFC 6386 §9.1)
        if data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("webp: bad VP8 start code")
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        return dict(fmt="webp", w=w, h=h, depth=8, alpha=False,
                    animated=False)
    raise ValueError(f"webp: unknown chunk {tag!r}")
