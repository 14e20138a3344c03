"""From-scratch MJPEG-in-AVI (RIFF) container: writer, parser, and
frame sampling.

Video rides the corpus as an opaque binary column; the curation
operator the 100-TB pipeline needs is FRAME SAMPLING — pull every Nth
frame out of the container and hand its pixels to the image stack
(decode → phash → near-dup / quality gates), without ever
materializing the full frame set. MJPEG-AVI is the one video format
that is honestly implementable from scratch here: the container is
plain RIFF chunk-walking and every frame is a standalone baseline
JPEG, which functions/jpeg.py (the from-scratch T.81 codec, KAT'd
bit-exact against libjpeg) already decodes.

Layout written (and the subset the parser needs): RIFF 'AVI ' →
LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER)) → LIST movi ('00dc' chunks, word-aligned) → idx1.
The parser walks chunks and never trusts avih's frame count — frames
are whatever '00dc' chunks exist (truncated files yield the prefix).
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg_avi(frames: list, w: int, h: int, fps: int = 10) -> bytes:
    """Pack pre-encoded baseline-JPEG frames into an AVI."""
    usec = 1_000_000 // max(1, fps)
    maxb = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", usec, maxb * fps, 0, 0x10, len(frames), 0,
                       1, maxb, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), maxb, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: offsets relative to the start of the movi LIST payload
    idx, off = [], 4
    for f in frames:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """→ dict(w, h, fps, frames=[jpeg bytes, ...]). Raises ValueError
    on a non-AVI stream; tolerates a truncated movi list (prefix
    frames returned)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    fps = 0
    frames: list = []

    def walk(buf: bytes, pos: int, end: int):
        nonlocal w, h, fps
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            stop = min(pos + 8 + size, end)
            if tag == b"LIST":
                walk(buf, pos + 12, stop)
            elif tag == b"avih" and size >= 40:
                usec, = struct.unpack("<I", buf[pos + 8:pos + 12])
                fps = 1_000_000 // usec if usec else 0
                w, h = struct.unpack("<II", buf[pos + 40:pos + 48])
            elif tag == b"00dc":
                frames.append(bytes(buf[pos + 8:stop]))
            pos += 8 + size + (size & 1)

    walk(data, 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]))
    if w is None:
        raise ValueError("missing avih header")
    return dict(w=int(w), h=int(h), fps=int(fps), frames=frames)


def sample_frames(data: bytes, every: int = 2) -> list:
    """[(frame_idx, jpeg_bytes)] for frames 0, every, 2·every, … —
    the container walk skips unsampled frames' bytes entirely."""
    meta = parse_avi(data)
    return [(i, f) for i, f in enumerate(meta["frames"])
            if i % max(1, every) == 0]
