"""From-scratch ISO BMFF (MP4) box layer: a minimal writer and a
metadata PROBE — the admission-filter shape for video corpora whose
codecs (H.264/H.265/AV1) are out of honest from-scratch decode reach.

A 100-TB video corpus is gated on container metadata long before any
frame is decoded: dimensions, duration, track count, codec fourcc all
live in the `moov` box tree, so the probe is a pure box walk — no
bitstream touched, O(header) bytes read per file (an object store
serves it with one range GET of the moov box; the corpus operator gets
the whole column anyway and stops at `mdat`).

Boxes handled: ftyp (brand), mvhd (timescale→duration, v0+v1),
trak/tkhd (16.16 fixed-point width/height, v0+v1), hdlr (track kind),
stsd (first sample-entry fourcc = codec). Everything else is skipped
by size — the ISO 14496-12 walk degrades gracefully on unknown boxes,
64-bit largesize boxes included.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">I", version << 24) + payload)


def encode_mp4_stub(w: int, h: int, duration_ms: int, codec: str = "avc1",
                    timescale: int = 1000, brand: str = "isom",
                    mdat: bytes = b"") -> bytes:
    """Minimal structurally-valid MP4: ftyp + moov(mvhd + one video
    trak with a codec-tagged sample entry) + mdat. The sample entry
    carries the spec-required visual fields (86 bytes) but no codec
    config — enough for any box-walking prober, honest about carrying
    no decodable bitstream."""
    dur = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", brand.encode() + struct.pack(">I", 0x200)
                + brand.encode() + b"mp41")
    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">iHH8x36s24xI", 0x00010000, 0x0100, 0,
                               _identity_matrix(), 2))
    tkhd = _full(b"tkhd", 0, struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 8 + struct.pack(">hhhH", 0, 0, 0, 0)
                 + _identity_matrix()
                 + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, dur,
                                         0x55C4, 0))
    hdlr = _full(b"hdlr", 0, struct.pack(">I4s12x", 0, b"vide") + b"video\x00")
    entry = (struct.pack(">4s", codec.encode())
             + b"\x00" * 6 + struct.pack(">H", 1)      # reserved + dref idx
             + struct.pack(">HHIII", 0, 0, 0, 0, 0)    # predefs/reserved
             + struct.pack(">HH", w, h)                # visual w/h
             + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
             + b"\x00" * 32                            # compressorname
             + struct.pack(">Hh", 24, -1))             # depth, predefined
    stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                 + struct.pack(">I", 8 + len(entry)) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov + _box(b"mdat", mdat)


def _identity_matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                       0x40000000)


def probe_mp4(data: bytes) -> dict:
    """Box-walk → dict(brand, duration_ms, w, h, codec, n_tracks,
    video_tracks). Raises ValueError when the stream is not ISO BMFF
    (no ftyp/moov)."""
    info = dict(brand=None, duration_ms=None, w=None, h=None, codec=None,
                n_tracks=0, video_tracks=0)
    state = {"timescale": None, "in_video_trak": False,
             "tk": None}  # tk = (w, h) of the current trak

    def walk(pos: int, end: int, depth: int):
        while pos + 8 <= end:
            size, = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    break
                size, = struct.unpack(">Q", data[pos + 8:pos + 16])
                body = pos + 16
            elif size == 0:  # to end of file
                size = end - pos
            stop = min(pos + size, end)
            if size < 8 or stop <= pos:
                break
            if tag == b"ftyp":
                info["brand"] = data[body:body + 4].decode("ascii", "replace")
            elif tag == b"mvhd":
                v = data[body]
                if v == 1:
                    ts, dur = struct.unpack(">IQ", data[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(">II", data[body + 12:body + 20])
                state["timescale"] = ts
                info["duration_ms"] = int(dur * 1000 // ts) if ts else None
            elif tag == b"trak":
                info["n_tracks"] += 1
                state["in_video_trak"] = False
                state["tk"] = None
                walk(body, stop, depth + 1)
                pos = stop
                continue
            elif tag == b"tkhd":
                v = data[body]
                off = stop - body - 8  # w/h are the LAST 8 payload bytes
                wq, hq = struct.unpack(">II", data[body + off:body + off + 8])
                state["tk"] = (wq >> 16, hq >> 16)
            elif tag == b"hdlr":
                if data[body + 8:body + 12] == b"vide":
                    state["in_video_trak"] = True
                    info["video_tracks"] += 1
                    if state["tk"] and info["w"] is None:
                        info["w"], info["h"] = state["tk"]
            elif tag == b"stsd":
                if state["in_video_trak"] and info["codec"] is None:
                    n, = struct.unpack(">I", data[body + 4:body + 8])
                    if n >= 1 and body + 16 <= stop:
                        info["codec"] = data[body + 12:body + 16].decode(
                            "ascii", "replace")
            if tag in _CONTAINERS:
                walk(body, stop, depth + 1)
            pos += size

    walk(0, len(data), 0)
    if info["brand"] is None or state["timescale"] is None:
        raise ValueError("not an ISO BMFF stream (missing ftyp/moov)")
    return info
