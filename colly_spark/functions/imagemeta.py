"""Image metadata (EXIF / XMP / comment) scrubbing — the standard
privacy pass of an image training pipeline (camera EXIF carries GPS
coordinates, serial numbers, timestamps).

Strippers are pure container-level walks — entropy-coded pixel data is
copied verbatim, so decoded pixels are bit-identical before and after
(the invariant the oracled query checks).  Formats:

- JPEG (ITU-T T.81 marker stream): drop APP1..APP15 (EXIF rides APP1,
  Photoshop/XMP APP13/APP1, ICC APP2) and COM; keep APP0 (JFIF) and
  every structural segment.  From SOS on, bytes are copied verbatim.
- PNG (ISO 15948 chunk stream): drop tEXt / zTXt / iTXt / eXIf / tIME
  ancillary chunks; CRCs of kept chunks are untouched.
- WebP (RIFF): drop EXIF / XMP␣ chunks and rewrite the RIFF size.
  (Streams with a VP8X header would also need its metadata flag bits
  cleared; the from-scratch encoders never emit VP8X.)

Injectors exist for tests/golden generation only — the synthetic
corpus is born metadata-free, so tests inject deterministic EXIF-like
payloads first, then prove the scrubber removes exactly them.
"""

from __future__ import annotations

import struct
import zlib

# --- JPEG ------------------------------------------------------------------

_JPEG_STANDALONE = {0x01} | set(range(0xD0, 0xD8))  # TEM, RST0-7


def _is_jpeg_meta(marker: int) -> bool:
    # APP1..APP15 + COM; APP0 (JFIF) is structural and kept
    return 0xE1 <= marker <= 0xEF or marker == 0xFE


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, int, int]:
    """Drop APPn(n≥1)/COM segments. Returns (clean, n_removed,
    bytes_removed). Pixel data (SOS onward) is copied verbatim."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    out = bytearray(data[:2])
    n_removed = bytes_removed = 0
    pos = 2
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9 or marker in _JPEG_STANDALONE:
            out += data[pos:pos + 2]
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker == 0xDA:                 # SOS: entropy data follows
            out += data[pos:]
            return bytes(out), n_removed, bytes_removed
        if _is_jpeg_meta(marker):
            n_removed += 1
            bytes_removed += 2 + length
        else:
            out += data[pos:pos + 2 + length]
        pos += 2 + length
    return bytes(out), n_removed, bytes_removed


def inject_jpeg_metadata(data: bytes, exif: bytes = b"",
                         comment: bytes = b"") -> bytes:
    """Insert an APP1 Exif segment and/or a COM segment right after
    SOI (test scaffolding)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    ins = bytearray()
    if exif:
        body = b"Exif\x00\x00" + exif
        ins += b"\xFF\xE1" + struct.pack(">H", len(body) + 2) + body
    if comment:
        ins += b"\xFF\xFE" + struct.pack(">H", len(comment) + 2) + comment
    return data[:2] + bytes(ins) + data[2:]


# --- PNG -------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_META_CHUNKS = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}


def strip_png_metadata(data: bytes) -> tuple[bytes, int, int]:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = bytearray(data[:8])
    n_removed = bytes_removed = 0
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunk = data[pos:pos + 12 + ln]
        if tag in _PNG_META_CHUNKS:
            n_removed += 1
            bytes_removed += len(chunk)
        else:
            out += chunk
        pos += 12 + ln
    return bytes(out), n_removed, bytes_removed


def inject_png_metadata(data: bytes, keyword: bytes = b"Comment",
                        text: bytes = b"") -> bytes:
    """Insert a tEXt chunk right after IHDR (test scaffolding)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    (ihdr_len,) = struct.unpack(">I", data[8:12])
    cut = 8 + 12 + ihdr_len
    body = keyword + b"\x00" + text
    crc = zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF
    chunk = struct.pack(">I", len(body)) + b"tEXt" + body + struct.pack(">I", crc)
    return data[:cut] + chunk + data[cut:]


# --- WebP (RIFF) -----------------------------------------------------------

_WEBP_META_CHUNKS = {b"EXIF", b"XMP "}


def strip_webp_metadata(data: bytes) -> tuple[bytes, int, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    kept = bytearray()
    n_removed = bytes_removed = 0
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        step = 8 + ln + (ln & 1)
        chunk = data[pos:pos + step]
        if tag in _WEBP_META_CHUNKS:
            n_removed += 1
            bytes_removed += len(chunk)
        else:
            kept += chunk
        pos += step
    out = b"RIFF" + struct.pack("<I", 4 + len(kept)) + b"WEBP" + bytes(kept)
    return out, n_removed, bytes_removed


def inject_webp_metadata(data: bytes, exif: bytes = b"") -> bytes:
    """Append an EXIF chunk (test scaffolding; no VP8X header, which
    the from-scratch encoders never emit and the scrubber's own walk
    does not require)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    chunk = b"EXIF" + struct.pack("<I", len(exif)) + exif
    if len(exif) & 1:
        chunk += b"\x00"
    payload = data[12:] + chunk
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


# --- dispatch ---------------------------------------------------------------

_STRIPPERS = {"jpeg": strip_jpeg_metadata, "png": strip_png_metadata,
              "webp": strip_webp_metadata}
_INJECTORS = {"jpeg": lambda d, p: inject_jpeg_metadata(d, exif=p, comment=p),
              "png": lambda d, p: inject_png_metadata(d, text=p),
              "webp": lambda d, p: inject_webp_metadata(d, exif=p)}


def strip_metadata(data: bytes, fmt: str) -> tuple[bytes, int, int]:
    """Dispatch by fmt; unknown containers pass through untouched
    (poison-row tolerance: scrubbing must never drop an image)."""
    fn = _STRIPPERS.get(fmt)
    if fn is None:
        return data, 0, 0
    return fn(data)


def inject_metadata(data: bytes, fmt: str, payload: bytes) -> bytes:
    fn = _INJECTORS.get(fmt)
    if fn is None:
        return data
    return fn(data, payload)
