"""Pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec.

Round 1 shipped a clearly-marked stand-in lossy codec ("QNT1") because
the container has no libjpeg/PIL.  This module removes that stub: it is
a real, from-scratch implementation of baseline sequential JPEG built
only from the public spec (ITU-T T.81, Annex F/K; JFIF 1.02):

- ``encode_jpeg``: 8-bit RGB (or grayscale) → interchange-format JFIF
  bytes.  4:4:4 (no chroma subsampling), one quality-scaled Annex K
  luminance quantization table shared by all components (an encoder
  choice the format allows, keeps PSNR high on noisy fixture images),
  the standard Annex K Huffman tables.  Output is decodable by any
  standard JPEG decoder.
- ``decode_jpeg``: baseline/extended-sequential AND progressive (SOF2)
  Huffman JPEG → uint8 pixels.  Generic Hi×Vi sampling (4:4:4, 4:2:0,
  4:2:2, grayscale), multiple DQT/DHT segments, 16-bit quant tables,
  restart markers (DRI/RSTn), APPn/COM skipping.  The progressive path
  implements all four T.81 Annex G scan kinds — DC first (point
  transform), DC successive-approximation refinement, AC first with
  EOB-run coding, and AC refinement with correction bits — over a
  persistent per-component coefficient store, so any spectral-selection
  / successive-approximation scan script decodes (including libjpeg's
  ``jpeg_simple_progression`` 10-scan script).  Verified against real
  libjpeg-produced files in tests: 4:2:0 16×16 baseline KAT, plus
  baseline-vs-progressive bit-identical pixel equality on libjpeg
  encodes of the same image (tests/test_jpeg_progressive.py).

Scale notes: the DCT/IDCT and dequantization are vectorized over all
blocks of an image (one einsum), and callers batch at the Arrow level
(one Python call per record batch, mapInPandas) — images stay opaque
``binary`` columns in every shuffle; pixels exist only map-side inside
the decode stage.  The Huffman bit loop is per-symbol Python, which is
the honest cost of a from-scratch entropy coder; at 100 TB this stage
is embarrassingly parallel (per-image) and would swap to turbojpeg via
the same ``decode_image`` seam.

Reference parity: the reference treats image bytes as opaque payloads
(response.go:189-194 noTextualData); the decoded-pixel PSNR≥40dB +
caption-equality invariant comes from BASELINE.json input_hint.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants from ITU-T T.81 Annex K ------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance quantization table (natural row order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# Annex K Huffman table specifications: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: forward F = T B Tᵀ, inverse B = Tᵀ F T
_k = np.arange(8)
_T = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_T[0, :] = 0.5 / np.sqrt(2.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C: symbol → (code, length) for a BITS/HUFFVAL spec."""
    out, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


_ENC_DC_LUMA = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
_ENC_AC_LUMA = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)


class _BitWriter:
    """Entropy-coded-segment writer with T.81 F.1.2.3 byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)
        return bytes(self.buf)


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (by, bx, 8, 8) with edge-replicate padding to ×8."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 → baseline JFIF.

    4:4:4, one quality-scaled Annex-K luminance quant table for all
    components, standard Huffman tables (luma tables reused for chroma
    — fewer DHT segments, same bitstream validity)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qt = _quality_table(QT_LUMA, quality)
    qt_z = qt[ZIGZAG]

    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[..., c] for c in range(3)]

    # forward DCT + quantize, vectorized over all blocks per component
    comp_coef = []
    for plane in planes:
        blocks = _to_blocks(plane) - 128.0          # (by,bx,8,8)
        f = np.einsum("ij,byjk,lk->byil", _T, blocks, _T)
        q = np.round(f / qt.reshape(8, 8)).astype(np.int64)
        comp_coef.append(q.reshape(q.shape[0], q.shape[1], 64)[..., ZIGZAG])

    wr = _BitWriter()
    dc_tab, ac_tab = _ENC_DC_LUMA, _ENC_AC_LUMA
    by, bx = comp_coef[0].shape[:2]
    prev_dc = [0] * len(comp_coef)
    for y in range(by):
        for x in range(bx):
            for ci, coef in enumerate(comp_coef):
                z = coef[y, x]
                # DC
                diff = int(z[0]) - prev_dc[ci]
                prev_dc[ci] = int(z[0])
                mag = abs(diff)
                s = mag.bit_length()
                code, ln = dc_tab[s]
                wr.put(code, ln)
                if s:
                    wr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
                # AC
                run = 0
                nz = np.nonzero(z[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(z[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tab[0xF0]     # ZRL
                        wr.put(code, ln)
                        run -= 16
                    s = abs(v).bit_length()
                    code, ln = ac_tab[run << 4 | s]
                    wr.put(code, ln)
                    wr.put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = ac_tab[0x00]         # EOB
                    wr.put(code, ln)

    ncomp = 1 if gray else 3
    sof_comps = b"".join(bytes([cid + 1, 0x11, 0]) for cid in range(ncomp))
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    out = bytearray()
    out += b"\xFF\xD8"                               # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qt_z))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += _seg(0xC4, _dht_body(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_body(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    out += _seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3F\x00")
    out += wr.flush()
    out += b"\xFF\xD9"                               # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


class _HuffDecoder:
    """T.81 F.2.2.3 DECODE procedure tables (MINCODE/MAXCODE/VALPTR)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, idx = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = idx
                self.mincode[length] = code
                code += n
                idx += n
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, bits: np.ndarray):
        self.bits = bits
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated entropy segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated entropy segment")
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode_symbol(self, tab: _HuffDecoder) -> int:
        code = self.read_bit()
        length = 1
        while code > tab.maxcode[length]:
            code = (code << 1) | self.read_bit()
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code")
        return tab.vals[tab.valptr[length] + code - tab.mincode[length]]


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: s-bit magnitude → signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline/extended-sequential or progressive Huffman JPEG
    → (h, w, 3) uint8 RGB (grayscale replicated to 3 channels).
    Generic Hi×Vi chroma sampling with box upsampling; restart markers
    honored.  Progressive (SOF2) streams accumulate coefficients across
    scans (T.81 Annex G) and reconstruct at EOI."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    stores = None                                      # progressive coefficient state
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream")
        marker = data[pos + 1]
        if marker == 0xD9:                            # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no body
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG stream")
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:                            # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    qtables[tq] = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    qtables[tq] = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
        elif marker == 0xC4:                          # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):            # SOF0/1/2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 15, tq=tq, idx=c))
            frame = dict(h=h, w=w, comps=comps, progressive=marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF, 0xCC):
            raise ValueError(f"unsupported SOF/coding marker 0x{marker:02X} "
                             "(lossless/arithmetic/hierarchical JPEG)")
        elif marker == 0xDD:                          # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                          # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            if not frame["progressive"]:
                return _decode_scan(data, pos, frame, scan, qtables, htables,
                                    restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if (ss == 0) != (se == 0):
                raise ValueError("invalid progressive scan header "
                                 "(DC scans need Ss=Se=0)")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scans must be "
                                 "non-interleaved (Ns=1)")
            if stores is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                stores = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                   dtype=np.int64) for c in frame["comps"]]
            pos = _progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                                    stores, htables, restart_interval)
    if frame is not None and frame.get("progressive") and stores is not None:
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        return _reconstruct(frame, frame["comps"], stores, qtables, hmax, vmax)
    raise ValueError("no scan data found")


def _entropy_chunks(data, pos):
    """Split the entropy-coded segment at ``pos`` into destuffed chunks
    separated by RSTn markers.  Returns (chunks, next_pos) where
    next_pos is the offset of the terminating marker's 0xFF."""
    chunks, cur = [], bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:                   # RSTn
                chunks.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                                      # EOI or next marker
        cur.append(b)
        i += 1
    chunks.append(bytes(cur))
    return chunks, i


def _make_readers(chunks):
    return [_BitReader(np.unpackbits(np.frombuffer(c, dtype=np.uint8)))
            for c in chunks]


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    chunks, _ = _entropy_chunks(data, pos)
    readers = _make_readers(chunks)

    # per-component zigzag coefficient stores (block grid sized by MCU)
    stores = []
    for comp, _, _ in scan:
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        stores.append(np.zeros((bh, bw, 64), dtype=np.int64))

    chunk_idx = 0
    rd = readers[0]
    pred = [0] * len(scan)
    mcu_in_chunk = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_chunk == restart_interval:
                chunk_idx += 1
                if chunk_idx >= len(readers):
                    raise ValueError("missing restart segment")
                rd = readers[chunk_idx]
                pred = [0] * len(scan)
                mcu_in_chunk = 0
            for ci, (comp, td, ta) in enumerate(scan):
                dct = htables[(0, td)]
                act = htables[(1, ta)]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        z = stores[ci][my * comp["v"] + v, mx * comp["h"] + hh]
                        s = rd.decode_symbol(dct)
                        diff = _extend(rd.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        z[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = rd.decode_symbol(act)
                            r, ssss = rs >> 4, rs & 15
                            if ssss == 0:
                                if r == 15:
                                    k += 16          # ZRL
                                    continue
                                break                 # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            z[k] = _extend(rd.read_bits(ssss), ssss)
                            k += 1
            mcu_in_chunk += 1

    return _reconstruct(frame, [c for c, _, _ in scan], stores, qtables,
                        hmax, vmax)


def _reconstruct(frame, comps, stores, qtables, hmax, vmax):
    """Dequantize + IDCT (vectorized per component), box-upsample to
    full resolution, convert to RGB."""
    h, w = frame["h"], frame["w"]
    planes = []
    for comp, zz in zip(comps, stores):
        qt = qtables[comp["tq"]][UNZIGZAG].reshape(8, 8)
        f = zz[..., UNZIGZAG].reshape(zz.shape[0], zz.shape[1], 8, 8) * qt
        px = np.einsum("ji,byjk,kl->byil", _T, f, _T) + 128.0
        bh, bw = px.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes, axis=-1)
    return np.clip(np.round(ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)


# --- progressive (SOF2) scan decoding: T.81 Annex G -------------------------


def _scan_blocks(frame, scan, hmax, vmax):
    """Yield one list of (scan_comp_index, by, bx) per restart unit.

    Interleaved scans (Ns>1) iterate MCUs with each component's full
    Hi×Vi block group per MCU; non-interleaved scans (Ns=1) iterate the
    component's own ceil-by-8 block grid one block at a time
    (T.81 A.2.2/A.2.3)."""
    h, w = frame["h"], frame["w"]
    if len(scan) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci, entry in enumerate(scan):
                    comp = entry[0]
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            blocks.append((ci, my * comp["v"] + v,
                                           mx * comp["h"] + hh))
                yield blocks
    else:
        comp = scan[0][0]
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(0, by, bx)]


def _progressive_scan(data, pos, frame, scan, ss, se, ah, al, stores,
                      htables, restart_interval):
    """Decode one progressive scan into the persistent coefficient
    stores; returns the offset of the marker terminating the scan."""
    chunks, end = _entropy_chunks(data, pos)
    readers = _make_readers(chunks)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])

    rd_idx, rd = 0, readers[0]
    pred = [0] * len(scan)
    eobrun = 0
    n_in_chunk = 0
    if ss > 0:
        act = htables[(1, scan[0][2])]
        store = stores[scan[0][0]["idx"]]
    for blocks in _scan_blocks(frame, scan, hmax, vmax):
        if restart_interval and n_in_chunk == restart_interval:
            rd_idx += 1
            if rd_idx >= len(readers):
                raise ValueError("missing restart segment")
            rd = readers[rd_idx]
            pred = [0] * len(scan)
            eobrun = 0
            n_in_chunk = 0
        if ss == 0:                                   # DC scan
            for ci, by, bx in blocks:
                comp, td, _ = scan[ci]
                z = stores[comp["idx"]][by, bx]
                if ah == 0:                            # first pass (G.1.2.1)
                    s = rd.decode_symbol(htables[(0, td)])
                    diff = _extend(rd.read_bits(s), s) if s else 0
                    pred[ci] += diff
                    z[0] = pred[ci] << al
                elif rd.read_bit():                    # refinement (G.1.2.1)
                    z[0] |= 1 << al
        else:                                          # AC scan (Ns=1)
            (_ci, by, bx), = blocks
            z = store[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(rd, act, z, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(rd, act, z, ss, se, al, eobrun)
        n_in_chunk += 1
    return end


def _ac_first_block(rd, act, z, ss, se, al, eobrun):
    """G.1.2.2: first AC scan for one block — run/size coding with
    end-of-band (EOBn) run lengths spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode_symbol(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                                # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        z[k] = _extend(rd.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(rd, act, z, ss, se, al, eobrun):
    """G.1.2.3: AC successive-approximation refinement for one block.

    Newly-nonzero coefficients carry ±(1<<Al); every already-nonzero
    coefficient traversed (including during EOB runs) consumes one
    correction bit that may add 1<<Al toward its sign."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode_symbol(act)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                # s must be 1 in a well-formed stream (magnitude is ±1)
                newval = p1 if rd.read_bit() else m1
            while k <= se:
                if z[k] != 0:
                    if rd.read_bit() and (int(z[k]) & p1) == 0:
                        z[k] += p1 if z[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("AC refine index overflow")
                z[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if z[k] != 0:
                if rd.read_bit() and (int(z[k]) & p1) == 0:
                    z[k] += p1 if z[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun
