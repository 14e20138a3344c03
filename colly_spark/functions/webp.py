"""WebP (VP8-L lossless) codec, from scratch.

Built solely from the public specs: the "WebP Lossless Bitstream
Specification" (VP8L) and the "WebP Container Specification" (RIFF /
VP8X / ALPH), the same way functions/jpeg.py was built from ITU-T T.81.
The reference engine treats image payloads as opaque bytes
(response.go:189-194 noTextualData); pixel semantics come from
BASELINE.json input_hint ("decoded-pixel allclose ... + caption
equality") whose ``fmt`` column includes webp.

Scope (honest):
- VP8L lossless: FULL decoder — all four transforms (predictor, color,
  subtract-green, color-indexing incl. pixel bundling), color cache,
  meta prefix groups, LZ77 with the 2-D distance map — plus a real
  deterministic encoder (canonical prefix codes, optional LZ77 /
  color cache / subtract-green / palette / fixed-mode predictor /
  constant color element) used for round-trip tests and fixtures.
- ALPH chunk, compression method 1: the lossless-coded alpha plane of
  lossy files (a headerless VP8L stream) — decoded by the same engine;
  verified bit-exact against a genuine libwebp-produced stream in
  tests/test_webp.py.
- VP8 (lossy): FULL from-scratch keyframe decoder in
  functions/vp8.py (RFC 6386; normative tables transcribed from the
  spec via the system libwebp binary — scripts/extract_vp8_tables.py),
  verified BIT-EXACT against libwebp's decoded YUV planes across
  content/size/quality sweeps and CPython's genuine python.webp
  (tests/test_vp8.py). decode_webp routes lossy files through it and
  merges the ALPH alpha plane.

Everything is pure Python/numpy; images in this engine stay opaque
``binary`` columns through every shuffle and are only decoded map-side
inside Arrow batches (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (WebP lossless spec)
# ---------------------------------------------------------------------------

# order in which code-length-code lengths are stored (spec §6.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_LITS = 256
_LENGTH_CODES = 24
_DIST_CODES = 40
_ARGB_BLACK = 0xFF000000

# 2-D distance map (spec §5.2.2): the first 120 distance codes address
# near pixels by (dx, dy) offset, ordered by increasing euclidean
# distance; codes above 120 are linear distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
# structural self-check: exactly the set {y=0: x 1..8} ∪ {y 1..7: x -7..8}
assert len(set(_DIST_MAP)) == 120
assert set(_DIST_MAP) == (
    {(x, 0) for x in range(1, 9)}
    | {(x, y) for y in range(1, 8) for x in range(-7, 9)})

_DIST_MAP_INV = {xy: i + 1 for i, xy in enumerate(_DIST_MAP)}


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within bytes; prefix-code bits are
# written/read MSB-of-code-first (DEFLATE convention, spec §6.2)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("v", "pos", "nbits")

    def __init__(self, data: bytes):
        self.v = int.from_bytes(data, "little")
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        r = (self.v >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return r


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, nbits: int, val: int) -> None:
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths) -> dict:
    """symbol -> (length, code), DEFLATE canonical assignment."""
    maxlen = max(lengths)
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 1)
    for bits in range(1, maxlen + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (ln, next_code[ln])
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side prefix code. A code with a single used symbol is a
    0-bit code (both the spec's simple form and libwebp's normal-form
    special case behave that way)."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, lengths=None, explicit=None):
        if explicit is not None:  # simple form: symbols in READ order
            if len(explicit) == 1:
                self.single, self.table, self.maxlen = explicit[0], None, 0
            else:
                self.single = None
                self.table = {(1, 0): explicit[0], (1, 1): explicit[1]}
                self.maxlen = 1
            return
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single, self.table, self.maxlen = nz[0][0], None, 0
            return
        self.single = None
        m = _canonical_codes(lengths)
        self.table = {(ln, c): s for s, (ln, c) in m.items()}
        self.maxlen = max(ln for _, ln in nz)

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        c = 0
        table = self.table
        for ln in range(1, self.maxlen + 1):
            c = (c << 1) | br.read(1)
            s = table.get((ln, c))
            if s is not None:
                return s
        raise ValueError("VP8L: invalid prefix code bits")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _PrefixCode(explicit=syms)
    # normal code: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    # optional bound on the number of code-length TOKENS
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet_size
    lengths = [0] * alphabet_size
    symbol, prev_len = 0, 8
    while symbol < alphabet_size and max_tokens > 0:
        max_tokens -= 1
        code_len = clc.decode(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, val = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, val = 3 + br.read(3), 0
            else:  # 18
                repeat, val = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = val
                symbol += 1
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix coding of lengths/distances (spec §5.2.2)
# ---------------------------------------------------------------------------


def _lz77_decode_value(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra_bits = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _lz77_encode_value(v: int):
    """value (≥1) → (prefix_code, extra_bits_count, extra_bits_value)"""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    eb = u.bit_length() - 2
    base = 1 << (u.bit_length() - 1)
    if u >= base + (base >> 1):
        return 2 * eb + 3, eb, u - ((3 << eb))
    return 2 * eb + 2, eb, u - ((2 << eb))


def _plane_code_to_dist(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


def _dist_to_plane_code(xsize: int, dist: int) -> int:
    dy, dx = divmod(dist, xsize)
    code = _DIST_MAP_INV.get((dx, dy))
    if code is not None:
        return code
    code = _DIST_MAP_INV.get((dx - xsize, dy + 1))
    if code is not None:
        return code
    return dist + 120


# ---------------------------------------------------------------------------
# pixel helpers — pixels are ARGB packed in a uint32 (A<<24|R<<16|G<<8|B)
# ---------------------------------------------------------------------------


def _addpix(a: int, b: int) -> int:
    """per-channel addition mod 256 (two 16-bit SIMD lanes per field)"""
    return ((((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
            | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF))


def _subpix(a: int, b: int) -> int:
    """per-channel subtraction mod 256 (encode-side only)"""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
    return out


def _ch(p: int):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(t: int, l, tl) -> int:  # noqa: E741 - spec naming
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        pa_minus_pb += abs(lc - tlc) - abs(tc - tlc)
    return t if pa_minus_pb <= 0 else l


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clip255(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)
                        - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av, cv = (ave >> sh) & 0xFF, (c >> sh) & 0xFF
        d = av - cv
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= _clip255(av + half) << sh
    return out


def _predict(mode: int, l, t, tl, tr) -> int:  # noqa: E741
    if mode == 0:
        return _ARGB_BLACK
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _color_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic shift)"""
    t8 = t - 256 if t > 127 else t
    c8 = c - 256 if c > 127 else c
    return (t8 * c8) >> 5


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3


class _Transform:
    __slots__ = ("type", "w_in", "w_out", "size_bits", "sub", "palette",
                 "xbits")

    def __init__(self, ttype, w_in, w_out, size_bits=0, sub=None,
                 palette=None, xbits=0):
        self.type = ttype
        self.w_in = w_in      # image width BEFORE this transform's packing
        self.w_out = w_out    # width the coded stream uses after it
        self.size_bits = size_bits
        self.sub = sub
        self.palette = palette
        self.xbits = xbits


def _read_transform(br: _BitReader, cur_w: int, h: int):
    ttype = br.read(2)
    if ttype in (_T_PREDICTOR, _T_COLOR):
        size_bits = br.read(3) + 2
        bs = 1 << size_bits
        sub = _decode_image_stream(br, (cur_w + bs - 1) // bs,
                                   (h + bs - 1) // bs, level0=False)
        return _Transform(ttype, cur_w, cur_w, size_bits=size_bits, sub=sub)
    if ttype == _T_SUBTRACT_GREEN:
        return _Transform(ttype, cur_w, cur_w)
    if ttype == _T_COLOR_INDEX:
        n_colors = br.read(8) + 1
        raw = _decode_image_stream(br, n_colors, 1, level0=False)
        palette = [raw[0]]
        for i in range(1, n_colors):  # delta-coded entries
            palette.append(_addpix(raw[i], palette[i - 1]))
        xbits = 3 if n_colors <= 2 else (2 if n_colors <= 4
                                         else (1 if n_colors <= 16 else 0))
        packed_w = (cur_w + (1 << xbits) - 1) >> xbits
        return _Transform(_T_COLOR_INDEX, cur_w, packed_w,
                          palette=palette, xbits=xbits)
    raise ValueError("VP8L: bad transform type")


def _inverse_transform(t: _Transform, argb: list, h: int) -> list:
    if t.type == _T_SUBTRACT_GREEN:
        return [((p & 0xFF00FF00)
                 | (((p >> 16) + (p >> 8)) & 0xFF) << 16
                 | ((p + (p >> 8)) & 0xFF)) & 0xFFFFFFFF for p in argb]
    if t.type == _T_PREDICTOR:
        w, bits = t.w_out, t.size_bits
        sw = (w + (1 << bits) - 1) >> bits
        out = argb[:]  # residuals in, pixels out (in place, sequential)
        for y in range(h):
            row = y * w
            srow = (y >> bits) * sw
            for x in range(w):
                idx = row + x
                if y == 0:
                    pred = _ARGB_BLACK if x == 0 else out[idx - 1]
                elif x == 0:
                    pred = out[idx - w]
                else:
                    mode = (t.sub[srow + (x >> bits)] >> 8) & 0xFF
                    # rows are contiguous: TR of the last column is the
                    # first pixel of the CURRENT row (spec addressing)
                    pred = _predict(mode, out[idx - 1], out[idx - w],
                                    out[idx - w - 1], out[idx - w + 1])
                out[idx] = _addpix(out[idx], pred)
        return out
    if t.type == _T_COLOR:
        w, bits = t.w_out, t.size_bits
        sw = (w + (1 << bits) - 1) >> bits
        out = []
        for i, p in enumerate(argb):
            y, x = divmod(i, w)
            elem = t.sub[(y >> bits) * sw + (x >> bits)]
            g2r, g2b, r2b = elem & 0xFF, (elem >> 8) & 0xFF, (elem >> 16) & 0xFF
            a, r, g, b = _ch(p)
            r = (r + _color_delta(g2r, g)) & 0xFF
            b = (b + _color_delta(g2b, g) + _color_delta(r2b, r)) & 0xFF
            out.append((a << 24) | (r << 16) | (g << 8) | b)
        return out
    if t.type == _T_COLOR_INDEX:
        w_full, xbits, pal = t.w_in, t.xbits, t.palette
        if xbits == 0:
            return [pal[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(pal)
                    else 0 for p in argb]
        packed_w = t.w_out
        bpp = 8 >> xbits
        mask = (1 << bpp) - 1
        per = 1 << xbits
        out = []
        for y in range(h):
            row = y * packed_w
            for x in range(w_full):
                green = (argb[row + (x >> xbits)] >> 8) & 0xFF
                idx = (green >> ((x % per) * bpp)) & mask
                out.append(pal[idx] if idx < len(pal) else 0)
        return out
    raise ValueError("VP8L: bad transform")


# ---------------------------------------------------------------------------
# image stream decode (spec §6.2.3 DecodeImageStream)
# ---------------------------------------------------------------------------


def _read_huffman_groups(br: _BitReader, w: int, h: int, cache_bits: int,
                         level0: bool):
    meta = None
    meta_w = hbits = 0
    num_groups = 1
    if level0 and br.read(1):  # meta prefix codes present
        hbits = br.read(3) + 2
        meta_w = (w + (1 << hbits) - 1) >> hbits
        meta_h = (h + (1 << hbits) - 1) >> hbits
        img = _decode_image_stream(br, meta_w, meta_h, level0=False)
        meta = [((p >> 8) & 0xFFFF) for p in img]  # (red<<8)|green
        num_groups = max(meta) + 1
    green_size = _GREEN_LITS + _LENGTH_CODES + ((1 << cache_bits)
                                                if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, _DIST_CODES),
        ))
    return groups, meta, meta_w, hbits


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         level0: bool) -> list:
    transforms = []
    cur_w = w
    if level0:
        while br.read(1):
            t = _read_transform(br, cur_w, h)
            transforms.append(t)
            cur_w = t.w_out
    cache_bits = br.read(4) if br.read(1) else 0
    groups, meta, meta_w, hbits = _read_huffman_groups(
        br, cur_w, h, cache_bits, level0)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    n = cur_w * h
    out = [0] * n
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, cur_w)
            gi = meta[(y >> hbits) * meta_w + (x >> hbits)]
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        s = g_green.decode(br)
        if s < _GREEN_LITS:
            red = g_red.decode(br)
            blue = g_blue.decode(br)
            alpha = g_alpha.decode(br)
            pix = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = pix
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * pix) & 0xFFFFFFFF) >> cache_shift] = pix
        elif s < _GREEN_LITS + _LENGTH_CODES:
            length = _lz77_decode_value(br, s - _GREEN_LITS)
            dist_prefix = g_dist.decode(br)
            plane_code = _lz77_decode_value(br, dist_prefix)
            dist = _plane_code_to_dist(cur_w, plane_code)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            if cache is None:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
            else:
                for _ in range(length):
                    pix = out[pos - dist]
                    out[pos] = pix
                    cache[((0x1E35A7BD * pix) & 0xFFFFFFFF)
                          >> cache_shift] = pix
                    pos += 1
        else:  # color-cache reference
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - (_GREEN_LITS + _LENGTH_CODES)]
            pos += 1
    for t in reversed(transforms):
        out = _inverse_transform(t, out, h)
    return out


# ---------------------------------------------------------------------------
# public decode API
# ---------------------------------------------------------------------------


def _argb_to_array(argb: list, w: int, h: int, keep_alpha: bool):
    arr = np.array(argb, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 4 if keep_alpha else 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 0xFF
    rgb[..., 1] = (arr >> 8) & 0xFF
    rgb[..., 2] = arr & 0xFF
    if keep_alpha:
        rgb[..., 3] = (arr >> 24) & 0xFF
    return rgb


def decode_vp8l(payload: bytes, keep_alpha: bool = False) -> np.ndarray:
    """Decode a VP8L chunk payload (with signature/header) to (h, w, 3)
    RGB uint8 (or RGBA with ``keep_alpha``)."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _decode_image_stream(br, w, h, level0=True)
    return _argb_to_array(argb, w, h, keep_alpha)


def decode_alpha_chunk(alph: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk (container spec) to the (h, w) uint8 alpha
    plane. Compression 1 is a headerless VP8L image stream whose green
    channel carries alpha; filters 1-3 are the row predictors."""
    head = alph[0]
    compression = head & 3
    filt = (head >> 2) & 3
    # pre-processing (bits 4-5) is an encode-side level reduction; the
    # decoder applies nothing for it (container spec §Alpha)
    if compression == 0:
        plane = np.frombuffer(alph[1:1 + w * h],
                              dtype=np.uint8).reshape(h, w).copy()
    elif compression == 1:
        br = _BitReader(alph[1:])
        argb = _decode_image_stream(br, w, h, level0=True)
        plane = ((np.array(argb, dtype=np.uint32).reshape(h, w) >> 8)
                 & 0xFF).astype(np.uint8)
    else:
        raise ValueError("ALPH: bad compression method")
    if filt == 0:
        return plane
    out = plane.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if filt == 1:    # horizontal
                pred = (out[y, x - 1] if x else (out[y - 1, x] if y else 0))
            elif filt == 2:  # vertical
                pred = (out[y - 1, x] if y else (out[y, x - 1] if x else 0))
            else:            # gradient
                if x == 0:
                    pred = out[y - 1, x] if y else 0
                elif y == 0:
                    pred = out[y, x - 1]
                else:
                    pred = min(255, max(0, int(out[y, x - 1])
                                        + int(out[y - 1, x])
                                        - int(out[y - 1, x - 1])))
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _riff_chunks(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) file")
    chunks = {}
    i = 12
    while i + 8 <= len(data):
        tag = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        chunks[tag] = data[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    return chunks


def decode_webp(data: bytes, keep_alpha: bool = False) -> np.ndarray:
    """Decode a WebP file, entirely from scratch: lossless (VP8L) via
    this module, lossy (VP8 key frame) via functions/vp8.py (bit-exact
    YUV vs libwebp, converted with the portable BT.601 integer path),
    with the ALPH alpha plane merged for lossy+alpha files."""
    chunks = _riff_chunks(bytes(data))
    if b"VP8L" in chunks:
        return decode_vp8l(chunks[b"VP8L"], keep_alpha)
    if b"VP8 " in chunks:
        from colly_spark.functions.vp8 import decode_vp8, yuv420_to_rgb

        Y, U, V = decode_vp8(chunks[b"VP8 "])
        rgb = yuv420_to_rgb(Y, U, V)
        if not keep_alpha:
            return rgb
        h, w = rgb.shape[:2]
        if b"ALPH" in chunks:
            alpha = decode_alpha_chunk(chunks[b"ALPH"], w, h)
        else:
            alpha = np.full((h, w), 255, np.uint8)
        return np.concatenate([rgb, alpha[:, :, None]], axis=2)
    raise ValueError("WebP: no image chunk found")


def webp_dimensions(data: bytes):
    """(w, h) from the container without a full decode."""
    chunks = _riff_chunks(bytes(data))
    if b"VP8X" in chunks:
        x = chunks[b"VP8X"]
        w = 1 + (x[4] | (x[5] << 8) | (x[6] << 16))
        h = 1 + (x[7] | (x[8] << 8) | (x[9] << 16))
        return w, h
    if b"VP8L" in chunks:
        br = _BitReader(chunks[b"VP8L"])
        if br.read(8) != 0x2F:
            raise ValueError("VP8L: bad signature")
        return br.read(14) + 1, br.read(14) + 1
    if b"VP8 " in chunks:
        c = chunks[b"VP8 "]
        if c[3:6] != b"\x9d\x01\x2a":
            raise ValueError("VP8: bad keyframe start code")
        return (c[6] | (c[7] << 8)) & 0x3FFF, (c[8] | (c[9] << 8)) & 0x3FFF
    raise ValueError("WebP: no dimension source")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict, max_len: int) -> dict:
    """symbol -> code length, deterministic, depth-limited by frequency
    halving (Kraft stays satisfiable because halving only flattens)."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    f = dict(freqs)
    while True:
        heap = []
        for i, (s, c) in enumerate(sorted(f.items())):
            heapq.heappush(heap, (c, i, (s,)))
        tie = len(f)
        while len(heap) > 1:
            c1, _, s1 = heapq.heappop(heap)
            c2, _, s2 = heapq.heappop(heap)
            heapq.heappush(heap, (c1 + c2, tie, s1 + s2))
            tie += 1
        # depth per symbol = number of merges it participated in
        depth = {s: 0 for s in f}
        heap2 = []
        for i, (s, c) in enumerate(sorted(f.items())):
            heapq.heappush(heap2, (c, i, (s,)))
        tie = len(f)
        while len(heap2) > 1:
            c1, _, s1 = heapq.heappop(heap2)
            c2, _, s2 = heapq.heappop(heap2)
            for s in s1 + s2:
                depth[s] += 1
            heapq.heappush(heap2, (c1 + c2, tie, s1 + s2))
            tie += 1
        if max(depth.values()) <= max_len:
            return depth
        f = {s: (c + 1) // 2 for s, c in f.items()}


def _write_prefix_code(bw: _BitWriter, lengths_map: dict,
                       alphabet_size: int) -> dict:
    """Write a prefix code (simple or normal form); return the
    symbol -> (len, code) encode map ({} for 0-bit single-symbol)."""
    syms = sorted(lengths_map)
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.write(1, 1)                       # simple
        bw.write(1, len(syms) - 1)
        first_8bits = 1 if syms[0] > 1 else 0
        bw.write(1, first_8bits)
        bw.write(8 if first_8bits else 1, syms[0])
        if len(syms) == 2:
            bw.write(8, syms[1])
        if len(syms) == 1:
            return {}
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    bw.write(1, 0)                           # normal
    lengths = [0] * alphabet_size
    for s in syms:
        lengths[s] = lengths_map[s]
    # tokenize: literal lengths + zero runs (17/18); stop at last nonzero
    last = max(s for s in syms)
    tokens = []
    i = 0
    while i <= last:
        if lengths[i] == 0:
            run = 0
            while i <= last and lengths[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                take = min(run, 138)
                if take >= 11:
                    tokens.append((18, take - 11, 7))
                else:
                    tokens.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                tokens.append((0, 0, 0))
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    clc_freq = {}
    for sym, _, _ in tokens:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_lengths = _huffman_lengths(clc_freq, 7)
    num_clc = max(4, max(_CLC_ORDER.index(s) for s in clc_lengths) + 1)
    bw.write(4, num_clc - 4)
    for i in range(num_clc):
        bw.write(3, clc_lengths.get(_CLC_ORDER[i], 0))
    clc_codes = ({} if len(clc_lengths) == 1 else {
        s: lc for s, lc in _canonical_codes(
            [clc_lengths.get(s, 0) for s in range(19)]).items()})
    # token-count bound so trailing zeros need no tokens
    n_tokens = max(2, len(tokens))
    nbits = 2
    while (n_tokens - 2) >= (1 << nbits):
        nbits += 2
    bw.write(1, 1)
    bw.write(3, (nbits - 2) // 2)
    bw.write(nbits, n_tokens - 2)
    pad = n_tokens - len(tokens)
    for sym, extra, ebits in tokens + [(0, 0, 0)] * pad:
        if clc_codes:
            ln, code = clc_codes[sym]
            bw.write_code(ln, code)
        if ebits:
            bw.write(ebits, extra)
    if len(syms) == 1:
        return {}  # libwebp treats single-symbol normal codes as 0-bit
    enc = _canonical_codes(lengths)
    return enc


def _tokenize(px: list, cache_bits: int, use_lz77: bool) -> list:
    """pixel sequence → tokens ('lit', pix) | ('cache', idx) |
    ('copy', length, dist). Greedy LZ77 over uint32 pixels with
    last-8-positions chains; cache checked before literals."""
    n = len(px)
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    chains: dict = {}
    pos = 0
    while pos < n:
        best_len, best_dist = 0, 0
        if use_lz77:
            for c in reversed(chains.get(px[pos], ())):
                limit = min(n - pos, 4096)
                ln = 0
                while ln < limit and px[c + ln] == px[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, pos - c
                    if ln >= limit:
                        break
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            end = pos + best_len
            while pos < end:
                v = px[pos]
                chains.setdefault(v, []).append(pos)
                if len(chains[v]) > 8:
                    chains[v] = chains[v][-8:]
                if cache is not None:
                    cache[((0x1E35A7BD * v) & 0xFFFFFFFF) >> shift] = v
                pos += 1
        else:
            v = px[pos]
            key = ((0x1E35A7BD * v) & 0xFFFFFFFF) >> shift if cache else 0
            if cache is not None and cache[key] == v:
                tokens.append(("cache", key))
            else:
                tokens.append(("lit", v))
                if cache is not None:
                    cache[key] = v
            chains.setdefault(v, []).append(pos)
            if len(chains[v]) > 8:
                chains[v] = chains[v][-8:]
            pos += 1
    return tokens


def _encode_image_stream(bw: _BitWriter, argb: list, w: int, h: int,
                         level0: bool, cache_bits: int = 0,
                         use_lz77: bool = True) -> None:
    """Encode one image stream (no transforms here — callers write
    transform headers first when level0)."""
    if level0 is False:
        pass  # sub-streams have no transform section by construction
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    if level0:
        bw.write(1, 0)  # no meta prefix codes
    tokens = _tokenize(argb, cache_bits, use_lz77)
    green_f, red_f, blue_f, alpha_f, dist_f = {}, {}, {}, {}, {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = _ch(tok[1])
            bump(green_f, g)
            bump(red_f, r)
            bump(blue_f, b)
            bump(alpha_f, a)
        elif tok[0] == "cache":
            bump(green_f, _GREEN_LITS + _LENGTH_CODES + tok[1])
        else:
            lp, _, _ = _lz77_encode_value(tok[1])
            bump(green_f, _GREEN_LITS + lp)
            dp, _, _ = _lz77_encode_value(_dist_to_plane_code(w, tok[2]))
            bump(dist_f, dp)
    green_size = _GREEN_LITS + _LENGTH_CODES + ((1 << cache_bits)
                                                if cache_bits else 0)
    for f in (red_f, blue_f, alpha_f, dist_f):
        if not f:
            f[0] = 1  # decoder always reads 5 codes
    if not green_f:
        green_f[0] = 1
    g_enc = _write_prefix_code(bw, _huffman_lengths(green_f, 15), green_size)
    r_enc = _write_prefix_code(bw, _huffman_lengths(red_f, 15), 256)
    b_enc = _write_prefix_code(bw, _huffman_lengths(blue_f, 15), 256)
    a_enc = _write_prefix_code(bw, _huffman_lengths(alpha_f, 15), 256)
    d_enc = _write_prefix_code(bw, _huffman_lengths(dist_f, 15), _DIST_CODES)

    def put(enc, sym):
        lc = enc.get(sym)
        if lc is not None:
            bw.write_code(lc[0], lc[1])

    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = _ch(tok[1])
            put(g_enc, g)
            put(r_enc, r)
            put(b_enc, b)
            put(a_enc, a)
        elif tok[0] == "cache":
            put(g_enc, _GREEN_LITS + _LENGTH_CODES + tok[1])
        else:
            _, length, dist = tok
            lp, le, lv = _lz77_encode_value(length)
            put(g_enc, _GREEN_LITS + lp)
            if le:
                bw.write(le, lv)
            dp, de, dv = _lz77_encode_value(_dist_to_plane_code(w, dist))
            put(d_enc, dp)
            if de:
                bw.write(de, dv)


def _forward_predictor(argb: list, w: int, h: int, mode: int) -> list:
    out = []
    for idx, p in enumerate(argb):
        y, x = divmod(idx, w)
        if y == 0:
            pred = _ARGB_BLACK if x == 0 else argb[idx - 1]
        elif x == 0:
            pred = argb[idx - w]
        else:
            pred = _predict(mode, argb[idx - 1], argb[idx - w],
                            argb[idx - w - 1], argb[idx - w + 1])
        out.append(_subpix(p, pred))
    return out


def _forward_color(argb: list, elem: int) -> list:
    g2r, g2b, r2b = elem & 0xFF, (elem >> 8) & 0xFF, (elem >> 16) & 0xFF
    out = []
    for p in argb:
        a, r, g, b = _ch(p)
        nr = (r - _color_delta(g2r, g)) & 0xFF
        nb = (b - _color_delta(g2b, g) - _color_delta(r2b, r)) & 0xFF
        out.append((a << 24) | (nr << 16) | (g << 8) | nb)
    return out


def encode_vp8l(pixels: np.ndarray, *, use_subtract_green: bool = True,
                cache_bits: int = 4, use_lz77: bool = True,
                use_palette: bool | None = None,
                predictor_mode: int | None = None,
                color_element: int | None = None) -> bytes:
    """Encode (h, w, 3) or (h, w, 4) uint8 pixels as a VP8L payload.
    Deterministic. Transform toggles exist so round-trip tests cover
    every decoder path; the default (subtract-green + LZ77 + 4-bit
    cache, palette auto for ≤256 colors) is a sane general setting."""
    h, w = pixels.shape[:2]
    has_alpha = pixels.shape[2] == 4
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("VP8L: image too large")
    px32 = pixels.astype(np.uint32)
    argb_arr = ((px32[..., 3] if has_alpha else np.uint32(255)) << 24) \
        | (px32[..., 0] << 16) | (px32[..., 1] << 8) | px32[..., 2]
    argb = [int(v) for v in argb_arr.reshape(-1)]

    bw = _BitWriter()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 1 if has_alpha else 0)
    bw.write(3, 0)

    uniq = list(dict.fromkeys(argb))  # first-occurrence palette order
    if use_palette is None:
        use_palette = (len(uniq) <= 256
                       and len(uniq) * 12 < len(argb)
                       and predictor_mode is None
                       and color_element is None)
    cur_w = w
    if use_palette:
        if len(uniq) > 256:
            raise ValueError("palette: more than 256 distinct colors")
        index_of = {v: i for i, v in enumerate(uniq)}
        n_colors = len(uniq)
        xbits = 3 if n_colors <= 2 else (2 if n_colors <= 4
                                         else (1 if n_colors <= 16 else 0))
        bpp = 8 >> xbits
        per = 1 << xbits
        packed_w = (w + per - 1) >> xbits
        packed = []
        for y in range(h):
            row = argb[y * w:(y + 1) * w]
            for bx in range(packed_w):
                green = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        green |= index_of[row[x]] << (k * bpp)
                packed.append(_ARGB_BLACK | (green << 8))
        bw.write(1, 1)
        bw.write(2, _T_COLOR_INDEX)
        bw.write(8, n_colors - 1)
        deltas = [uniq[0]] + [_subpix(uniq[i], uniq[i - 1])
                              for i in range(1, n_colors)]
        _encode_image_stream(bw, deltas, n_colors, 1, level0=False,
                             cache_bits=0, use_lz77=False)
        argb, cur_w = packed, packed_w
    else:
        if color_element is not None:
            bw.write(1, 1)
            bw.write(2, _T_COLOR)
            size_bits = 9  # one block ≥ any 16k image → constant element
            bw.write(3, size_bits - 2)
            bs = 1 << size_bits
            sw, sh = (cur_w + bs - 1) // bs, (h + bs - 1) // bs
            _encode_image_stream(bw, [0xFF000000 | color_element] * (sw * sh),
                                 sw, sh, level0=False, cache_bits=0,
                                 use_lz77=False)
            argb = _forward_color(argb, color_element)
        if use_subtract_green:
            bw.write(1, 1)
            bw.write(2, _T_SUBTRACT_GREEN)
            argb = [((p & 0xFF00FF00)
                     | ((((p >> 16) - (p >> 8)) & 0xFF) << 16)
                     | ((p - (p >> 8)) & 0xFF)) & 0xFFFFFFFF for p in argb]
        if predictor_mode is not None:
            bw.write(1, 1)
            bw.write(2, _T_PREDICTOR)
            size_bits = 9
            bw.write(3, size_bits - 2)
            bs = 1 << size_bits
            sw, sh = (cur_w + bs - 1) // bs, (h + bs - 1) // bs
            _encode_image_stream(
                bw, [_ARGB_BLACK | (predictor_mode << 8)] * (sw * sh),
                sw, sh, level0=False, cache_bits=0, use_lz77=False)
            argb = _forward_predictor(argb, cur_w, h, predictor_mode)
    bw.write(1, 0)  # end of transforms
    _encode_image_stream(bw, argb, cur_w, h, level0=True,
                         cache_bits=cache_bits, use_lz77=use_lz77)
    return bw.getvalue()


def encode_webp(pixels: np.ndarray, **kwargs) -> bytes:
    """Encode pixels as a lossless .webp file (RIFF + VP8L)."""
    payload = encode_vp8l(pixels, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
