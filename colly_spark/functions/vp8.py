"""From-scratch VP8 intra (keyframe) decoder — RFC 6386.

Built solely from the public spec ("VP8 Data Format and Decoding
Guide", RFC 6386) the same way functions/jpeg.py was built from ITU-T
T.81 and functions/webp.py from the WebP lossless spec. The normative
constant tables live in functions/vp8_tables.py (see
scripts/extract_vp8_tables.py for their provenance). A WebP lossy
payload is always a single VP8 key frame, so the intra toolset —
boolean arithmetic decoder, keyframe header, mode decoding, token/
coefficient decoding, dequantization, inverse WHT/DCT, the four 16x16
/ four 8x8 / ten 4x4 intra predictors, and both loop filters — is the
complete decoder for this engine's purposes; interframe tools
(motion vectors, reference buffers) are out of scope by construction.

Correctness: tests/test_vp8.py proves the decoded Y/U/V planes
BIT-EXACT against the independent system libwebp (WebPDecodeYUV) on
genuine libwebp-encoded streams across qualities, sizes (including
non-multiple-of-16), and content classes, plus CPython's python.webp.
A single wrong table byte, context rule, clamp, or filter tap fails
that gate.

Reference engine relevance: images are opaque bytes to the reference
(response.go:189-194); pixel semantics come from BASELINE.json
input_hint ("decoded-pixel allclose (PSNR>=40dB for lossy) + caption
equality") whose fmt column includes lossy webp.

Scale shape: pure-Python per-coefficient work is the portable parity
path used map-side inside Arrow batches for validation-scale images;
bulk decode rides the native libwebp binding
(functions/native_codecs.py) behind the same decode_image dispatch.
"""

from __future__ import annotations

import numpy as np

from colly_spark.functions.vp8_tables import (AC_QLOOKUP, BANDS,
                                              COEFF_UPDATE_PROBS,
                                              DC_QLOOKUP,
                                              DEFAULT_COEFF_PROBS,
                                              KF_BMODE_PROB, KF_UV_PROB,
                                              KF_YMODE_PROB, PCAT, ZIGZAG)

# ---------------------------------------------------------------------------
# boolean arithmetic decoder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    __slots__ = ("buf", "pos", "range", "value", "bits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 2
        self.range = 255
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bits = 0  # bits consumed from the current refill byte

    def get_bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            bit = 1
            self.range -= split
            self.value -= bigsplit
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else 0
                self.pos += 1
                self.value |= nxt
        return bit

    def get_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit(128)
        return v

    def get_signed(self, n: int) -> int:
        """n-bit magnitude followed by a sign bit (RFC sign-magnitude)."""
        v = self.get_literal(n)
        return -v if self.get_bit(128) else v

    def maybe_signed(self, n: int) -> int:
        """flag; if set, signed n-bit value (header delta convention)."""
        return self.get_signed(n) if self.get_bit(128) else 0

    def get_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get_bit(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# trees (RFC 6386 §8.2, §11.2-11.4, §13.2)
# ---------------------------------------------------------------------------

# 16x16 intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)

# 4x4 intra (b) modes
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = (-B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
              -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
# 16x16 mode -> equivalent b-mode, for 4x4 above/left contexts
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# coefficient tokens: 0..4 literal, then categories, then EOB
DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6 = 5, 6, 7, 8, 9, 10
DCT_EOB = 11
COEFF_TREE = (-DCT_EOB, 2, -DCT_0, 4, -DCT_1, 6, 8, 12,
              -DCT_2, 10, -DCT_3, -DCT_4, 14, 16,
              -CAT1, -CAT2, 18, 20, -CAT3, -CAT4, -CAT5, -CAT6)
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def _clamp(v, lo, hi):
    return lo if v < lo else (hi if v > hi else v)


# ---------------------------------------------------------------------------
# frame header (RFC 6386 §9)
# ---------------------------------------------------------------------------


class _Header:
    pass


def _parse_uncompressed(data: bytes):
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    keyframe = not (tag & 1)
    part0_size = tag >> 5
    if not keyframe:
        raise NotImplementedError("VP8: interframes are out of scope "
                                  "(WebP stills are key frames)")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    return w, h, part0_size, data[10:]


def _parse_header(bd: BoolDecoder, rest: bytes, part0_size: int):
    h = _Header()
    bd.get_bit(128)  # color space
    bd.get_bit(128)  # clamping type

    # segmentation (§9.3)
    h.segmentation = bd.get_bit(128)
    h.update_map = 0
    h.seg_tree_probs = [255, 255, 255]
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    if h.segmentation:
        h.update_map = bd.get_bit(128)
        update_data = bd.get_bit(128)
        if update_data:
            h.seg_abs = bd.get_bit(128)
            for i in range(4):
                h.seg_quant[i] = bd.maybe_signed(7)
            for i in range(4):
                h.seg_lf[i] = bd.maybe_signed(6)
        if h.update_map:
            for i in range(3):
                if bd.get_bit(128):
                    h.seg_tree_probs[i] = bd.get_literal(8)

    # loop filter (§9.4)
    h.filter_simple = bd.get_bit(128)
    h.filter_level = bd.get_literal(6)
    h.sharpness = bd.get_literal(3)
    h.lf_delta_enable = bd.get_bit(128)
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enable:
        if bd.get_bit(128):  # deltas updated this frame
            for i in range(4):
                if bd.get_bit(128):
                    h.ref_lf_delta[i] = bd.get_signed(6)
            for i in range(4):
                if bd.get_bit(128):
                    h.mode_lf_delta[i] = bd.get_signed(6)

    # token partitions (§9.5)
    h.n_parts = 1 << bd.get_literal(2)
    sizes_bytes = 3 * (h.n_parts - 1)
    tail = rest[part0_size:]
    h.partitions = []
    off = sizes_bytes
    for i in range(h.n_parts - 1):
        sz = tail[3 * i] | (tail[3 * i + 1] << 8) | (tail[3 * i + 2] << 16)
        h.partitions.append(tail[off:off + sz])
        off += sz
    h.partitions.append(tail[off:])

    # quantizer indices (§9.6)
    h.y_ac_qi = bd.get_literal(7)
    h.y_dc_delta = bd.maybe_signed(4)
    h.y2_dc_delta = bd.maybe_signed(4)
    h.y2_ac_delta = bd.maybe_signed(4)
    h.uv_dc_delta = bd.maybe_signed(4)
    h.uv_ac_delta = bd.maybe_signed(4)

    bd.get_bit(128)  # refresh entropy probs (no-op for stills)

    # coefficient probability updates (§13.4)
    probs = [[[list(DEFAULT_COEFF_PROBS[((t * 8 + b) * 3 + c) * 11:
                                        ((t * 8 + b) * 3 + c) * 11 + 11])
               for c in range(3)] for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                base = ((t * 8 + b) * 3 + c) * 11
                for n in range(11):
                    if bd.get_bit(COEFF_UPDATE_PROBS[base + n]):
                        probs[t][b][c][n] = bd.get_literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = bd.get_bit(128)
    h.prob_skip_false = bd.get_literal(8) if h.mb_no_skip else 0
    return h


# ---------------------------------------------------------------------------
# dequantization factors (RFC 6386 §9.6, §14.1)
# ---------------------------------------------------------------------------


def _dc_q(i):
    return DC_QLOOKUP[_clamp(i, 0, 127)]


def _ac_q(i):
    return AC_QLOOKUP[_clamp(i, 0, 127)]


def _segment_quants(h):
    out = []
    for s in range(4):
        if h.segmentation:
            qi = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            qi = h.y_ac_qi
        qi = _clamp(qi, 0, 127)
        y1dc = _dc_q(qi + h.y_dc_delta)
        y1ac = _ac_q(qi)
        y2dc = _dc_q(qi + h.y2_dc_delta) * 2
        y2ac = _ac_q(qi + h.y2_ac_delta) * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = _dc_q(qi + h.uv_dc_delta)
        if uvdc > 132:
            uvdc = 132
        uvac = _ac_q(qi + h.uv_ac_delta)
        out.append(dict(y1=(y1dc, y1ac), y2=(y2dc, y2ac), uv=(uvdc, uvac)))
    return out


# ---------------------------------------------------------------------------
# coefficient / token decoding (RFC 6386 §13)
# ---------------------------------------------------------------------------


def _decode_coeffs(bd: BoolDecoder, probs, block_type: int, first: int,
                   ctx: int, dq) -> tuple:
    """Decode one 4x4 block's coefficients. Returns (coeffs[16] in
    natural order, nonzero_flag, last_index)."""
    coeffs = [0] * 16
    i = first
    nonzero = 0
    last = -1
    dc_step, ac_step = dq
    prev_token_zero = False
    while i < 16:
        p = probs[block_type][BANDS[i]][ctx]
        if prev_token_zero:
            # after a zero coefficient, EOB cannot occur: enter the
            # tree below the EOB branch
            tok = bd.get_tree(COEFF_TREE, p, start=2)
        else:
            tok = bd.get_tree(COEFF_TREE, p)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            prev_token_zero = True
            i += 1
            continue
        prev_token_zero = False
        if tok <= DCT_4:
            v = tok
        else:
            v = CAT_BASE[tok]
            extra = 0
            for pe in PCAT[tok - CAT1]:
                extra = (extra << 1) | bd.get_bit(pe)
            v += extra
        if bd.get_bit(128):
            v = -v
        ctx = 1 if tok == DCT_1 else 2
        pos = ZIGZAG[i]
        coeffs[pos] = v * (dc_step if pos == 0 else ac_step)
        nonzero = 1
        last = i
        i += 1
    return coeffs, nonzero, last


# ---------------------------------------------------------------------------
# inverse transforms (RFC 6386 §14.3-14.4)
# ---------------------------------------------------------------------------


def _iwht4x4(coeffs):
    out = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        a2 = a1 + b1
        b2 = c1 + d1
        c2 = a1 - b1
        d2 = d1 - c1
        out[4 * i] = (a2 + 3) >> 3
        out[4 * i + 1] = (b2 + 3) >> 3
        out[4 * i + 2] = (c2 + 3) >> 3
        out[4 * i + 3] = (d2 + 3) >> 3
    return out


def _mul1(a):  # a * cos(pi/8)*sqrt(2), Q16 fixed point per spec
    return ((a * 20091) >> 16) + a


def _mul2(a):  # a * sin(pi/8)*sqrt(2)
    return (a * 35468) >> 16


def _idct4x4(coeffs):
    tmp = [0] * 16
    out = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[8 + i]
        b1 = coeffs[i] - coeffs[8 + i]
        c1 = _mul2(coeffs[4 + i]) - _mul1(coeffs[12 + i])
        d1 = _mul1(coeffs[4 + i]) + _mul2(coeffs[12 + i])
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 2]
        b1 = tmp[4 * i] - tmp[4 * i + 2]
        c1 = _mul2(tmp[4 * i + 1]) - _mul1(tmp[4 * i + 3])
        d1 = _mul1(tmp[4 * i + 1]) + _mul2(tmp[4 * i + 3])
        out[4 * i] = (a1 + d1 + 4) >> 3
        out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + c1 + 4) >> 3
        out[4 * i + 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 §12)
# ---------------------------------------------------------------------------


def _pred_block(plane, x0, y0, size, mode, mbx, mby, frame_w):
    """Whole-block (16x16 luma / 8x8 chroma) prediction into
    plane[y0:y0+size, x0:x0+size]. Border rules: above row is 127 off
    the top, left column is 129 off the left (RFC §12.2)."""
    have_above = y0 > 0
    have_left = x0 > 0
    if mode == DC_PRED:
        total, n = 0, 0
        if have_above:
            total += int(plane[y0 - 1, x0:x0 + size].sum())
            n += size
        if have_left:
            total += int(plane[y0:y0 + size, x0 - 1].sum())
            n += size
        dc = 128 if n == 0 else (total + (n >> 1)) // n
        plane[y0:y0 + size, x0:x0 + size] = dc
    elif mode == V_PRED:
        above = plane[y0 - 1, x0:x0 + size] if have_above \
            else np.full(size, 127, np.int32)
        plane[y0:y0 + size, x0:x0 + size] = above[None, :]
    elif mode == H_PRED:
        left = plane[y0:y0 + size, x0 - 1] if have_left \
            else np.full(size, 129, np.int32)
        plane[y0:y0 + size, x0:x0 + size] = left[:, None]
    else:  # TM_PRED
        above = plane[y0 - 1, x0:x0 + size].astype(np.int32) if have_above \
            else np.full(size, 127, np.int32)
        left = plane[y0:y0 + size, x0 - 1].astype(np.int32) if have_left \
            else np.full(size, 129, np.int32)
        # border rule: row -1 is 127 (so tl=127 whenever y0==0);
        # column -1 below row 0 is 129 (so tl=129 for x0==0, y0>0)
        if have_above and have_left:
            tl = int(plane[y0 - 1, x0 - 1])
        elif have_above:   # x0 == 0, y0 > 0
            tl = 129
        else:              # y0 == 0
            tl = 127
        blk = left[:, None] + above[None, :] - tl
        plane[y0:y0 + size, x0:x0 + size] = np.clip(blk, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(plane, x0, y0, mode, above, left, tl, ar):
    """4x4 subblock prediction (RFC §12.3). `above`/`left` are length-4
    int lists, `tl` the above-left pixel, `ar` the 4 above-right
    pixels."""
    A = above
    L = left
    P = tl
    R = ar
    blk = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                blk[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                blk[r][c] = _clamp(L[r] + A[c] - P, 0, 255)
    elif mode == B_VE:
        row = [_avg3(P, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], R[0])]
        for r in range(4):
            blk[r] = list(row)
    elif mode == B_HE:
        col = [_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        for r in range(4):
            for c in range(4):
                blk[r][c] = col[r]
    elif mode == B_LD:
        e = [A[0], A[1], A[2], A[3], R[0], R[1], R[2], R[3]]
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    blk[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    blk[r][c] = _avg3(e[6], e[7], e[7])
    elif mode == B_RD:
        # e[0..8] = L3 L2 L1 L0 P A0 A1 A2 A3; pred depends on c - r
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                blk[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        # RFC §12.3 reference pattern: rows 0/1 walk the edge; rows
        # 2/3 copy from two rows up, one column left
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for c in range(4):
            blk[0][c] = _avg2(e[4 + c], e[5 + c])
            blk[1][c] = _avg3(e[3 + c], e[4 + c], e[5 + c])
        for r in (2, 3):
            for c in range(4):
                if c == 0:
                    blk[r][c] = _avg3(e[4 - r], e[5 - r], e[6 - r])
                else:
                    blk[r][c] = blk[r - 2][c - 1]
    elif mode == B_VL:
        e = [A[0], A[1], A[2], A[3], R[0], R[1], R[2], R[3]]
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if r & 1:
                    blk[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    blk[r][c] = _avg2(e[i], e[i + 1])
        # the spec's two literal exceptions in the bottom-right corner
        blk[2][3] = _avg3(e[4], e[5], e[6])
        blk[3][3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HD:
        # rows walk DOWN the left edge; columns 2/3 copy from one row
        # up, two columns left; row 0 continues along the above edge
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        for r in range(4):
            blk[r][0] = _avg2(e[3 - r], e[4 - r])
            blk[r][1] = _avg3(e[3 - r], e[4 - r], e[5 - r])
            for c in (2, 3):
                if r == 0:
                    blk[0][c] = _avg3(e[2 + c], e[3 + c], e[4 + c])
                else:
                    blk[r][c] = blk[r - 1][c - 2]
    else:  # B_HU
        for r in range(4):
            for c in range(4):
                i = r * 2 + c
                if i < 5:
                    if i & 1:
                        blk[r][c] = _avg3(L[i >> 1], L[(i >> 1) + 1],
                                          L[min((i >> 1) + 2, 3)])
                    else:
                        blk[r][c] = _avg2(L[i >> 1], L[(i >> 1) + 1])
                elif i == 5:
                    blk[r][c] = _avg3(L[2], L[3], L[3])
                else:
                    blk[r][c] = L[3]
    for r in range(4):
        for c in range(4):
            plane[y0 + r, x0 + c] = blk[r][c]


def _add_residual(plane, x0, y0, res):
    blk = plane[y0:y0 + 4, x0:x0 + 4].astype(np.int32)
    blk += np.array(res, np.int32).reshape(4, 4)
    plane[y0:y0 + 4, x0:x0 + 4] = np.clip(blk, 0, 255)


# ---------------------------------------------------------------------------
# loop filter (RFC 6386 §15)
# ---------------------------------------------------------------------------


def _s8(v):  # value-128 as signed (the spec's u2s)
    return v - 128


def _c(v):  # clamp to signed char
    return _clamp(v, -128, 127)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """Returns (F, new_p0, new_q0). Pixels passed/returned as signed.
    Per spec, the outer-tap term (p1 - q1) is clamped on its own
    before entering the sum."""
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    return f1, _c(p0 + f2), _c(q0 - f1)


def _filter_mask(limit, interior, p3, p2, p1, p0, q0, q1, q2, q3):
    return (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= limit
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _hev(thresh, p1, p0, q0, q1):
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _subblock_filter(hev_t, interior, edge, px):
    """Normal filter, interior edge (§15.3). px = 8 signed pixels
    [p3..q3]; returns new list."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    if not _filter_mask(edge, interior, p3, p2, p1, p0, q0, q1, q2, q3):
        return px
    hev = _hev(hev_t, p1, p0, q0, q1)
    f1, np0, nq0 = _common_adjust(hev, p1, p0, q0, q1)
    np1, nq1 = p1, q1
    if not hev:
        a = (f1 + 1) >> 1
        nq1 = _c(q1 - a)
        np1 = _c(p1 + a)
    return [p3, p2, np1, np0, nq0, nq1, q2, q3]


def _mbedge_filter(hev_t, interior, edge, px):
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    if not _filter_mask(edge, interior, p3, p2, p1, p0, q0, q1, q2, q3):
        return px
    if _hev(hev_t, p1, p0, q0, q1):
        _, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
        return [p3, p2, p1, np0, nq0, q1, q2, q3]
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    nq0 = _c(q0 - a)
    np0 = _c(p0 + a)
    a = _c((18 * w + 63) >> 7)
    nq1 = _c(q1 - a)
    np1 = _c(p1 + a)
    a = _c((9 * w + 63) >> 7)
    nq2 = _c(q2 - a)
    np2 = _c(p2 + a)
    return [p3, np2, np1, np0, nq0, nq1, nq2, q3]


def _simple_filter(edge_limit, px):
    """Simple filter (§15.1): operates on p1,p0,q0,q1 only."""
    p1, p0, q0, q1 = px
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge_limit:
        _, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
        return [p1, np0, nq0, q1]
    return px


def _filter_span_v(plane, x, y0, n, fn, taps):
    """Filter the vertical edge at column boundary x for rows
    y0..y0+n-1; taps=4 (simple) or 8 (normal)."""
    half = taps // 2
    for y in range(y0, y0 + n):
        px = [_s8(int(plane[y, x - half + i])) for i in range(taps)]
        out = fn(px)
        if out is not px:
            for i in range(taps):
                plane[y, x - half + i] = out[i] + 128


def _filter_span_h(plane, x0, y, n, fn, taps):
    half = taps // 2
    for x in range(x0, x0 + n):
        px = [_s8(int(plane[y - half + i, x])) for i in range(taps)]
        out = fn(px)
        if out is not px:
            for i in range(taps):
                plane[y - half + i, x] = out[i] + 128


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_vp8(data: bytes):
    """Decode a VP8 key frame. Returns (Y, U, V) uint8 numpy planes of
    shape (h, w), (ceil(h/2), ceil(w/2)) x2 — identical layout (and,
    per tests/test_vp8.py, identical bits) to libwebp's
    WebPDecodeYUV."""
    w, h, part0_size, rest = _parse_uncompressed(data)
    bd = BoolDecoder(rest[:part0_size])
    hdr = _parse_header(bd, rest, part0_size)

    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    quants = _segment_quants(hdr)

    # padded planes (multiples of 16 / 8)
    Y = np.zeros((mb_h * 16, mb_w * 16), np.int32)
    U = np.zeros((mb_h * 8, mb_w * 8), np.int32)
    V = np.zeros((mb_h * 8, mb_w * 8), np.int32)

    # ---- pass 1: modes for every MB (partition 0) -----------------------
    mbs = []
    # b-mode rows for 4x4 context (keyframe: contexts are bmodes)
    above_bmodes = [[B_DC] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_bmodes = [B_DC] * 4
        for mbx in range(mb_w):
            m = _Header()
            m.segment = 0
            if hdr.update_map:
                m.segment = bd.get_tree(MB_SEGMENT_TREE, hdr.seg_tree_probs)
            m.skip = bd.get_bit(hdr.prob_skip_false) if hdr.mb_no_skip else 0
            m.ymode = bd.get_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if m.ymode == B_PRED:
                sub = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above_bmodes[mbx][sx] if sy == 0 else sub[(sy - 1) * 4 + sx]
                        l = left_bmodes[sy] if sx == 0 else sub[sy * 4 + sx - 1]  # noqa: E741
                        probs = KF_BMODE_PROB[(a * 10 + l) * 9:(a * 10 + l) * 9 + 9]
                        sub[sy * 4 + sx] = bd.get_tree(BMODE_TREE, probs)
                m.bmodes = sub
            else:
                m.bmodes = [MODE_TO_BMODE[m.ymode]] * 16
            above_bmodes[mbx] = m.bmodes[12:16]
            left_bmodes = [m.bmodes[3], m.bmodes[7], m.bmodes[11], m.bmodes[15]]
            m.uvmode = bd.get_tree(UV_MODE_TREE, KF_UV_PROB)
            mbs.append(m)

    # ---- pass 2: residuals + reconstruction ------------------------------
    token_bds = [BoolDecoder(p) for p in hdr.partitions]
    # nonzero contexts: per-plane, per-subblock column/row
    above_nz_y = [[0] * 4 for _ in range(mb_w)]
    above_nz_u = [[0] * 2 for _ in range(mb_w)]
    above_nz_v = [[0] * 2 for _ in range(mb_w)]
    above_nz_y2 = [0] * mb_w
    has_coeff_per_mb = []
    for mby in range(mb_h):
        tbd = token_bds[mby % hdr.n_parts]
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        for mbx in range(mb_w):
            m = mbs[mby * mb_w + mbx]
            dq = quants[m.segment]
            has_y2 = m.ymode != B_PRED
            y_blocks = [[0] * 16 for _ in range(16)]
            u_blocks = [[0] * 16 for _ in range(4)]
            v_blocks = [[0] * 16 for _ in range(4)]
            mb_has_coeff = 0
            if m.skip:
                left_nz_y = [0] * 4
                left_nz_u = [0] * 2
                left_nz_v = [0] * 2
                above_nz_y[mbx] = [0] * 4
                above_nz_u[mbx] = [0] * 2
                above_nz_v[mbx] = [0] * 2
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                if has_y2:
                    ctx = above_nz_y2[mbx] + left_nz_y2
                    y2, nz, _ = _decode_coeffs(tbd, hdr.coeff_probs, 1, 0,
                                               ctx, dq["y2"])
                    above_nz_y2[mbx] = left_nz_y2 = nz
                    mb_has_coeff |= nz
                    y2_out = _iwht4x4(y2)
                else:
                    y2_out = None
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = above_nz_y[mbx][sx] + left_nz_y[sy]
                        co, nz, _ = _decode_coeffs(tbd, hdr.coeff_probs,
                                                   btype, first, ctx,
                                                   dq["y1"])
                        above_nz_y[mbx][sx] = left_nz_y[sy] = nz
                        mb_has_coeff |= nz
                        if y2_out is not None:
                            co[0] = y2_out[sy * 4 + sx]
                        y_blocks[sy * 4 + sx] = co
                for planes, anz, lnz, blocks in (
                        ("u", above_nz_u, left_nz_u, u_blocks),
                        ("v", above_nz_v, left_nz_v, v_blocks)):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = anz[mbx][sx] + lnz[sy]
                            co, nz, _ = _decode_coeffs(tbd, hdr.coeff_probs,
                                                       2, 0, ctx, dq["uv"])
                            anz[mbx][sx] = lnz[sy] = nz
                            mb_has_coeff |= nz
                            blocks[sy * 2 + sx] = co
            has_coeff_per_mb.append(mb_has_coeff)

            # ---- reconstruct this MB immediately (prediction uses
            # unfiltered neighbors; loop filter runs after, per spec) --
            x0, y0 = mbx * 16, mby * 16
            if m.ymode != B_PRED:
                _pred_block(Y, x0, y0, 16, m.ymode, mbx, mby, w)
                for sy in range(4):
                    for sx in range(4):
                        res = _idct4x4(y_blocks[sy * 4 + sx])
                        _add_residual(Y, x0 + sx * 4, y0 + sy * 4, res)
            else:
                # above-right pixels for the MB's rightmost subblocks:
                # always taken from the row above the MB (replicated
                # off the right edge / 127 off the top)
                if y0 > 0:
                    if x0 + 20 <= mb_w * 16:
                        mb_tr = [int(Y[y0 - 1, x0 + 16 + i]) for i in range(4)]
                    else:
                        mb_tr = [int(Y[y0 - 1, mb_w * 16 - 1])] * 4
                else:
                    mb_tr = [127] * 4
                for sy in range(4):
                    for sx in range(4):
                        bx, by = x0 + sx * 4, y0 + sy * 4
                        above = [int(Y[by - 1, bx + i]) for i in range(4)] \
                            if by > 0 else [127] * 4
                        left = [int(Y[by + i, bx - 1]) for i in range(4)] \
                            if bx > 0 else [129] * 4
                        if by > 0 and bx > 0:
                            tl = int(Y[by - 1, bx - 1])
                        elif by > 0:   # bx == 0: left border below row 0
                            tl = 129
                        else:          # by == 0: above border row
                            tl = 127
                        if sx < 3:
                            if by > 0:
                                ar = [int(Y[by - 1, bx + 4 + i])
                                      for i in range(4)]
                            else:
                                ar = [127] * 4
                        else:
                            ar = mb_tr
                        _pred_b(Y, bx, by, m.bmodes[sy * 4 + sx],
                                above, left, tl, ar)
                        res = _idct4x4(y_blocks[sy * 4 + sx])
                        _add_residual(Y, bx, by, res)
            cx0, cy0 = mbx * 8, mby * 8
            for plane, blocks in ((U, u_blocks), (V, v_blocks)):
                _pred_block(plane, cx0, cy0, 8, m.uvmode, mbx, mby, w)
                for sy in range(2):
                    for sx in range(2):
                        res = _idct4x4(blocks[sy * 2 + sx])
                        _add_residual(plane, cx0 + sx * 4, cy0 + sy * 4, res)

    # ---- pass 3: loop filter ---------------------------------------------
    if hdr.filter_level:
        _loop_filter(Y, U, V, hdr, mbs, has_coeff_per_mb, mb_w, mb_h)

    uv_w, uv_h = (w + 1) // 2, (h + 1) // 2
    return (Y[:h, :w].astype(np.uint8),
            U[:uv_h, :uv_w].astype(np.uint8),
            V[:uv_h, :uv_w].astype(np.uint8))


def _loop_filter(Y, U, V, hdr, mbs, has_coeff, mb_w, mb_h):
    for mby in range(mb_h):
        for mbx in range(mb_w):
            m = mbs[mby * mb_w + mbx]
            # per-MB filter level (§9.4, §10): segment value (absolute
            # or delta), clamped; then the intra ref-frame delta and
            # the B_PRED mode delta, clamped again
            if hdr.segmentation:
                level = hdr.seg_lf[m.segment] if hdr.seg_abs \
                    else hdr.filter_level + hdr.seg_lf[m.segment]
                level = _clamp(level, 0, 63)
            else:
                level = hdr.filter_level
            if hdr.lf_delta_enable:
                level += hdr.ref_lf_delta[0]  # keyframe: intra frame
                if m.ymode == B_PRED:
                    level += hdr.mode_lf_delta[0]
                level = _clamp(level, 0, 63)
            if level == 0:
                continue

            # limits (§15.2)
            interior = level
            sharp = hdr.sharpness
            if sharp:
                interior = level >> (2 if sharp > 4 else 1)
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            # keyframe high-edge-variance thresholds
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_edge = ((level + 2) * 2) + interior
            sub_edge = (level * 2) + interior

            # interior edges are skipped only when the MB has no
            # coefficients at all and is whole-block predicted
            filt_inner = has_coeff[mby * mb_w + mbx] or m.ymode == B_PRED

            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            if hdr.filter_simple:
                fn_mb = lambda px: _simple_filter(mb_edge, px)   # noqa: E731
                fn_sb = lambda px: _simple_filter(sub_edge, px)  # noqa: E731
                if mbx > 0:
                    _filter_span_v(Y, x0, y0, 16, fn_mb, 4)
                if filt_inner:
                    for i in (4, 8, 12):
                        _filter_span_v(Y, x0 + i, y0, 16, fn_sb, 4)
                if mby > 0:
                    _filter_span_h(Y, x0, y0, 16, fn_mb, 4)
                if filt_inner:
                    for i in (4, 8, 12):
                        _filter_span_h(Y, x0, y0 + i, 16, fn_sb, 4)
            else:
                fn_mb = lambda px: _mbedge_filter(hev_t, interior, mb_edge, px)    # noqa: E731
                fn_sb = lambda px: _subblock_filter(hev_t, interior, sub_edge, px)  # noqa: E731
                if mbx > 0:
                    _filter_span_v(Y, x0, y0, 16, fn_mb, 8)
                    _filter_span_v(U, cx0, cy0, 8, fn_mb, 8)
                    _filter_span_v(V, cx0, cy0, 8, fn_mb, 8)
                if filt_inner:
                    for i in (4, 8, 12):
                        _filter_span_v(Y, x0 + i, y0, 16, fn_sb, 8)
                    _filter_span_v(U, cx0 + 4, cy0, 8, fn_sb, 8)
                    _filter_span_v(V, cx0 + 4, cy0, 8, fn_sb, 8)
                if mby > 0:
                    _filter_span_h(Y, x0, y0, 16, fn_mb, 8)
                    _filter_span_h(U, cx0, cy0, 8, fn_mb, 8)
                    _filter_span_h(V, cx0, cy0, 8, fn_mb, 8)
                if filt_inner:
                    for i in (4, 8, 12):
                        _filter_span_h(Y, x0, y0 + i, 16, fn_sb, 8)
                    _filter_span_h(U, cx0, cy0 + 4, 8, fn_sb, 8)
                    _filter_span_h(V, cx0, cy0 + 4, 8, fn_sb, 8)


# ---------------------------------------------------------------------------
# YUV420 -> RGB (for decode_image; BT.601 limited range, integer)
# ---------------------------------------------------------------------------


def _fancy_upsample(C: np.ndarray, h: int, w: int) -> np.ndarray:
    """Half-pel bilinear 2x chroma upsample (9:3:3:1 weights, edge
    replication) — the standard filter for between-sited 4:2:0 chroma;
    vectorized."""
    P = np.pad(C.astype(np.int32), 1, mode="edge")
    c = P[1:-1, 1:-1]
    up, dn = P[0:-2, 1:-1], P[2:, 1:-1]
    lf, rt = P[1:-1, 0:-2], P[1:-1, 2:]
    ul, ur = P[0:-2, 0:-2], P[0:-2, 2:]
    dl, dr = P[2:, 0:-2], P[2:, 2:]
    ch, cw = C.shape
    out = np.empty((2 * ch, 2 * cw), np.int32)
    out[0::2, 0::2] = (9 * c + 3 * (lf + up) + ul + 8) >> 4
    out[0::2, 1::2] = (9 * c + 3 * (rt + up) + ur + 8) >> 4
    out[1::2, 0::2] = (9 * c + 3 * (lf + dn) + dl + 8) >> 4
    out[1::2, 1::2] = (9 * c + 3 * (rt + dn) + dr + 8) >> 4
    return out[:h, :w]


def yuv420_to_rgb(Y: np.ndarray, U: np.ndarray, V: np.ndarray) -> np.ndarray:
    """Half-pel bilinear chroma upsample + BT.601 limited-range integer
    conversion. Deterministic across environments (the portable
    conversion for the pure decode path; libwebp's own upsampler
    differs by at most a few LSBs — see tests)."""
    h, w = Y.shape
    y = Y.astype(np.int32)
    u = _fancy_upsample(U, h, w) - 128
    v = _fancy_upsample(V, h, w) - 128
    c = (y - 16) * 298
    r = (c + 409 * v + 128) >> 8
    g = (c - 100 * u - 208 * v + 128) >> 8
    b = (c + 516 * u + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
