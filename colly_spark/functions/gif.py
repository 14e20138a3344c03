"""From-scratch GIF (GIF87a / GIF89a) codec — pure Python/numpy.

The last common web image format the engine could not decode: after
png/jpeg/webp (from-scratch) and avif (native libavif), ``gif`` closes
the set a real crawl corpus carries. The reference engine treats image
payloads as opaque bytes (response.go:189-194 noTextualData); pixel
semantics come from BASELINE.json input_hint ("decoded-pixel allclose
+ caption equality"), so the codec exists to make the ``fmt`` column's
promise real — admission (image_corpus_filter) must never outrun
decode.

Built from the public GIF89a specification (CompuServe, 1990) and
ITU-T T.81-adjacent LZW literature; verified against the container's
giflib 5.x (functions/native_codecs.py binds it via ctypes) in BOTH
directions: our encoder's streams decode bit-exact under giflib, and
genuine giflib-produced streams decode bit-exact under this decoder
(tests/test_gif.py).

Coverage:

- LZW with GIF's variable code width (LSB-first packing, CLEAR/EOI,
  deferred-clear tolerant, 12-bit table cap with mid-stream reset).
- 87a and 89a streams: logical screen + global color table, local
  color tables, interlace (four-pass), Graphic Control Extension
  (delay, transparency, all four disposal methods), application /
  comment / plain-text extensions skipped by sub-block walk.
- Animation compositing: full-canvas RGB frame sequence with
  disposal 0/1 (leave), 2 (restore rect to background — rendered as
  deterministic black, the common browser treatment of a transparent
  background), 3 (restore previous canvas).
- Encoder: exact palette when the image has ≤256 distinct colors
  (lossless round trip — every 16×16 synthetic corpus image
  qualifies), else deterministic median-cut quantization to 256.
  Optional interlace; animated writer with per-frame delays, a
  NETSCAPE2.0 loop block, and a shared global palette when the union
  fits (local tables otherwise).

Scale shape: like every codec here, decode is called only inside
Arrow-batch kernels (operators/multimodal.py, operators/av.py);
``bytes`` stays an opaque binary column through every shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR87 = b"GIF87a"
_HDR89 = b"GIF89a"

# interlace passes: (first row, stride)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expect: int | None = None) -> bytes:
    """Decode a GIF LZW stream (sub-block payloads already joined) into
    palette indices. ``expect`` (pixel count) lets a stream missing its
    EOI terminate cleanly once all pixels are produced."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0  # LSB-first accumulator
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                if expect is not None and len(out) >= expect:
                    return bytes(out)
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)

        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # decoder widens when the NEXT slot needs more bits
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if expect is not None and len(out) >= expect and pos >= n and nbits < width:
            return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (no sub-block
    framing). Emits CLEAR up front and on table overflow, EOI last —
    the exact framing giflib's decoder and ours expect."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    if indices:
        cur = indices[0]
        for k in indices[1:]:
            key = (cur, k)
            got = table.get(key)
            if got is not None:
                cur = got
                continue
            emit(cur, width)
            if next_code < 4096:
                table[key] = next_code
                next_code += 1
                # encoder widens one code later than the decoder: the
                # decoder's table lags ours by one entry (it learns
                # (prev, first-of-next) only on the NEXT code)
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            else:
                emit(clear, width)
                table.clear()
                next_code = eoi + 1
                width = min_code_size + 1
            cur = k
        emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _to_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _deinterlace(indices: np.ndarray) -> np.ndarray:
    h = indices.shape[0]
    out = np.empty_like(indices)
    src = 0
    for first, stride in _INTERLACE:
        for row in range(first, h, stride):
            out[row] = indices[src]
            src += 1
    return out


def parse_gif(data: bytes) -> dict:
    """Parse a GIF stream into screen metadata + per-frame rasters.

    Returns ``{"w", "h", "bg", "gct", "version", "frames": [...]}``;
    each frame dict carries left/top/w/h, ``indices`` (h, w) uint8
    AFTER de-interlacing, ``palette`` (n, 3) uint8 (local table if
    present else global), ``delay_cs``, ``transparent`` (index or
    None), ``disposal``."""
    if data[:6] not in (_HDR87, _HDR89):
        raise ValueError("not a GIF stream")
    version = data[3:6].decode("ascii")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        ncols = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * ncols], dtype=np.uint8).reshape(
            ncols, 3
        ).copy()
        pos += 3 * ncols

    frames = []
    # pending Graphic Control Extension state (applies to next image)
    delay_cs, transparent, disposal = 0, None, 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while True:
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                subs.append(data[pos : pos + size])
                pos += size
            if label == 0xF9 and subs:  # Graphic Control Extension
                gpacked, delay_cs = struct.unpack("<BH", subs[0][:3])
                disposal = (gpacked >> 2) & 0x07
                transparent = subs[0][3] if gpacked & 0x01 else None
            # 0xFF application / 0xFE comment / 0x01 plain text: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        lct = None
        if fpacked & 0x80:
            ncols = 2 << (fpacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * ncols], dtype=np.uint8).reshape(
                ncols, 3
            ).copy()
            pos += 3 * ncols
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            size = data[pos]
            pos += 1
            if size == 0:
                break
            lzw += data[pos : pos + size]
            pos += size
        raw = lzw_decode(bytes(lzw), mcs, expect=fw * fh)
        if len(raw) < fw * fh:
            raise ValueError("GIF frame raster truncated")
        indices = np.frombuffer(raw[: fw * fh], dtype=np.uint8).reshape(fh, fw)
        if fpacked & 0x40:
            indices = _deinterlace(indices)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has neither local nor global palette")
        if int(indices.max(initial=0)) >= palette.shape[0]:
            raise ValueError("GIF index beyond palette")
        frames.append(
            dict(left=left, top=top, w=fw, h=fh, indices=indices,
                 palette=palette, delay_cs=delay_cs, transparent=transparent,
                 disposal=disposal)
        )
        delay_cs, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF stream has no image")
    return dict(w=w, h=h, bg=bg, gct=gct, version=version, frames=frames)


def decode_gif_frames(data: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode + composite every frame onto the logical screen.
    Returns [(canvas_rgb (H, W, 3) uint8, delay_cs), ...]. The initial
    canvas (and disposal-2 "background") renders as deterministic
    black — transparent background, the common browser treatment."""
    g = parse_gif(data)
    H, W = g["h"], g["w"]
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    out = []
    for fr in g["frames"]:
        before = canvas.copy() if fr["disposal"] == 3 else None
        t, l = fr["top"], fr["left"]
        region = canvas[t : t + fr["h"], l : l + fr["w"]]
        rgb = fr["palette"][fr["indices"]]
        if fr["transparent"] is not None:
            mask = fr["indices"] != fr["transparent"]
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        out.append((canvas.copy(), fr["delay_cs"]))
        if fr["disposal"] == 2:
            canvas[t : t + fr["h"], l : l + fr["w"]] = 0
        elif fr["disposal"] == 3:
            canvas = before
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a (possibly animated) GIF to its first composited frame
    — the static-image contract ``images.decode_image`` needs."""
    g = parse_gif(data)
    fr = g["frames"][0]
    canvas = np.zeros((g["h"], g["w"], 3), dtype=np.uint8)
    region = canvas[fr["top"] : fr["top"] + fr["h"],
                    fr["left"] : fr["left"] + fr["w"]]
    rgb = fr["palette"][fr["indices"]]
    if fr["transparent"] is not None:
        mask = fr["indices"] != fr["transparent"]
        region[mask] = rgb[mask]
    else:
        region[:] = rgb
    return canvas


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def exact_palette(pixels: np.ndarray):
    """(palette (n≤256, 3), indices (h, w) uint8) when the image has
    ≤256 distinct colors (lossless), else None. Palette order is the
    deterministic lexicographic order of (r, g, b)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        return None
    return colors.astype(np.uint8), inverse.astype(np.uint8).reshape(h, w)


def median_cut_palette(pixels: np.ndarray, n_colors: int = 256):
    """Deterministic median-cut quantization: split the box with the
    widest channel range (ties → lowest box index) at the weighted
    median of its longest axis (ties → lowest axis) until ``n_colors``
    boxes; palette entry = weighted mean, rounded half-up. Returns
    (palette, indices) like :func:`exact_palette`."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3).astype(np.int64)
    colors, counts = np.unique(flat, axis=0, return_counts=True)
    boxes = [(colors, counts)]
    while len(boxes) < n_colors:
        ranges = [
            int((c.max(axis=0) - c.min(axis=0)).max()) if c.shape[0] > 1 else -1
            for c, _n in boxes
        ]
        bi = int(np.argmax(ranges))
        if ranges[bi] <= 0:
            break
        c, n = boxes[bi]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.lexsort((c[:, 2], c[:, 1], c[:, 0], c[:, axis]))
        c, n = c[order], n[order]
        cum = np.cumsum(n)
        split = int(np.searchsorted(cum, cum[-1] / 2.0, side="right")) + 1
        split = min(max(split, 1), c.shape[0] - 1)
        boxes[bi] = (c[:split], n[:split])
        boxes.append((c[split:], n[split:]))
    pal = np.array(
        [np.floor((c * n[:, None]).sum(axis=0) / n.sum() + 0.5) for c, n in boxes],
        dtype=np.int64,
    ).clip(0, 255)
    # map every pixel to nearest palette entry (ties → lowest index)
    d = ((flat[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
    idx = d.argmin(axis=1).astype(np.uint8)
    return pal.astype(np.uint8), idx.reshape(h, w)


def _palette_block(palette: np.ndarray):
    """Pad a palette to a power-of-two size ≥2; returns (bytes, size
    field value n where padded = 2^(n+1), min LZW code size)."""
    ncols = palette.shape[0]
    n = 0
    while (2 << n) < ncols:
        n += 1
    padded = np.zeros((2 << n, 3), dtype=np.uint8)
    padded[:ncols] = palette
    mcs = max(2, n + 1)
    return padded.tobytes(), n, mcs


def _interlace_rows(indices: np.ndarray) -> np.ndarray:
    h = indices.shape[0]
    rows = [row for first, stride in _INTERLACE for row in range(first, h, stride)]
    return indices[rows]


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a single-frame GIF. Lossless
    (exact palette) when the image has ≤256 distinct colors, else
    deterministic median-cut to 256."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    got = exact_palette(pixels)
    palette, indices = got if got is not None else median_cut_palette(pixels)
    pal_bytes, n, mcs = _palette_block(palette)
    out = bytearray()
    out += _HDR89
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | n, 0, 0)
    out += pal_bytes
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    rows = _interlace_rows(indices) if interlace else indices
    out.append(mcs)
    out += _to_subblocks(lzw_encode(rows.tobytes(), mcs))
    out += b"\x3B"
    return bytes(out)


def encode_gif_animated(frames, delays_cs, loop: int = 0) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames as an animated GIF89a:
    per-frame Graphic Control (delay, disposal 1 = do-not-dispose,
    no transparency), NETSCAPE2.0 loop block, full-canvas frames.
    Uses ONE global palette when the union of frame colors fits in
    256 (lossless), else a per-frame exact/median-cut local table."""
    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    assert all(f.shape == frames[0].shape for f in frames)
    assert len(delays_cs) == len(frames)

    union = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    shared = union.shape[0] <= 256
    out = bytearray()
    out += _HDR89
    if shared:
        gpal = union.astype(np.uint8)
        pal_bytes, n, mcs = _palette_block(gpal)
        out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | n, 0, 0)
        out += pal_bytes
    else:
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for fpx, delay in zip(frames, delays_cs):
        out += b"\x21\xF9\x04" + bytes([(1 << 2)]) + struct.pack("<H", delay)
        out += b"\x00\x00"  # no transparent index; sub-block terminator
        if shared:
            # indices into the sorted union palette via row lookup
            flat = fpx.reshape(-1, 3)
            key = (flat[:, 0].astype(np.int64) << 16) | (
                flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
            pkey = (gpal[:, 0].astype(np.int64) << 16) | (
                gpal[:, 1].astype(np.int64) << 8) | gpal[:, 2].astype(np.int64)
            indices = np.searchsorted(pkey, key).astype(np.uint8).reshape(h, w)
            out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            _pal, _n, mcs_f = _palette_block(gpal)
            out.append(mcs_f)
            out += _to_subblocks(lzw_encode(indices.tobytes(), mcs_f))
        else:
            got = exact_palette(fpx)
            palette, indices = got if got is not None else median_cut_palette(fpx)
            pal_bytes, n, mcs_f = _palette_block(palette)
            out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | n)
            out += pal_bytes
            out.append(mcs_f)
            out += _to_subblocks(lzw_encode(indices.tobytes(), mcs_f))
    out += b"\x3B"
    return bytes(out)
