"""ctypes bindings to the container's native image codec libraries.

The deployment container ships the standard Debian codec stack —
``libwebp.so.7`` (1.2.4) and ``libavif.so.15`` (0.11.1, with libaom +
libdav1d backends) — but no Python imaging packages. These bindings
expose decode/encode through ctypes so the Arrow-batch image kernels
(operators/multimodal.py) can use the production-grade native paths,
and so the from-scratch codecs (functions/webp.py, functions/jpeg.py)
can be *verified against* an independent industry decoder rather than
only against committed fixtures.

Reference relevance: the reference engine treats image payloads as
opaque bytes (response.go:189-194 noTextualData); pixel semantics come
from BASELINE.json input_hint ("decoded-pixel allclose (PSNR>=40dB for
lossy) + caption equality"), whose fmt column spans the web image
formats. avif decode/encode is native-only (a from-scratch AV1 decoder
is out of honest reach); webp has BOTH paths (functions/webp.py is the
portable from-scratch one).

Robustness: every binding is lazy-loaded and SELF-VALIDATES on first
use with an encode->decode round trip; any failure (missing .so,
ABI drift in the version-pinned struct layouts below) permanently
disables that backend for the process instead of corrupting pixels.
The avif struct layouts are written for libavif 0.11.x exactly (the
dpkg-pinned container version); the round-trip gate is what makes
relying on them safe.

Scale shape: decode stays map-side inside Arrow batches (one ctypes
call per image, zero-copy numpy views over library-owned buffers,
freed immediately after the copy); bytes columns remain opaque through
every shuffle.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading

import numpy as np

# reentrant: the self-validation inside each loader calls back into the
# public encode/decode functions, which re-enter the loader
_lock = threading.RLock()


# ---------------------------------------------------------------------------
# libwebp (1.2.x) — flat C API, no structs needed
# ---------------------------------------------------------------------------

_webp = None  # (lib,) once validated; False if unavailable


def _load_webp():
    global _webp
    with _lock:
        if _webp is not None:
            return _webp
        try:
            name = ctypes.util.find_library("webp") or "libwebp.so.7"
            lib = ctypes.CDLL(name)
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeRGBA.argtypes = list(lib.WebPEncodeRGB.argtypes)
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeLosslessRGBA.argtypes = list(
                lib.WebPEncodeLosslessRGB.argtypes)
            _webp = (lib,)
            # self-validation: lossless round trip must be bit-exact
            rng = np.random.RandomState(7)
            px = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
            data = encode_webp_native(px, lossless=True)
            back = decode_webp_native(data)
            if not np.array_equal(back, px):
                raise RuntimeError("libwebp round-trip mismatch")
        except Exception:
            _webp = False
        return _webp


def webp_native_available() -> bool:
    return bool(_load_webp())


def decode_webp_native(data: bytes, keep_alpha: bool = False) -> np.ndarray:
    """Decode any WebP (lossy VP8 or lossless VP8L, with or without
    alpha) via the system libwebp. Returns (h, w, 3) or (h, w, 4)."""
    got = _load_webp()
    if not got:
        raise NotImplementedError("libwebp not available in this container")
    (lib,) = got
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    if keep_alpha:
        p = lib.WebPDecodeRGBA(buf, len(data), ctypes.byref(w), ctypes.byref(h))
        chans = 4
    else:
        p = lib.WebPDecodeRGB(buf, len(data), ctypes.byref(w), ctypes.byref(h))
        chans = 3
    if not p:
        raise ValueError("libwebp failed to decode payload")
    try:
        arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, chans)).copy()
    finally:
        lib.WebPFree(p)
    return arr


def decode_webp_yuv_native(data: bytes):
    """Decode to the raw YUV420 planes (the decoder's native output,
    before any RGB conversion). Returns (Y, U, V) uint8 arrays of
    shapes (h, w), (ceil(h/2), ceil(w/2)) x2. This is the bit-exact
    ground truth the from-scratch VP8 decoder is verified against."""
    got = _load_webp()
    if not got:
        raise NotImplementedError("libwebp not available in this container")
    (lib,) = got
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    py = lib.WebPDecodeYUV(buf, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(u), ctypes.byref(v),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    if not py:
        raise ValueError("libwebp failed to decode payload (YUV)")
    try:
        W, H = w.value, h.value
        uvw, uvh = (W + 1) // 2, (H + 1) // 2
        Y = np.ctypeslib.as_array(py, shape=(H, stride.value))[:, :W].copy()
        U = np.ctypeslib.as_array(u, shape=(uvh, uv_stride.value))[:, :uvw].copy()
        V = np.ctypeslib.as_array(v, shape=(uvh, uv_stride.value))[:, :uvw].copy()
    finally:
        lib.WebPFree(py)
    return Y, U, V


def encode_webp_native(pixels: np.ndarray, quality: float = 90.0,
                       lossless: bool = False) -> bytes:
    """Encode (h, w, 3|4) uint8 pixels as WebP via the system libwebp.
    lossless=True emits VP8L; otherwise lossy VP8 at the given quality."""
    got = _webp if _webp is not None else _load_webp()
    if not got:
        raise NotImplementedError("libwebp not available in this container")
    (lib,) = got
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (3, 4)
    raw = np.ascontiguousarray(pixels).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        fn = lib.WebPEncodeLosslessRGBA if c == 4 else lib.WebPEncodeLosslessRGB
        size = fn(raw, w, h, w * c, ctypes.byref(out))
    else:
        fn = lib.WebPEncodeRGBA if c == 4 else lib.WebPEncodeRGB
        size = fn(raw, w, h, w * c, ctypes.c_float(quality), ctypes.byref(out))
    if not size:
        raise ValueError("libwebp failed to encode")
    try:
        data = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return data


# ---------------------------------------------------------------------------
# libavif (0.11.x) — struct-based API; layouts pinned to the container
# version and gated by the round-trip self-validation above all use.
# ---------------------------------------------------------------------------

_AVIF_RESULT_OK = 0
_AVIF_PIXEL_FORMAT_YUV444 = 1
_AVIF_PIXEL_FORMAT_YUV420 = 3
_AVIF_RGB_FORMAT_RGBA = 1


class _AvifRGBImage(ctypes.Structure):
    """avifRGBImage, libavif 0.11.x layout (avif.h): width, height,
    depth, format, chromaUpsampling, chromaDownsampling, avoidLibYUV,
    ignoreAlpha, alphaPremultiplied, isFloat, pixels, rowBytes."""

    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("depth", ctypes.c_uint32),
        ("format", ctypes.c_int),
        ("chromaUpsampling", ctypes.c_int),
        ("chromaDownsampling", ctypes.c_int),
        ("avoidLibYUV", ctypes.c_int),
        ("ignoreAlpha", ctypes.c_int),
        ("alphaPremultiplied", ctypes.c_int),
        ("isFloat", ctypes.c_int),
        ("pixels", ctypes.POINTER(ctypes.c_uint8)),
        ("rowBytes", ctypes.c_uint32),
    ]


class _AvifEncoderHead(ctypes.Structure):
    """Leading (caller-settable) fields of avifEncoder, 0.11.x layout.
    The real struct is longer; we only ever touch these leading fields
    on a library-allocated instance, so trailing fields don't matter."""

    _fields_ = [
        ("codecChoice", ctypes.c_int),
        ("maxThreads", ctypes.c_int),
        ("speed", ctypes.c_int),
        ("keyframeInterval", ctypes.c_int),
        ("timescale", ctypes.c_uint64),
        ("repetitionCount", ctypes.c_int),
        ("extraLayerCount", ctypes.c_uint32),
        ("minQuantizer", ctypes.c_int),
        ("maxQuantizer", ctypes.c_int),
        ("minQuantizerAlpha", ctypes.c_int),
        ("maxQuantizerAlpha", ctypes.c_int),
    ]


class _AvifRWData(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t)]


_avif = None


def _load_avif():
    global _avif
    with _lock:
        if _avif is not None:
            return _avif
        try:
            name = ctypes.util.find_library("avif") or "libavif.so.15"
            lib = ctypes.CDLL(name)
            lib.avifDecoderCreate.restype = ctypes.c_void_p
            lib.avifImageCreateEmpty.restype = ctypes.c_void_p
            lib.avifImageCreate.restype = ctypes.c_void_p
            lib.avifEncoderCreate.restype = ctypes.c_void_p
            lib.avifDecoderReadMemory.restype = ctypes.c_int
            lib.avifImageYUVToRGB.restype = ctypes.c_int
            lib.avifImageRGBToYUV.restype = ctypes.c_int
            lib.avifImageAllocatePlanes.restype = ctypes.c_int
            lib.avifEncoderWrite.restype = ctypes.c_int
            _avif = (lib,)
            # self-validation: encode a gradient at high quality, decode
            # it back, require dims + PSNR >= 40 dB (the pipeline gate)
            g = np.linspace(0, 255, 24 * 16 * 3).reshape(24, 16, 3)
            px = g.astype(np.uint8)
            back = decode_avif_native(encode_avif_native(px, max_quantizer=4))
            if back.shape != px.shape:
                raise RuntimeError("libavif round-trip shape mismatch")
            mse = float(np.mean((back.astype(float) - px.astype(float)) ** 2))
            if mse > 255.0 ** 2 / 10 ** 4.0:  # PSNR < 40 dB
                raise RuntimeError("libavif round-trip quality gate failed")
        except Exception:
            _avif = False
        return _avif


def avif_native_available() -> bool:
    return bool(_load_avif())


def decode_avif_native(data: bytes, keep_alpha: bool = False) -> np.ndarray:
    """Decode an AVIF still image via libavif (dav1d/aom backends).
    Returns (h, w, 3) or (h, w, 4) uint8."""
    got = _avif if _avif is not None else _load_avif()
    if not got:
        raise NotImplementedError("libavif not available in this container")
    (lib,) = got
    dec = lib.avifDecoderCreate()
    img = lib.avifImageCreateEmpty()
    if not dec or not img:
        raise MemoryError("libavif allocation failed")
    try:
        buf = ctypes.create_string_buffer(bytes(data), len(data))
        res = lib.avifDecoderReadMemory(ctypes.c_void_p(dec),
                                        ctypes.c_void_p(img), buf, len(data))
        if res != _AVIF_RESULT_OK:
            raise ValueError(f"libavif decode failed (avifResult={res})")
        # width/height are the first two uint32 fields of avifImage in
        # every libavif release
        dims = ctypes.cast(img, ctypes.POINTER(ctypes.c_uint32))
        w, h = dims[0], dims[1]
        rgb = _AvifRGBImage()
        lib.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(img))
        if rgb.width != w or rgb.height != h or rgb.depth != 8:
            raise RuntimeError("avifRGBImage ABI sanity check failed")
        rgb.format = _AVIF_RGB_FORMAT_RGBA
        out = np.empty((h, w, 4), dtype=np.uint8)
        rgb.pixels = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rgb.rowBytes = w * 4
        res = lib.avifImageYUVToRGB(ctypes.c_void_p(img), ctypes.byref(rgb))
        if res != _AVIF_RESULT_OK:
            raise ValueError(f"libavif YUV->RGB failed (avifResult={res})")
    finally:
        lib.avifImageDestroy(ctypes.c_void_p(img))
        lib.avifDecoderDestroy(ctypes.c_void_p(dec))
    return out if keep_alpha else out[:, :, :3].copy()


def encode_avif_native(pixels: np.ndarray, max_quantizer: int = 10,
                       yuv420: bool = False, speed: int = 8) -> bytes:
    """Encode (h, w, 3|4) uint8 pixels as a still AVIF via libavif/aom.
    max_quantizer=0 is (near-)lossless; 10 with YUV444 keeps typical
    images above the 40 dB pipeline gate."""
    got = _avif if _avif is not None else _load_avif()
    if not got:
        raise NotImplementedError("libavif not available in this container")
    (lib,) = got
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (3, 4)
    fmt = _AVIF_PIXEL_FORMAT_YUV420 if yuv420 else _AVIF_PIXEL_FORMAT_YUV444
    img = lib.avifImageCreate(ctypes.c_uint32(w), ctypes.c_uint32(h),
                              ctypes.c_uint32(8), ctypes.c_int(fmt))
    enc = lib.avifEncoderCreate()
    if not img or not enc:
        raise MemoryError("libavif allocation failed")
    output = _AvifRWData()
    try:
        rgb = _AvifRGBImage()
        lib.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(img))
        if rgb.width != w or rgb.height != h or rgb.depth != 8:
            raise RuntimeError("avifRGBImage ABI sanity check failed")
        rgba = np.ascontiguousarray(pixels)
        if c == 3:
            rgba = np.concatenate(
                [rgba, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2)
        rgb.format = _AVIF_RGB_FORMAT_RGBA
        rgb.pixels = rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rgb.rowBytes = w * 4
        res = lib.avifImageRGBToYUV(ctypes.c_void_p(img), ctypes.byref(rgb))
        if res != _AVIF_RESULT_OK:
            raise ValueError(f"libavif RGB->YUV failed (avifResult={res})")
        head = ctypes.cast(enc, ctypes.POINTER(_AvifEncoderHead)).contents
        head.maxThreads = 1
        head.speed = speed
        head.minQuantizer = 0
        head.maxQuantizer = int(max_quantizer)
        head.minQuantizerAlpha = 0
        head.maxQuantizerAlpha = int(max_quantizer)
        res = lib.avifEncoderWrite(ctypes.c_void_p(enc), ctypes.c_void_p(img),
                                   ctypes.byref(output))
        if res != _AVIF_RESULT_OK:
            raise ValueError(f"libavif encode failed (avifResult={res})")
        data = ctypes.string_at(output.data, output.size)
    finally:
        lib.avifRWDataFree(ctypes.byref(output))
        lib.avifImageDestroy(ctypes.c_void_p(img))
        lib.avifEncoderDestroy(ctypes.c_void_p(enc))
    return data


# ---------------------------------------------------------------------------
# giflib (5.x) — struct-based API; layouts pinned and round-trip gated
# ---------------------------------------------------------------------------
#
# Purpose: an independent industry GIF codec to cross-verify the
# from-scratch codec (functions/gif.py) in BOTH directions — our
# encoder's streams must decode bit-exact under giflib, and genuine
# giflib-produced streams must decode bit-exact under our decoder
# (tests/test_gif.py). giflib returns errors instead of exiting, so
# it is safe in-process; the file-name API means a tempfile per call
# (tests/fixtures only — the crawl decode path stays from-scratch).


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _GifColorMap(ctypes.Structure):
    """ColorMapObject, giflib 5.x (gif_lib.h)."""

    _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(_GifColorType))]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_GifColorMap))]


class _GifExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class _GifSavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_GifExtensionBlock))]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_GifColorMap)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_GifSavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_GifExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


_gif = None


def _load_gif():
    global _gif
    with _lock:
        if _gif is not None:
            return _gif
        try:
            name = ctypes.util.find_library("gif") or "libgif.so.7"
            lib = ctypes.CDLL(name)
            lib.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
            lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                             ctypes.POINTER(ctypes.c_int)]
            lib.DGifSlurp.restype = ctypes.c_int
            lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
            lib.DGifCloseFile.restype = ctypes.c_int
            lib.DGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                          ctypes.POINTER(ctypes.c_int)]
            lib.EGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
            lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_bool,
                                             ctypes.POINTER(ctypes.c_int)]
            lib.GifMakeMapObject.restype = ctypes.POINTER(_GifColorMap)
            lib.GifMakeMapObject.argtypes = [ctypes.c_int,
                                             ctypes.POINTER(_GifColorType)]
            lib.GifFreeMapObject.argtypes = [ctypes.POINTER(_GifColorMap)]
            lib.EGifPutScreenDesc.restype = ctypes.c_int
            lib.EGifPutScreenDesc.argtypes = [
                ctypes.POINTER(_GifFileType), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(_GifColorMap)]
            lib.EGifPutImageDesc.restype = ctypes.c_int
            lib.EGifPutImageDesc.argtypes = [
                ctypes.POINTER(_GifFileType), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_bool,
                ctypes.POINTER(_GifColorMap)]
            lib.EGifPutLine.restype = ctypes.c_int
            lib.EGifPutLine.argtypes = [ctypes.POINTER(_GifFileType),
                                        ctypes.POINTER(ctypes.c_ubyte),
                                        ctypes.c_int]
            lib.EGifCloseFile.restype = ctypes.c_int
            lib.EGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                          ctypes.POINTER(ctypes.c_int)]
            _gif = (lib,)
            # self-validation: encode->decode round trip must be
            # bit-exact on indices AND palette (plus ABI sanity checks
            # inside the calls themselves)
            rng = np.random.RandomState(11)
            pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
            idx = rng.randint(0, 8, size=(9, 7)).astype(np.uint8)
            frames = decode_gif_native(encode_gif_native(idx, pal))
            (_desc, got_idx, got_pal) = frames[0]
            if not (np.array_equal(got_idx, idx)
                    and np.array_equal(got_pal[:8], pal)):
                raise RuntimeError("giflib round-trip mismatch")
        except Exception:
            _gif = False
        return _gif


def gif_native_available() -> bool:
    return bool(_load_gif())


def decode_gif_native(data: bytes):
    """Decode a GIF via giflib's DGifSlurp. Returns a list of frames
    ``(desc, indices, palette)`` with desc = dict(left, top,
    interlace, screen_w, screen_h), indices (h, w) uint8 raster in
    FILE ORDER (giflib does not de-interlace), palette (n, 3) uint8
    (the frame's local table if present, else the global one)."""
    got = _load_gif()
    if not got:
        raise NotImplementedError("giflib not available in this container")
    (lib,) = got
    import os
    import tempfile

    err = ctypes.c_int(0)
    with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as tf:
        tf.write(bytes(data))
        path = tf.name
    try:
        f = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not f:
            raise ValueError(f"giflib open failed (error {err.value})")
        try:
            if lib.DGifSlurp(f) != 1:  # GIF_OK
                raise ValueError(f"giflib slurp failed "
                                 f"(error {f.contents.Error})")
            g = f.contents
            out = []
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                cmap = d.ColorMap if d.ColorMap else g.SColorMap
                if not cmap:
                    raise ValueError("giflib frame has no palette")
                cm = cmap.contents
                pal = np.ctypeslib.as_array(
                    ctypes.cast(cm.Colors, ctypes.POINTER(ctypes.c_ubyte)),
                    shape=(cm.ColorCount, 3)).copy()
                raster = np.ctypeslib.as_array(
                    si.RasterBits, shape=(d.Height, d.Width)).copy()
                out.append((dict(left=d.Left, top=d.Top,
                                 interlace=bool(d.Interlace),
                                 screen_w=g.SWidth, screen_h=g.SHeight),
                            raster, pal))
            return out
        finally:
            lib.DGifCloseFile(f, ctypes.byref(err))
    finally:
        os.unlink(path)


def encode_gif_native(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index raster + (n, 3) palette as a GIF
    via giflib's EGif writer — the genuine-stream source the
    from-scratch decoder is verified against."""
    got = _gif if _gif is not None else _load_gif()
    if not got:
        raise NotImplementedError("giflib not available in this container")
    (lib,) = got
    import os
    import tempfile

    h, w = indices.shape
    ncols = palette.shape[0]
    size = 2
    while size < ncols:
        size *= 2
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:ncols] = palette
    carr = (_GifColorType * size)()
    for i in range(size):
        carr[i] = _GifColorType(int(pal[i, 0]), int(pal[i, 1]), int(pal[i, 2]))
    cmap = lib.GifMakeMapObject(size, carr)
    if not cmap:
        raise MemoryError("GifMakeMapObject failed")
    err = ctypes.c_int(0)
    fd, path = tempfile.mkstemp(suffix=".gif")
    os.close(fd)
    try:
        f = lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
        if not f:
            lib.GifFreeMapObject(cmap)
            raise ValueError(f"giflib EGif open failed (error {err.value})")
        ok = True
        ok &= lib.EGifPutScreenDesc(f, w, h, 8, 0, cmap) == 1
        ok &= lib.EGifPutImageDesc(f, 0, 0, w, h, False, None) == 1
        rows = np.ascontiguousarray(indices, dtype=np.uint8)
        for y in range(h):
            line = rows[y].ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            ok &= lib.EGifPutLine(f, line, w) == 1
        closed = lib.EGifCloseFile(f, ctypes.byref(err)) == 1
        lib.GifFreeMapObject(cmap)
        if not (ok and closed):
            raise ValueError("giflib encode failed")
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# libjpeg (62 ABI / libjpeg-turbo) — classic API over version-pinned offsets
# ---------------------------------------------------------------------------
#
# Purpose: an independent industry JPEG codec to (a) PRODUCE progressive
# (SOF2) and restart-interval streams the from-scratch encoder never
# emits and (b) cross-check functions/jpeg.py pixel output
# (tests/test_jpeg_progressive.py).  TRUSTED-INPUT ONLY: the classic
# libjpeg error path calls exit() on malformed input, so this binding
# must never sit on the crawl decode path (decode_image keeps routing
# jpeg to the exception-safe from-scratch decoder); feed it only bytes
# produced by our own encoder or by libjpeg itself.
#
# ABI safety: struct sizes + field offsets below are pinned for the
# container's libjpeg62-turbo (jpeglib.h v6b layout on x86-64).  First
# use runs a full encode->decode round trip in a SUBPROCESS — if the
# ABI drifted, jpeg_CreateCompress's struct-size guard kills only that
# probe process and the backend is disabled here.

_JPEG_SIZEOF_COMPRESS = 520
_JPEG_SIZEOF_DECOMPRESS = 632
# jpeg_compress_struct (after the 40-byte jpeg_common_fields + dest ptr)
_JC_IMAGE_WIDTH = 48       # JDIMENSION (u32)
_JC_IMAGE_HEIGHT = 52
_JC_INPUT_COMPONENTS = 56  # int
_JC_IN_COLOR_SPACE = 60    # J_COLOR_SPACE (int): 1=GRAYSCALE 2=RGB
_JC_DATA_PRECISION = 72    # int, ==8 after jpeg_set_defaults (sanity)
_JC_RESTART_INTERVAL = 280  # unsigned int
# jpeg_decompress_struct output fields
_JD_OUTPUT_WIDTH = 136     # JDIMENSION
_JD_OUTPUT_HEIGHT = 140
_JD_OUTPUT_COMPONENTS = 148  # int

_jpeg = None  # (lib, libc) once the subprocess gate passes; False if not


def _jpeg_struct_set(buf, off, ctype, val):
    ctypes.memmove(ctypes.byref(buf, off), ctypes.byref(ctype(val)),
                   ctypes.sizeof(ctype))


def _jpeg_struct_get(buf, off, ctype):
    v = ctype()
    ctypes.memmove(ctypes.byref(v), ctypes.byref(buf, off),
                   ctypes.sizeof(ctype))
    return v.value


def _jpeg_bind():
    lib = ctypes.CDLL("libjpeg.so.62")
    libc = ctypes.CDLL("libc.so.6")
    lib.jpeg_std_error.restype = ctypes.c_void_p
    sigs = {
        "jpeg_CreateCompress": [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t],
        "jpeg_CreateDecompress": [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t],
        "jpeg_mem_dest": [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p],
        "jpeg_mem_src": [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_ulong],
        "jpeg_set_defaults": [ctypes.c_void_p],
        "jpeg_set_quality": [ctypes.c_void_p, ctypes.c_int, ctypes.c_int],
        "jpeg_simple_progression": [ctypes.c_void_p],
        "jpeg_start_compress": [ctypes.c_void_p, ctypes.c_int],
        "jpeg_write_scanlines": [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint],
        "jpeg_finish_compress": [ctypes.c_void_p],
        "jpeg_destroy_compress": [ctypes.c_void_p],
        "jpeg_read_header": [ctypes.c_void_p, ctypes.c_int],
        "jpeg_start_decompress": [ctypes.c_void_p],
        "jpeg_read_scanlines": [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint],
        "jpeg_finish_decompress": [ctypes.c_void_p],
        "jpeg_destroy_decompress": [ctypes.c_void_p],
    }
    for name, argtypes in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
    lib.jpeg_write_scanlines.restype = ctypes.c_uint
    lib.jpeg_read_scanlines.restype = ctypes.c_uint
    return lib, libc


def _jpeg_roundtrip_probe():
    """Run in a throwaway subprocess by _load_jpeg: full encode (baseline
    + progressive) -> decode round trip with the pinned ABI constants.
    Any drift segfaults/exits HERE, not in the caller."""
    global _jpeg
    _jpeg = _jpeg_bind()  # bypass the gate inside this probe process
    yy, xx = np.mgrid[0:11, 0:13]
    px = np.stack([(yy * 19) % 256, (xx * 23) % 256, ((xx + yy) * 7) % 256],
                  axis=-1).astype(np.uint8)
    base = encode_jpeg_native(px, quality=90)
    prog = encode_jpeg_native(px, quality=90, progressive=True,
                              restart_interval=2)
    assert b"\xff\xc0" in base and b"\xff\xc2" in prog
    db = decode_jpeg_native(base)
    dp = decode_jpeg_native(prog)
    assert db.shape == (11, 13, 3) and np.array_equal(db, dp)


def _load_jpeg():
    global _jpeg
    with _lock:
        if _jpeg is not None:
            return _jpeg
        import subprocess
        import sys
        import os
        try:
            pkg_parent = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            r = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r); "
                 "from colly_spark.functions.native_codecs import "
                 "_jpeg_roundtrip_probe; _jpeg_roundtrip_probe()" % pkg_parent],
                capture_output=True, timeout=60)
            if r.returncode != 0:
                _jpeg = False
                return _jpeg
            _jpeg = _jpeg_bind()
        except Exception:
            _jpeg = False
        return _jpeg


def jpeg_native_available() -> bool:
    return bool(_load_jpeg())


def _jpeg_error_mgr(lib):
    err = ctypes.create_string_buffer(2048)  # > sizeof(jpeg_error_mgr)
    return err, lib.jpeg_std_error(err)


def encode_jpeg_native(pixels: np.ndarray, quality: int = 90,
                       progressive: bool = False,
                       restart_interval: int = 0) -> bytes:
    """Encode uint8 RGB (h,w,3) or grayscale (h,w) via libjpeg.
    ``progressive=True`` uses jpeg_simple_progression's 10-scan script
    (spectral selection + successive approximation, the scan shapes
    real web JPEGs use)."""
    loaded = _load_jpeg()
    if not loaded:
        raise RuntimeError("libjpeg backend unavailable")
    lib, libc = loaded
    h, w = pixels.shape[:2]
    ncomp = 1 if pixels.ndim == 2 else pixels.shape[2]
    assert pixels.dtype == np.uint8 and ncomp in (1, 3)
    err, e = _jpeg_error_mgr(lib)
    cinfo = ctypes.create_string_buffer(_JPEG_SIZEOF_COMPRESS)
    _jpeg_struct_set(cinfo, 0, ctypes.c_void_p, e)
    lib.jpeg_CreateCompress(cinfo, 62, _JPEG_SIZEOF_COMPRESS)
    outbuf = ctypes.c_void_p(None)
    outsize = ctypes.c_ulong(0)
    try:
        lib.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))
        _jpeg_struct_set(cinfo, _JC_IMAGE_WIDTH, ctypes.c_uint, w)
        _jpeg_struct_set(cinfo, _JC_IMAGE_HEIGHT, ctypes.c_uint, h)
        _jpeg_struct_set(cinfo, _JC_INPUT_COMPONENTS, ctypes.c_int, ncomp)
        _jpeg_struct_set(cinfo, _JC_IN_COLOR_SPACE, ctypes.c_int,
                         2 if ncomp == 3 else 1)
        lib.jpeg_set_defaults(cinfo)
        if _jpeg_struct_get(cinfo, _JC_DATA_PRECISION, ctypes.c_int) != 8:
            raise RuntimeError("libjpeg ABI sanity check failed "
                               "(data_precision offset)")
        lib.jpeg_set_quality(cinfo, int(quality), 1)
        if progressive:
            lib.jpeg_simple_progression(cinfo)
        if restart_interval:
            _jpeg_struct_set(cinfo, _JC_RESTART_INTERVAL, ctypes.c_uint,
                             int(restart_interval))
        lib.jpeg_start_compress(cinfo, 1)
        rows = np.ascontiguousarray(pixels.reshape(h, -1))
        rowptr = (ctypes.c_void_p * 1)()
        for y in range(h):
            rowptr[0] = rows.ctypes.data + y * rows.strides[0]
            if lib.jpeg_write_scanlines(cinfo, rowptr, 1) != 1:
                raise RuntimeError("jpeg_write_scanlines stalled")
        lib.jpeg_finish_compress(cinfo)
        data = ctypes.string_at(outbuf, outsize.value)
    finally:
        lib.jpeg_destroy_compress(cinfo)
        if outbuf.value:
            libc.free(outbuf)
    return data


def decode_jpeg_native(data: bytes) -> np.ndarray:
    """Decode a TRUSTED JPEG via libjpeg -> uint8 (h,w,3) or (h,w)."""
    loaded = _load_jpeg()
    if not loaded:
        raise RuntimeError("libjpeg backend unavailable")
    lib, _libc = loaded
    err, e = _jpeg_error_mgr(lib)
    cinfo = ctypes.create_string_buffer(_JPEG_SIZEOF_DECOMPRESS)
    _jpeg_struct_set(cinfo, 0, ctypes.c_void_p, e)
    lib.jpeg_CreateDecompress(cinfo, 62, _JPEG_SIZEOF_DECOMPRESS)
    try:
        lib.jpeg_mem_src(cinfo, data, len(data))
        lib.jpeg_read_header(cinfo, 1)
        lib.jpeg_start_decompress(cinfo)
        w = _jpeg_struct_get(cinfo, _JD_OUTPUT_WIDTH, ctypes.c_uint)
        h = _jpeg_struct_get(cinfo, _JD_OUTPUT_HEIGHT, ctypes.c_uint)
        nc = _jpeg_struct_get(cinfo, _JD_OUTPUT_COMPONENTS, ctypes.c_int)
        if not (0 < w < 1 << 24 and 0 < h < 1 << 24 and nc in (1, 3)):
            raise RuntimeError("libjpeg ABI sanity check failed "
                               "(output field offsets)")
        out = np.zeros((h, w * nc), dtype=np.uint8)
        rowptr = (ctypes.c_void_p * 1)()
        for y in range(h):
            rowptr[0] = out.ctypes.data + y * out.strides[0]
            if lib.jpeg_read_scanlines(cinfo, rowptr, 1) != 1:
                raise RuntimeError("jpeg_read_scanlines stalled")
        lib.jpeg_finish_decompress(cinfo)
    finally:
        lib.jpeg_destroy_decompress(cinfo)
    return out.reshape(h, w, nc) if nc == 3 else out.reshape(h, w)
