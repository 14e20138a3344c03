"""From-scratch AVIF (HEIF/ISO BMFF image item) box layer: a minimal
structurally-valid WRITER and a metadata PROBE — the decode-free
admission shape for avif rows, whose AV1 bitstream is outside honest
from-scratch decode reach (decode stays gated on the system libavif,
functions/native_codecs.py).

An image lake gates avif rows on container metadata long before any
OBU is parsed: dimensions, bit depth, alpha, rotation, item count all
live in the ``meta`` box tree (ISO 14496-12 MetaBox + 23008-12 item
properties), so the probe is a pure box walk — no bitstream touched,
O(header) bytes per file (an object store serves it with one range GET
that stops at ``mdat``).

Boxes handled: ``ftyp`` (brand avif/avis), ``meta`` (a FullBox,
unlike the plain containers of the mp4 track tree — the 4
version/flags bytes are consumed before descending), ``hdlr``
(pict), ``pitm`` (v0 u16 / v1 u32 primary item id), ``iinf``/``infe``
(item count + per-item fourcc), ``iprp``→``ipco`` (ordered property
list: ``ispe`` width/height, ``pixi`` bit depth, ``av1C`` seq
profile/high-bitdepth, ``irot`` rotation, ``imir`` mirror, ``auxC``
alpha urn), and ``ipma`` (item→property associations, both the 7- and
15-bit index encodings). The primary item's ispe is resolved through
pitm + ipma — not "first ispe wins" — so a thumbnail or alpha item
listed first cannot shadow the real dimensions; when ipma is absent
the first ispe is the documented fallback. Unknown boxes are skipped
by size, 64-bit largesize included (shared walk discipline with
functions/mp4.py).

Reference seam: the reference crawls and stores image bytes opaquely
(colly's OnResponse delivers r.Body unparsed); format-aware
admission is this repo's LLM-pipeline extension, same tier as
functions/mp4.py. Spec sources are public: ISO 14496-12, ISO/IEC
23008-12, and the AV1-ISOBMFF mapping (aomediacodec.github.io).
"""

from __future__ import annotations

import struct

_ALPHA_URN = b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"

# MetaBox and its FullBox children consume 4 version/flags bytes before
# any payload; iprp/ipco are plain containers (23008-12 §9.3).
_FULL_CONTAINERS = {b"meta"}
_PLAIN_CONTAINERS = {b"iprp"}


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, payload: bytes, flags: int = 0) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


def encode_avif_stub(w: int, h: int, depth: int = 8, alpha: bool = False,
                     rotation: int = 0, mirror: int | None = None,
                     seq_profile: int = 0, brand: str = "avif",
                     pitm_version: int = 0, wide_ipma: bool = False,
                     decoy_ispe: bool = False,
                     mdat: bytes = b"") -> bytes:
    """Minimal structurally-valid AVIF: ftyp + meta(hdlr, pitm, iinf,
    iloc, iprp(ipco + ipma)) + mdat. The primary item is an ``av01``
    color item with [ispe, pixi, av1C, irot?, imir?] properties; when
    ``alpha`` a second ``av01`` item carries its own ispe + an auxC
    alpha property (the standard layout libavif emits). Carries no
    decodable AV1 payload — honest about being a probe/admission
    fixture, exactly like encode_mp4_stub.

    ``pitm_version``/``wide_ipma`` exercise the v1-u32-pitm and
    15-bit-property-index encodings; ``decoy_ispe`` prepends a
    wrong-dimensioned ispe to ipco so a first-ispe-wins prober is
    provably wrong (the per-item ipma resolution is what's pinned).
    """
    props: list[bytes] = []
    if decoy_ispe:
        props.append(_full(b"ispe", 0, struct.pack(">II", 1, 1)))
    base = len(props)
    props.append(_full(b"ispe", 0, struct.pack(">II", w, h)))
    props.append(_box(b"pixi", struct.pack(">IB", 0, 3)
                      + bytes([depth, depth, depth])))
    hb = 1 if depth > 8 else 0
    props.append(_box(b"av1C", bytes([0x81, (seq_profile << 5) | 0x1F,
                                      (hb << 6) | 0x10, 0x00])))
    color_props = [base + 1, base + 2, base + 3]  # 1-based into ipco
    if rotation:
        props.append(_full(b"irot", 0, bytes([(rotation // 90) & 3])))
        color_props.append(len(props))
    if mirror is not None:
        props.append(_full(b"imir", 0, bytes([mirror & 1])))
        color_props.append(len(props))

    items = [(1, b"av01", color_props)]
    if alpha:
        props.append(_full(b"ispe", 0, struct.pack(">II", w, h)))
        a_ispe = len(props)
        props.append(_full(b"auxC", 0, _ALPHA_URN + b"\x00"))
        items.append((2, b"av01", [a_ispe, len(props)]))

    ipco = _box(b"ipco", b"".join(props))
    flags = 1 if wide_ipma else 0
    ipma_body = struct.pack(">I", len(items))
    for item_id, _t, prop_idx in items:
        ipma_body += struct.pack(">H", item_id) + bytes([len(prop_idx)])
        for p in prop_idx:
            if wide_ipma:
                ipma_body += struct.pack(">H", 0x8000 | p)  # essential bit
            else:
                ipma_body += bytes([0x80 | p])
    ipma = _full(b"ipma", 0, ipma_body, flags=flags)

    infes = b"".join(
        _full(b"infe", 2, struct.pack(">HH", iid, 0) + t + b"\x00"
              + (b"Alpha\x00" if i else b"Color\x00"))
        for i, (iid, t, _p) in enumerate(items))
    iinf = _full(b"iinf", 0, struct.pack(">H", len(items)) + infes)
    if pitm_version:
        pitm = _full(b"pitm", 1, struct.pack(">I", 1))
    else:
        pitm = _full(b"pitm", 0, struct.pack(">H", 1))
    hdlr = _full(b"hdlr", 0, struct.pack(">I4s12x", 0, b"pict")
                 + b"avif-stub\x00")
    # iloc v0, 4/4/0/0 sizes, extents point into mdat (never read by
    # the probe, present for structural completeness)
    iloc_body = struct.pack(">HH", 0x4400, len(items))
    for iid, _t, _p in items:
        iloc_body += struct.pack(">HHHII", iid, 0, 1, 0, len(mdat))
    iloc = _full(b"iloc", 0, iloc_body)
    meta = _full(b"meta", 0, hdlr + pitm + iloc + iinf
                 + _box(b"iprp", ipco + ipma))
    compat = brand.encode() + b"mif1" + (b"msf1" if brand == "avis"
                                         else b"miaf")
    ftyp = _box(b"ftyp", brand.encode() + struct.pack(">I", 0) + compat)
    return ftyp + meta + _box(b"mdat", mdat)


def probe_avif(data: bytes) -> dict:
    """Box-walk → dict(brand, w, h, depth, n_items, alpha, rotation,
    mirror, seq_profile, animated, codec). Raises ValueError when the
    stream is not an ISO BMFF image container (no ftyp with an
    avif/avis/mif1 brand, or no meta/ispe). Never touches mdat."""
    info = dict(brand=None, w=None, h=None, depth=None, n_items=0,
                alpha=False, rotation=0, mirror=None, seq_profile=None,
                animated=False, codec=None)
    state: dict = {"ipco": [], "ipma": {}, "pitm": None,
                   "item_types": {}, "in_ipco": False}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            size, = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    break
                size, = struct.unpack(">Q", data[pos + 8:pos + 16])
                body = pos + 16
            elif size == 0:
                size = end - pos
            stop = min(pos + size, end)
            if size < 8 or stop <= pos:
                break
            if state["in_ipco"]:
                state["ipco"].append((tag, data[body:stop]))
            elif tag == b"ftyp":
                info["brand"] = data[body:body + 4].decode("ascii",
                                                           "replace")
            elif tag == b"moov":
                info["animated"] = True
            elif tag in _FULL_CONTAINERS:
                walk(body + 4, stop)
            elif tag in _PLAIN_CONTAINERS:
                walk(body, stop)
            elif tag == b"ipco":
                state["in_ipco"] = True
                walk(body, stop)
                state["in_ipco"] = False
            elif tag == b"pitm":
                v = data[body]
                if v >= 1:
                    state["pitm"], = struct.unpack(
                        ">I", data[body + 4:body + 8])
                else:
                    state["pitm"], = struct.unpack(
                        ">H", data[body + 4:body + 6])
            elif tag == b"iinf":
                v = data[body]
                if v == 0:
                    n, = struct.unpack(">H", data[body + 4:body + 6])
                    p = body + 6
                else:
                    n, = struct.unpack(">I", data[body + 4:body + 8])
                    p = body + 8
                info["n_items"] = n
                walk(p, stop)
            elif tag == b"infe":
                v = data[body]
                if v >= 2:
                    width = 2 if v == 2 else 4
                    iid = int.from_bytes(data[body + 4:body + 4 + width],
                                         "big")
                    t = data[body + 6 + width:body + 10 + width]
                    state["item_types"][iid] = t
            elif tag == b"ipma":
                _parse_ipma(data, body, stop, state)
            pos = stop

    walk(0, len(data))

    if info["brand"] not in ("avif", "avis", "mif1", "heic", "heix"):
        raise ValueError(f"not an ISO BMFF image brand: {info['brand']!r}")
    if info["brand"] == "avis":
        info["animated"] = True

    ipco = state["ipco"]
    primary_props = _props_for(state, state["pitm"])
    ispe = _pick(ipco, primary_props, b"ispe")
    if ispe is None:  # no ipma / unresolvable: first ispe is the fallback
        ispe = next((p for t, p in ipco if t == b"ispe"), None)
    if ispe is None or len(ispe) < 12:
        raise ValueError("no ispe (image spatial extents) property")
    info["w"], info["h"] = struct.unpack(">II", ispe[4:12])

    pixi = _pick(ipco, primary_props, b"pixi", fallback_first=True)
    if pixi is not None and len(pixi) >= 6:
        nch = pixi[4]
        if len(pixi) >= 5 + nch and nch:
            info["depth"] = pixi[5]
    av1c = _pick(ipco, primary_props, b"av1C", fallback_first=True)
    if av1c is not None and len(av1c) >= 2:
        info["seq_profile"] = (av1c[1] >> 5) & 7
        info["codec"] = "av01"
    elif any(t == b"av01" for t in state["item_types"].values()):
        info["codec"] = "av01"
    irot = _pick(ipco, primary_props, b"irot", fallback_first=True)
    if irot is not None and len(irot) >= 5:
        info["rotation"] = (irot[4] & 3) * 90
    imir = _pick(ipco, primary_props, b"imir", fallback_first=True)
    if imir is not None and len(imir) >= 5:
        info["mirror"] = imir[4] & 1
    info["alpha"] = any(
        t == b"auxC" and p[4:].startswith(_ALPHA_URN) for t, p in ipco)
    return info


def _parse_ipma(data: bytes, body: int, stop: int, state: dict) -> None:
    version = data[body]
    flags = int.from_bytes(data[body + 1:body + 4], "big")
    wide = bool(flags & 1)
    n, = struct.unpack(">I", data[body + 4:body + 8])
    p = body + 8
    for _ in range(n):
        if version < 1:
            if p + 3 > stop:
                return
            iid, = struct.unpack(">H", data[p:p + 2])
            p += 2
        else:
            if p + 5 > stop:
                return
            iid, = struct.unpack(">I", data[p:p + 4])
            p += 4
        cnt = data[p]
        p += 1
        props = []
        for _ in range(cnt):
            if wide:
                if p + 2 > stop:
                    return
                v, = struct.unpack(">H", data[p:p + 2])
                props.append(v & 0x7FFF)
                p += 2
            else:
                if p + 1 > stop:
                    return
                props.append(data[p] & 0x7F)
                p += 1
        state["ipma"][iid] = props


def _props_for(state: dict, item_id):
    if item_id is None:
        return None
    return state["ipma"].get(item_id)


def _pick(ipco, prop_indices, tag: bytes, fallback_first: bool = False):
    """The primary item's property of type ``tag`` via its 1-based
    ipco indices; optionally fall back to the first such property in
    ipco (correct for single-image files where ipma is missing)."""
    if prop_indices:
        for idx in prop_indices:
            if 1 <= idx <= len(ipco) and ipco[idx - 1][0] == tag:
                return ipco[idx - 1][1]
        if not fallback_first:
            return None
    if fallback_first or not prop_indices:
        return next((p for t, p in ipco if t == tag), None)
    return None
