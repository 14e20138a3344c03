"""KATs for the from-scratch AVIF/HEIF container probe
(functions/avif.py): writer↔prober round-trips over the parameter
grid, a hand-assembled byte fixture that pins the box layout
independently of the writer, primary-item resolution against a decoy
ispe, both ipma index widths and pitm versions, poison tolerance, and
(when the container has libavif) agreement with a real encoder's
output."""

import struct

import pytest

from colly_spark.functions.avif import (_ALPHA_URN, encode_avif_stub,
                                        probe_avif)


def _box(tag, payload):
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag, version, payload, flags=0):
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


def test_roundtrip_grid():
    import itertools
    for (w, h), depth, alpha, rot, mir, sp, brand in itertools.product(
            [(64, 48), (4096, 2160)], [8, 10, 12], [False, True],
            [0, 90, 270], [None, 0, 1], [0, 2], ["avif", "avis"]):
        info = probe_avif(encode_avif_stub(
            w, h, depth=depth, alpha=alpha, rotation=rot, mirror=mir,
            seq_profile=sp, brand=brand, mdat=b"\x00" * 16))
        assert (info["w"], info["h"]) == (w, h)
        assert info["depth"] == depth
        assert info["alpha"] == alpha
        assert info["rotation"] == rot
        assert info["mirror"] == mir
        assert info["seq_profile"] == sp
        assert info["brand"] == brand
        assert info["animated"] == (brand == "avis")
        assert info["codec"] == "av01"
        assert info["n_items"] == (2 if alpha else 1)


def test_decoy_ispe_requires_primary_item_resolution():
    """A leading 1x1 ispe must NOT shadow the primary item's real
    dimensions — pitm+ipma resolution, not first-ispe-wins."""
    data = encode_avif_stub(640, 480, decoy_ispe=True)
    assert struct.pack(">II", 1, 1) in data  # the decoy really is first
    info = probe_avif(data)
    assert (info["w"], info["h"]) == (640, 480)


def test_pitm_v1_and_wide_ipma():
    for pv, wide in [(0, True), (1, False), (1, True)]:
        info = probe_avif(encode_avif_stub(
            320, 200, depth=10, alpha=True, pitm_version=pv,
            wide_ipma=wide, decoy_ispe=True))
        assert (info["w"], info["h"]) == (320, 200)
        assert info["depth"] == 10 and info["alpha"]


def test_hand_assembled_fixture():
    """Byte-level KAT assembled here from the ISO 14496-12 / 23008-12
    layouts directly — pins probe_avif against the spec, not against
    encode_avif_stub."""
    ispe = _full(b"ispe", 0, struct.pack(">II", 800, 600))
    pixi = _box(b"pixi", struct.pack(">IB", 0, 3) + bytes([10, 10, 10]))
    av1c = _box(b"av1C", bytes([0x81, (1 << 5) | 0x0D, 0x50, 0x00]))
    irot = _full(b"irot", 0, bytes([3]))  # 3 * 90 = 270
    ipco = _box(b"ipco", ispe + pixi + av1c + irot)
    ipma = _full(b"ipma", 0, struct.pack(">IHB", 1, 1, 4)
                 + bytes([0x81, 0x02, 0x83, 0x04]))
    infe = _full(b"infe", 2, struct.pack(">HH", 1, 0) + b"av01\x00")
    iinf = _full(b"iinf", 0, struct.pack(">H", 1) + infe)
    pitm = _full(b"pitm", 0, struct.pack(">H", 1))
    hdlr = _full(b"hdlr", 0, struct.pack(">I4s12x", 0, b"pict") + b"\x00")
    meta = _full(b"meta", 0, hdlr + pitm + iinf + _box(b"iprp", ipco + ipma))
    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    info = probe_avif(ftyp + meta + _box(b"mdat", b"\x00" * 8))
    assert (info["w"], info["h"]) == (800, 600)
    assert info["depth"] == 10
    assert info["seq_profile"] == 1
    assert info["rotation"] == 270
    assert info["mirror"] is None
    assert info["codec"] == "av01"
    assert info["n_items"] == 1
    assert not info["alpha"] and not info["animated"]


def test_largesize_box_skipped():
    """A 64-bit largesize filler box before meta must be skipped by
    size, same walk discipline as functions/mp4.py."""
    good = encode_avif_stub(128, 96)
    ftyp_len = 8 + len(b"avif" + struct.pack(">I", 0) + b"avifmif1miaf")
    filler = (struct.pack(">I", 1) + b"free"
              + struct.pack(">Q", 16 + 32) + b"\x00" * 32)
    data = good[:ftyp_len] + filler + good[ftyp_len:]
    info = probe_avif(data)
    assert (info["w"], info["h"]) == (128, 96)


@pytest.mark.parametrize("bad", [
    b"", b"\x00" * 24, b"GIF89a\x04\x00\x04\x00\x00\x00",
    encode_avif_stub(4, 4)[:20],
    _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp41"),  # mp4 brand
    _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1"),  # no meta
])
def test_poison_raises(bad):
    with pytest.raises(ValueError):
        probe_avif(bad)


def test_alpha_urn_detection_is_exact():
    """An auxC with a non-alpha urn must not flag alpha."""
    data = encode_avif_stub(64, 64, alpha=True)
    assert probe_avif(data)["alpha"]
    swapped = data.replace(_ALPHA_URN,
                           b"urn:mpeg:mpegB:cicp:systems:auxiliary:depth"
                           [:len(_ALPHA_URN)])
    assert not probe_avif(swapped)["alpha"]


def test_against_native_libavif_when_present():
    """When the container carries libavif, probe a REAL encoder's
    bytes — the only seam the stub writer can't pin."""
    from colly_spark.functions.native_codecs import avif_native_available
    if not avif_native_available():
        pytest.skip("libavif absent in container (documented seam)")
    import numpy as np

    from colly_spark.functions.native_codecs import encode_avif_native
    px = np.zeros((32, 48, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    data = encode_avif_native(px, max_quantizer=4)
    info = probe_avif(data)
    assert (info["w"], info["h"]) == (48, 32)
    assert info["codec"] == "av01"
    assert info["probe_ok"] if "probe_ok" in info else True
