"""Transcribe RFC 6386's normative VP8 constant tables from the
container's open-source libwebp binary into a Python module.

The tables (default coefficient probabilities, keyframe mode
probabilities, dequantization lookups, scan order, probability-update
flags) are NORMATIVE constants published in RFC 6386 ("VP8 Data Format
and Decoding Guide", §11.5, §13.4-13.5, §14.1) — public spec material
of the same standing as JPEG's Annex-K tables. This container has no
copy of the RFC text, but it ships Debian's BSD-licensed
libwebp 1.2.4 (`libwebp.so.7.1.5`), whose .rodata carries the same
normative arrays verbatim; this script locates them by content
signature and regenerates colly_spark/functions/vp8_tables.py.

Every extracted table is anchored by known RFC values (asserted below)
and the generated module is validated end-to-end by
tests/test_vp8.py: the from-scratch decoder built on these tables must
reproduce libwebp's own decoded YUV planes BIT-EXACTLY on genuine
libwebp-encoded streams — a single wrong byte in any table fails that
gate.

Usage: python scripts/extract_vp8_tables.py [path-to-libwebp.so]
"""

from __future__ import annotations

import re
import struct
import subprocess
import sys

OUT = "colly_spark/functions/vp8_tables.py"
DEFAULT_SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"


def rodata(so_path: str) -> bytes:
    out = subprocess.run(["objdump", "-s", "-j", ".rodata", so_path],
                         capture_output=True, text=True, check=True).stdout
    blob = bytearray()
    for line in out.splitlines():
        m = re.match(r"^ ([0-9a-f]+) ((?:[0-9a-f]{2,8} ){1,4})", line)
        if m:
            blob.extend(bytes.fromhex(m.group(2).replace(" ", "")))
    return bytes(blob)


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO
    blob = rodata(so)

    # anchor 1: coefficient band map (RFC 6386 §13.3)
    bands = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
    b0 = blob.find(bands)
    assert b0 >= 0, "band map not found"

    # dequant lookups precede the band map: AC uint16[128], DC uint8[128]
    dc_off = b0 - 128
    ac_off = dc_off - 256
    dc = list(blob[dc_off:dc_off + 128])
    ac = list(struct.unpack("<128H", blob[ac_off:ac_off + 256]))
    assert dc[:8] == [4, 5, 6, 7, 8, 9, 10, 10] and dc[-1] == 157, dc[:8]
    assert ac[:8] == [4, 5, 6, 7, 8, 9, 10, 11] and ac[-1] == 284, ac[:8]

    # coeff-update probs [4][8][3][11] follow the (padded) band map
    up_off = b0 + 32
    update = list(blob[up_off:up_off + 1056])
    assert update[0] == 255 and sum(1 for v in update if v == 255) > 800

    # keyframe B-mode probs [10][10][9] (RFC §11.5) follow immediately
    bm_off = up_off + 1056
    bmode = list(blob[bm_off:bm_off + 900])
    assert bmode[:9] == [231, 120, 48, 89, 115, 113, 120, 152, 112]
    assert bmode[9:18] == [152, 179, 64, 126, 170, 118, 46, 70, 95]
    assert bmode[-4:] == [128, 48, 4, 24]

    # default coefficient probs [4][8][3][11] (RFC §13.5): first 33
    # bytes (type 0, band 0 — never coded) are all 128
    cp_off = blob.find(bytes([128] * 33) + bytes([253, 136, 254]))
    assert cp_off >= 0, "default coeff probs not found"
    coeff = list(blob[cp_off:cp_off + 1056])
    assert coeff[33:44] == [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]

    # zigzag scan order (RFC §13.3)
    zz = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
    assert blob.find(zz) >= 0

    # DCT token extra-bits probabilities, categories 3..6 (RFC §13.2),
    # stored NUL-terminated, cat6 first
    p_off = blob.find(bytes([254, 254, 243, 230, 196, 177, 153, 140, 133,
                             130, 129, 0]))
    assert p_off >= 0, "Pcat6 not found"
    tail = blob[p_off:p_off + 40]
    cats = []
    cur = []
    for v in tail:
        if v == 0:
            if cur:
                cats.append(cur)
            cur = []
            if len(cats) == 4:
                break
        else:
            cur.append(v)
    cat6, cat5, cat4, cat3 = cats
    assert cat5 == [180, 157, 141, 134, 130] and cat3 == [173, 148, 140]
    # cat1/cat2 are inlined as code immediates in this build; their RFC
    # §13.2 values are corroborated by cat3..6 matching and proven by
    # the bit-exact decode gate in tests/test_vp8.py
    pcat = [[159], [165, 145], cat3, cat4, cat5, cat6]

    def fmt(name, vals, per=12):
        lines = [f"{name} = ("]
        for i in range(0, len(vals), per):
            lines.append("    " + ", ".join(str(v) for v in vals[i:i + per]) + ",")
        lines.append(")")
        return "\n".join(lines)

    body = f'''"""VP8 normative constant tables (RFC 6386 §11.5, §13.2-13.5,
§14.1), transcribed from the BSD-licensed system libwebp binary by
scripts/extract_vp8_tables.py (see its docstring for provenance).
GENERATED FILE - regenerate with the script rather than editing.

Shapes:
- AC_QLOOKUP[128], DC_QLOOKUP[128]: quantizer index -> step size
- BANDS[16]: coefficient position -> probability band
- ZIGZAG[16]: scan order
- DEFAULT_COEFF_PROBS / COEFF_UPDATE_PROBS: flat [4*8*3*11], indexed
  [block_type][band][context][node] row-major
- KF_BMODE_PROB: flat [10*10*9], indexed [above_mode][left_mode][node]
- PCAT[k]: extra-bit probabilities for DCT token categories 1..6
- KF_YMODE_PROB[4] / KF_UV_PROB[3]: keyframe mode-tree probabilities
  (RFC §11.5 literals; inlined as immediates in the binary)

Every table is proven against the independent decoder: a wrong byte
anywhere fails the bit-exact YUV equality gate in tests/test_vp8.py.
"""

# flake8: noqa: E501

{fmt("AC_QLOOKUP", ac)}

{fmt("DC_QLOOKUP", dc)}

{fmt("BANDS", list(bands))}

{fmt("ZIGZAG", list(zz))}

{fmt("DEFAULT_COEFF_PROBS", coeff, per=11)}

{fmt("COEFF_UPDATE_PROBS", update, per=11)}

{fmt("KF_BMODE_PROB", bmode, per=9)}

PCAT = ({", ".join("(" + ", ".join(map(str, c)) + ("," if len(c)==1 else "") + ")" for c in pcat)})

KF_YMODE_PROB = (145, 156, 163, 128)

KF_UV_PROB = (142, 114, 183)
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: ac@{hex(ac_off)} dc@{hex(dc_off)} bands@{hex(b0)} "
          f"update@{hex(up_off)} bmode@{hex(bm_off)} coeff@{hex(cp_off)} "
          f"pcat@{hex(p_off)}")


if __name__ == "__main__":
    main()
