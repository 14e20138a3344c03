"""Pixel-quality statistics (operators/multimodal.luma_stats /
image_stats — the LAION-style image admission signals). The oracle
gate is test_entry_oracle[image_stats] (golden replica, pins the
decode round-trip + Arrow plumbing); here the stat MATH is pinned by
hand-computed KATs, plus poison-row tolerance of the operator."""

from __future__ import annotations

import math

import numpy as np

from colly_spark.operators.multimodal import image_stats, luma_stats


def _solid(r, g, b, size=8):
    px = np.zeros((size, size, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = r, g, b
    return px


def test_flat_image_kat():
    # solid mid-gray: luma = (299+587+114)*128//1000 = 128
    m, c, e, s = luma_stats(_solid(128, 128, 128))
    assert (m, c, e, s) == (128.0, 0.0, 0.0, 0.0)


def test_luma_is_bt601_integer():
    # pure red: luma = 299*255//1000 = 76; green 587*255//1000 = 149
    assert luma_stats(_solid(255, 0, 0))[0] == 76.0
    assert luma_stats(_solid(0, 255, 0))[0] == 149.0
    assert luma_stats(_solid(0, 0, 255))[0] == 29.0  # 114*255//1000


def test_two_tone_entropy_and_contrast():
    # half 0, half 255 luma: entropy exactly 1 bit, std exactly 127.5
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    m, c, e, s = luma_stats(px)
    assert m == (0 * 32 + 255 * 32) / 64
    assert c == 127.5
    assert e == 1.0


def test_checkerboard_sharpness_kat():
    # luma alternates 0/255: every interior Laplacian = ±4*255∓4*... :
    # 4*v - 4*opposite = 4*255 or -4*255 → |lap| = 1020 everywhere
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[(np.indices((8, 8)).sum(axis=0) % 2) == 1] = 255
    m, c, e, s = luma_stats(px)
    assert s == 1020.0
    assert e == 1.0


def test_tiny_image_sharpness_null():
    assert luma_stats(_solid(9, 9, 9, size=2))[3] is None


def test_operator_poison_rows_and_values(spark):
    from colly_spark.functions.images import synth_encode

    px = _solid(128, 128, 128, size=8)
    _, data, _ = synth_encode(px, "png")
    rows = [("good", bytearray(data), "png"),
            ("bad", bytearray(b"notanimage"), "png")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r.asDict() for r in image_stats(df).collect()}
    assert got["good"]["decode_ok"] and got["good"]["mean_luma"] == 128.0
    assert got["good"]["entropy"] == 0.0
    assert not got["bad"]["decode_ok"]
    assert got["bad"]["mean_luma"] is None


def test_entropy_matches_closed_form_on_uniform_hist():
    # 16x16 with each of 256 luma values exactly once → entropy 8 bits
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    px = np.stack([vals, vals, vals], axis=-1)
    # gray pixels: luma = (299+587+114)*v//1000 = v
    m, c, e, s = luma_stats(px)
    assert e == 8.0
    assert m == round(float(np.arange(256).mean()), 6)
    assert c == round(float(np.arange(256).std()), 6)


def test_image_curation_pipeline_laws(spark):
    """Composition laws of q_image_curation (the oracle gate pins the
    values; this pins the structure): admitted ⊆ decode_ok ∧
    entropy≥τ, every admitted image in exactly one group, canon is the
    group min, exactly one canonical member per group, cluster sizes
    consistent."""
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    rows = [r.asDict() for r in
            mod.queries()["image_curation"](spark, "").collect()]
    assert rows
    groups = {}
    for r in rows:
        assert r["entropy"] >= 6.95
        assert r["canon_id"] <= r["image_id"]  # min-id canonical
        groups.setdefault(r["canon_id"], []).append(r)
    for canon, members in groups.items():
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)
        assert min(m["image_id"] for m in members) == canon
