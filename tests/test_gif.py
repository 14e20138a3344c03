"""From-scratch GIF codec (functions/gif.py): hand-framed byte KATs,
LZW properties, compositing semantics, cross-verification against the
system giflib in BOTH directions, and the Spark-side integration
(decode_image dispatch + animated sampling through video_frame_sample).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from colly_spark.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animated,
    exact_palette,
    lzw_decode,
    lzw_encode,
    median_cut_palette,
    parse_gif,
)
from colly_spark.functions.native_codecs import gif_native_available

RED, GREEN, BLUE = (255, 0, 0), (0, 255, 0), (0, 0, 255)


def _hand_gif_2x2() -> bytes:
    """A 2×2 GIF89a framed entirely by hand (header, LSD, 2-color GCT,
    LZW codes hand-packed LSB-first): indices [[0,1],[1,0]] over the
    palette [red, green]. The LZW byte stream 44 02 05 was derived on
    paper: codes clear(3b),0(3b),1(3b),1(3b),0(4b),EOI(4b)."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", 2, 2, 0x80 | (7 << 4) | 0, 0, 0)
    out += bytes([255, 0, 0, 0, 255, 0])  # GCT: red, green
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out += bytes([2])  # LZW min code size
    out += bytes([3, 0x44, 0x02, 0x05, 0])  # one sub-block + terminator
    out += b"\x3B"
    return bytes(out)


class TestLZW:
    def test_round_trip_property(self):
        rng = np.random.default_rng(5)
        for mcs in (2, 4, 8):
            for n in (1, 7, 255, 4096, 20000):
                idx = rng.integers(0, 1 << mcs, size=n).astype(np.uint8).tobytes()
                assert lzw_decode(lzw_encode(idx, mcs), mcs) == idx

    def test_table_overflow_resets_cleanly(self):
        # random 8-bit data long enough to fill the 4096-entry table
        rng = np.random.default_rng(6)
        idx = rng.integers(0, 256, size=60000).astype(np.uint8).tobytes()
        enc = lzw_encode(idx, 8)
        assert lzw_decode(enc, 8) == idx

    def test_bad_code_raises(self):
        with pytest.raises(ValueError):
            # width 3 stream whose first code is 7 (beyond initial table)
            lzw_decode(bytes([0b111]), 2)


class TestHandFramedKAT:
    def test_decode_hand_built_stream(self):
        px = decode_gif(_hand_gif_2x2())
        expect = np.array([[RED, GREEN], [GREEN, RED]], dtype=np.uint8)
        assert np.array_equal(px, expect)

    def test_encoder_reproduces_hand_packing(self):
        # the same 2×2 image through the encoder decodes identically
        expect = np.array([[RED, GREEN], [GREEN, RED]], dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(expect)), expect)


class TestRoundTrip:
    def test_exact_palette_lossless(self):
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(px)), px)

    def test_interlaced_lossless(self):
        rng = np.random.default_rng(2)
        # odd height exercises the pass boundaries
        px = (rng.integers(0, 5, size=(37, 23, 3)) * 51).astype(np.uint8)
        data = encode_gif(px, interlace=True)
        assert parse_gif(data)["frames"][0]["indices"].shape == (37, 23)
        assert np.array_equal(decode_gif(data), px)

    def test_large_few_color_lossless_through_table_overflow(self):
        rng = np.random.default_rng(3)
        px = (rng.integers(0, 6, size=(150, 170, 3)) * 42).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(px)), px)

    def test_rich_image_quantizes_deterministically(self):
        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        assert exact_palette(px) is None  # 4096 px -> >256 colors
        a, b = encode_gif(px), encode_gif(px)
        assert a == b
        dec = decode_gif(a)
        assert dec.shape == px.shape
        pal, idx = median_cut_palette(px)
        assert pal.shape[0] <= 256
        assert np.array_equal(dec, pal[idx])


class TestAnimation:
    def test_shared_palette_frames_composite(self):
        rng = np.random.default_rng(7)
        base = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        frames = [np.clip(base.astype(int) + 11 * k, 0, 255).astype(np.uint8)
                  for k in range(4)]
        got = decode_gif_frames(encode_gif_animated(frames, [5, 6, 7, 8]))
        assert [d for _c, d in got] == [5, 6, 7, 8]
        for (canvas, _d), f in zip(got, frames):
            assert np.array_equal(canvas, f)

    def test_transparency_and_disposal_by_hand(self):
        """Frame 1 paints the full 2×2 canvas; frame 2 is a 1×1 patch
        at (1,1) with disposal 2 (restore background); frame 3 is fully
        transparent, so it must show frame 2's rect already cleared."""
        out = bytearray()
        out += b"GIF89a"
        out += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
        out += bytes([255, 0, 0, 0, 255, 0])  # red, green

        def img(left, top, w, h, indices, gce=None):
            buf = bytearray()
            if gce is not None:
                disposal, transparent = gce
                packed = (disposal << 2) | (1 if transparent is not None else 0)
                buf += b"\x21\xF9\x04" + bytes([packed])
                buf += struct.pack("<H", 1) + bytes([transparent or 0, 0])
            buf += b"\x2C" + struct.pack("<HHHHB", left, top, w, h, 0)
            buf.append(2)
            lzw = lzw_encode(bytes(indices), 2)
            for i in range(0, len(lzw), 255):
                chunk = lzw[i:i + 255]
                buf.append(len(chunk))
                buf += chunk
            buf.append(0)
            return bytes(buf)

        out += img(0, 0, 2, 2, [0, 0, 0, 0])                 # all red
        out += img(1, 1, 1, 1, [1], gce=(2, None))           # green patch
        out += img(0, 0, 2, 2, [0, 0, 0, 0], gce=(0, 0))     # transparent
        out += b"\x3B"

        frames = decode_gif_frames(bytes(out))
        assert len(frames) == 3
        all_red = np.array([[RED, RED], [RED, RED]], dtype=np.uint8)
        assert np.array_equal(frames[0][0], all_red)
        with_patch = all_red.copy()
        with_patch[1, 1] = GREEN
        assert np.array_equal(frames[1][0], with_patch)
        # disposal 2 cleared the patch rect to background(black) and the
        # transparent frame painted nothing over it
        after = all_red.copy()
        after[1, 1] = (0, 0, 0)
        assert np.array_equal(frames[2][0], after)

    def test_disposal_3_restores_previous_canvas(self):
        out = bytearray()
        out += b"GIF89a"
        out += struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
        out += bytes([255, 0, 0, 0, 255, 0])

        def img(indices, gce=None):
            buf = bytearray()
            if gce is not None:
                buf += b"\x21\xF9\x04" + bytes([(gce << 2)])
                buf += struct.pack("<H", 1) + bytes([0, 0])
            buf += b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
            buf.append(2)
            lzw = lzw_encode(bytes(indices), 2)
            buf.append(len(lzw))
            buf += lzw
            buf.append(0)
            return bytes(buf)

        out += img([0, 0])            # red red
        out += img([1, 1], gce=3)     # green green, restore-previous
        out += img([1, 0])            # paints over the RESTORED red red
        frames = decode_gif_frames(bytes(out) + b"\x3B")
        assert np.array_equal(frames[2][0],
                              np.array([[GREEN, RED]], dtype=np.uint8))


@pytest.mark.skipif(not gif_native_available(), reason="giflib missing")
class TestGiflibCrossCheck:
    def test_our_streams_decode_under_giflib(self):
        from colly_spark.functions.native_codecs import decode_gif_native

        rng = np.random.default_rng(8)
        for shape in ((16, 16), (31, 9)):
            px = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
            if exact_palette(px) is None:
                continue
            desc, idx, pal = decode_gif_native(encode_gif(px))[0]
            assert np.array_equal(pal[idx], px)

    def test_overflow_stream_decodes_under_giflib(self):
        from colly_spark.functions.native_codecs import decode_gif_native

        rng = np.random.default_rng(9)
        px = (rng.integers(0, 6, size=(150, 170, 3)) * 42).astype(np.uint8)
        desc, idx, pal = decode_gif_native(encode_gif(px))[0]
        assert np.array_equal(pal[idx], px)

    def test_genuine_giflib_stream_decodes_here(self):
        from colly_spark.functions.native_codecs import encode_gif_native

        rng = np.random.default_rng(10)
        pal = rng.integers(0, 256, size=(64, 3)).astype(np.uint8)
        idx = rng.integers(0, 64, size=(23, 31)).astype(np.uint8)
        genuine = encode_gif_native(idx, pal)
        g = parse_gif(genuine)
        assert np.array_equal(g["frames"][0]["indices"], idx)
        assert np.array_equal(decode_gif(genuine), pal[idx])

    def test_animated_stream_frames_under_giflib(self):
        from colly_spark.functions.native_codecs import decode_gif_native

        rng = np.random.default_rng(11)
        base = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        frames = [np.clip(base.astype(int) + 9 * k, 0, 255).astype(np.uint8)
                  for k in range(3)]
        got = decode_gif_native(encode_gif_animated(frames, [1, 2, 3]))
        assert len(got) == 3
        for (_d, idx, pal), f in zip(got, frames):
            assert np.array_equal(pal[idx], f)


class TestImagesIntegration:
    def test_decode_image_dispatch_and_fmt_registry(self):
        from colly_spark.functions.images import (DECODABLE_WEB_FMTS,
                                                  decode_image, synth_encode,
                                                  synth_pixels)

        assert "gif" in DECODABLE_WEB_FMTS
        px = synth_pixels(3)
        fmt, data, ph = synth_encode(px, "gif")
        assert fmt == "gif" and data[:6] == b"GIF89a"
        assert np.array_equal(decode_image(data, "gif"), px)

    def test_poison_bytes_raise_not_crash(self):
        from colly_spark.functions.images import decode_image

        for bad in (b"", b"GIF89a" + b"\x00" * 4, b"not a gif at all"):
            with pytest.raises(Exception):
                decode_image(bad, "gif")


class TestSparkIntegration:
    def test_video_frame_sample_sniffs_gif(self, spark):
        from colly_spark.operators.av import (synthesize_animated_gifs,
                                              video_frame_sample)

        rows = (video_frame_sample(synthesize_animated_gifs(spark, 6), every=2)
                .orderBy("video_id", "frame_idx").collect())
        assert all(r["decode_ok"] for r in rows)
        # replica: every 2nd raw frame's phash
        from colly_spark.functions.images import phash64
        from colly_spark.operators.av import synth_video_frames

        expect = []
        for i in range(6):
            for idx, px in enumerate(synth_video_frames(i)):
                if idx % 2 == 0:
                    expect.append((f"gif{i:08d}", idx, phash64(px)))
        got = [(r["video_id"], r["frame_idx"], r["phash"]) for r in rows]
        assert got == expect

    def test_mixed_container_column(self, spark):
        """AVI and GIF rows flow through ONE operator invocation."""
        from colly_spark.operators.av import (synthesize_animated_gifs,
                                              synthesize_videos,
                                              video_frame_sample)

        mixed = (synthesize_videos(spark, 3)
                 .select("video_id", "bytes")
                 .unionByName(synthesize_animated_gifs(spark, 3)
                              .select("video_id", "bytes")))
        rows = video_frame_sample(mixed, every=2).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["video_id"][:3], []).append(r)
        assert set(by_id) == {"vid", "gif"}
        assert all(r["decode_ok"] for r in rows)
