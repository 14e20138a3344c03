"""Audio/video containers (functions/audio.py, functions/avi.py) and
their curation operators (operators/av.py).

Pins:
- WAV: a hand-framed byte-level KAT (spec fields at fixed offsets),
  lossless round-trip mono/stereo, chunk-walk tolerance, and
  closed-form feature KATs (constant + alternating signals);
- AVI: round-trip frame equality, every-Nth sampling, truncated-file
  prefix behavior, header fields;
- operators: Spark output equals plain-Python expectation per row;
  poison rows degrade to decode_ok=False without failing the stage.
"""

import struct

import numpy as np
import pytest

from colly_spark.functions import audio as A
from colly_spark.functions import avi as V


def test_wav_hand_framed_kat():
    samples = np.array([[0], [1000], [-1000], [32767]], dtype=np.int16)
    wav = A.encode_wav(samples, 8000)
    # RIFF framing per spec
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert wav[12:16] == b"fmt " and struct.unpack("<I", wav[16:20])[0] == 16
    afmt, ch, rate, br, ba, bits = struct.unpack("<HHIIHH", wav[20:36])
    assert (afmt, ch, rate, br, ba, bits) == (1, 1, 8000, 16000, 2, 16)
    assert wav[36:40] == b"data"
    assert wav[44:] == samples.astype("<i2").tobytes()
    r, s = A.decode_wav(wav)
    assert r == 8000 and np.array_equal(s, samples)


def test_wav_roundtrip_stereo_and_chunk_walk():
    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32767, size=(777, 2)).astype(np.int16)
    wav = A.encode_wav(s, 44100)
    r, out = A.decode_wav(wav)
    assert r == 44100 and np.array_equal(out, s)
    # foreign odd-sized chunk between fmt and data must be skipped
    head, data = wav[:36], wav[36:]
    wav2 = head + b"LIST" + struct.pack("<I", 5) + b"INFOx\x00" + data
    body_len = len(wav2) - 8
    wav2 = b"RIFF" + struct.pack("<I", body_len) + wav2[8:]
    r2, out2 = A.decode_wav(wav2)
    assert r2 == 44100 and np.array_equal(out2, s)
    for bad in (b"", b"RIFFxxxx", b"RIFF\x04\x00\x00\x00AVI "):
        with pytest.raises(ValueError):
            A.decode_wav(bad)


def test_audio_stats_closed_form():
    const = np.full((100, 1), 16384, dtype=np.int16)
    st = A.audio_stats(const, 1000)
    assert st == dict(rate=1000, channels=1, n_frames=100, duration_ms=100,
                      rms=0.5, peak=0.5, zcr=0.0)
    alt = np.tile(np.array([8192, -8192], dtype=np.int16), 50)[:, None]
    st2 = A.audio_stats(alt, 8000)
    assert st2["zcr"] == round(99 / 99, 6) == 1.0
    assert st2["rms"] == 0.25 and st2["duration_ms"] == 12


def test_avi_roundtrip_and_sampling():
    frames = [bytes([i]) * (10 + i) for i in range(5)]  # odd+even sizes
    avi = V.encode_mjpeg_avi(frames, 16, 16, fps=10)
    meta = V.parse_avi(avi)
    assert (meta["w"], meta["h"], meta["fps"]) == (16, 16, 10)
    assert meta["frames"] == frames
    assert V.sample_frames(avi, 2) == [(0, frames[0]), (2, frames[2]),
                                       (4, frames[4])]
    # truncation mid-movi yields the frame prefix
    cut = avi[: avi.index(frames[3])]
    got = V.parse_avi(cut + b"")
    assert got["frames"][:3] == frames[:3] and len(got["frames"]) <= 4
    with pytest.raises(ValueError):
        V.parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_features_operator(spark):
    from colly_spark.operators.av import audio_features, synthesize_audio

    rows = {r.audio_id: r for r in
            audio_features(synthesize_audio(spark, 12)).collect()}
    assert len(rows) == 12 and all(r.decode_ok for r in rows.values())
    for i in (1, 4, 11):
        rate, samples = A.synth_samples(i)
        exp = A.audio_stats(samples, rate)
        r = rows[f"aud{i:08d}"]
        assert (r.rate, r.channels, r.n_frames, r.duration_ms,
                r.rms, r.peak, r.zcr) == (
            exp["rate"], exp["channels"], exp["n_frames"],
            exp["duration_ms"], exp["rms"], exp["peak"], exp["zcr"])


def test_video_frame_sample_operator_and_poison(spark):
    from colly_spark.functions.images import phash64
    from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from colly_spark.operators.av import (synth_video_frames,
                                          synthesize_videos,
                                          video_frame_sample)

    vids = synthesize_videos(spark, 6)
    poison = spark.createDataFrame(
        [("vidPOISON", bytearray(b"not an avi at all"))],
        "video_id string, bytes binary")
    out = video_frame_sample(
        vids.select("video_id", "bytes").unionByName(poison),
        every=2).collect()
    bad = [r for r in out if r.video_id == "vidPOISON"]
    assert len(bad) == 1 and bad[0].decode_ok is False
    good = [r for r in out if r.video_id == "vid00000003"]
    exp_frames = synth_video_frames(3)
    assert [r.frame_idx for r in sorted(good, key=lambda r: r.frame_idx)] \
        == list(range(0, len(exp_frames), 2))
    for r in good:
        px = decode_jpeg(encode_jpeg(exp_frames[r.frame_idx], quality=95))
        assert r.phash == phash64(px) and (r.w, r.h) == (16, 16)


def test_mp4_probe_roundtrip_and_poison(spark):
    from colly_spark.functions.mp4 import encode_mp4_stub, probe_mp4
    from colly_spark.operators.av import (mp4_params, mp4_probe_features,
                                          synthesize_mp4s)

    # scalar round-trip incl. 90kHz timescale duration floor behavior
    b = encode_mp4_stub(1920, 1080, 99_999, codec="av01", brand="mp42",
                        timescale=90000)
    info = probe_mp4(b)
    assert (info["w"], info["h"], info["codec"], info["brand"]) == \
        (1920, 1080, "av01", "mp42")
    assert info["duration_ms"] == (99_999 * 90000 // 1000) * 1000 // 90000
    # unknown top-level boxes are skipped, 64-bit largesize tolerated
    import struct
    big = (b[:0] + b"\x00\x00\x00\x01free" + struct.pack(">Q", 16)
           + b + b"\x00\x00\x00\x08skip")
    assert probe_mp4(big)["codec"] == "av01"

    out = {r.video_id: r for r in mp4_probe_features(
        synthesize_mp4s(spark, 8).unionByName(spark.createDataFrame(
            [("mp4POISON", bytearray(b"RIFF not bmff"))],
            "video_id string, bytes binary"))).collect()}
    assert out["mp4POISON"].probe_ok is False
    for i in (0, 5, 7):
        p = mp4_params(i)
        r = out[f"mp4{i:08d}"]
        assert (r.w, r.h, r.codec, r.brand, r.n_tracks, r.video_tracks) \
            == (p["w"], p["h"], p["codec"], p["brand"], 1, 1)
