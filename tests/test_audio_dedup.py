"""Hand-computed KATs for the audio fingerprint stack
(functions/audio.spectral_landmarks + operators/av.audio_near_dup_
pairs). The oracle gate (test_entry_oracle: `audio_near_dup`) proves
Spark == DuckDB on the variant corpus; these pin the landmark math
(pure-tone peak bins, fan-out, hash packing) and the matcher
semantics (offset coherence, tie-break, stop-hash cap, poison
exclusion) on inputs small enough to compute by hand."""

from __future__ import annotations

import numpy as np

from colly_spark.functions.audio import spectral_landmarks
from colly_spark.operators.av import audio_near_dup_pairs

SCHEMA = "audio_id string, fp_hash long, t int, decode_ok boolean"


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["audio_a"], r["audio_b"]): (r["aligned"], r["best_dt"])
            for r in audio_near_dup_pairs(df, **kw).collect()}


class TestLandmarks:
    def test_pure_tone_constellation(self):
        # a bin-exact tone at bin 10 of a 256-point FFT: the Hann
        # window spreads it to side lobes at bins 9/11 (half the main
        # magnitude), so with n_peaks=1 every frame's single peak is
        # bin 10 and each anchor fans to the next 3 frames → hashes
        # (10<<16 | 10<<6 | dt) for dt in 1..3
        rate, n = 8000, 2048
        t = np.arange(n) / rate
        x = np.round(8000 * np.sin(2 * np.pi * (10 * rate / 256) * t)
                     ).astype(np.int16)
        lm = spectral_landmarks(x, n_peaks=1)
        n_frames = 1 + (n - 256) // 128
        want = set()
        for t1 in range(n_frames):
            for dt in (1, 2, 3):
                if t1 + dt < n_frames:
                    want.add(((10 << 16) | (10 << 6) | dt, t1))
        assert set(lm) == want

    def test_two_tone_peak_order(self):
        # two tones → two peaks per frame, emitted bin-ascending; the
        # first anchor's first fan target is the SAME frame's higher
        # bin at dt≥1... dt_min=1 forbids same-frame pairs, so every
        # hash spans distinct frames
        rate, n = 8000, 1024
        t = np.arange(n) / rate
        x = np.round(6000 * np.sin(2 * np.pi * (20 * rate / 256) * t)
                     + 4000 * np.sin(2 * np.pi * (40 * rate / 256) * t)
                     ).astype(np.int16)
        lm = spectral_landmarks(x)
        assert lm, "two-tone signal must produce landmarks"
        for h, _t in lm:
            assert (h & 63) >= 1  # dt ≥ dt_min

    def test_short_signal_empty(self):
        assert spectral_landmarks(np.zeros(100, dtype=np.int16)) == []


class TestMatcher:
    def test_offset_coherent_pair(self, spark):
        rows = ([("A", 100 + i, i, True) for i in range(6)]
                + [("B", 100 + i, i + 4, True) for i in range(6)])
        got = _pairs(spark, rows, min_matches=6)
        assert got == {("A", "B"): (6, -4)}
        assert _pairs(spark, rows, min_matches=7) == {}

    def test_scattered_collisions_never_align(self, spark):
        # same 6 shared hashes but at incoherent offsets: every vote
        # bucket holds 1 → no pair at min_matches=2
        rows = ([("A", 100 + i, i, True) for i in range(6)]
                + [("B", 100 + i, 3 * i, True) for i in range(6)])
        assert _pairs(spark, rows, min_matches=2) == {}

    def test_tie_breaks_to_smallest_dt(self, spark):
        # two offsets each gather 2 votes → best_dt is the smaller dt
        rows = [("A", 1, 0, True), ("A", 2, 1, True),
                ("A", 3, 10, True), ("A", 4, 11, True),
                ("B", 1, 5, True), ("B", 2, 6, True),
                ("B", 3, 10, True), ("B", 4, 11, True)]
        got = _pairs(spark, rows, min_matches=2)
        assert got == {("A", "B"): (2, -5)}

    def test_stop_hash_cap(self, spark):
        # hash 7 appears in 4 audios: with hash_cap=3 it contributes
        # nothing, so the A-B overlap of coherent hash-7 rows vanishes
        rows = []
        for aid in ("A", "B", "C", "D"):
            for i in range(5):
                rows.append((aid, 7, i, True))
        assert _pairs(spark, rows, min_matches=2, hash_cap=3) == {}
        got = _pairs(spark, rows, min_matches=5, hash_cap=4)
        assert got[("A", "B")] == (5, 0)

    def test_poison_rows_excluded(self, spark):
        rows = [("A", 1, 0, True), ("A", 2, 1, True),
                ("B", 1, 0, True), ("B", 2, 1, True),
                ("C", None, None, False)]
        got = _pairs(spark, rows, min_matches=2)
        assert got == {("A", "B"): (2, 0)}


def test_end_to_end_shifted_variants(spark):
    """synthesize → WAV decode → landmarks → matcher recovers exactly
    the planted shifted/re-gained variants at the coherent offset
    (shift 512 samples = 4 hops → best_dt −4)."""
    from colly_spark.operators.av import (audio_fingerprints,
                                          synthesize_audio_fp)

    fp = audio_fingerprints(synthesize_audio_fp(spark, 4, n_variants=2))
    got = _pairs(spark, [tuple(r) for r in fp.collect()], min_matches=40)
    assert set(got) == {("aud00000000", "aud00000004"),
                        ("aud00000001", "aud00000005")}
    for aligned, best_dt in got.values():
        assert best_dt == -4 and aligned >= 40
