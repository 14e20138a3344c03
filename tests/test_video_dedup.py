"""Hand-computed KATs for video_near_dup_pairs (operators/av.py) —
the oracle gate (test_entry_oracle: `video_near_dup`) proves
Spark == DuckDB brute force on the variant corpus; these pin the
intended semantics (alignment window, tau boundary, distinct-frame
counting, poison exclusion, pigeonhole completeness) on inputs small
enough to compute by hand."""

from __future__ import annotations

from colly_spark.operators.av import video_near_dup_pairs

SCHEMA = "video_id string, frame_idx int, phash long, decode_ok boolean"


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["video_a"], r["video_b"]):
            (r["matched"], r["n_a"], r["n_b"], r["score_ppm"])
            for r in video_near_dup_pairs(df, **kw).collect()}


def test_exact_duplicate_and_score(spark):
    rows = [("A", 0, 10, True), ("A", 2, 20, True), ("A", 4, 30, True),
            ("B", 0, 10, True), ("B", 2, 20, True), ("B", 4, 30, True)]
    got = _pairs(spark, rows)
    assert got == {("A", "B"): (3, 3, 3, 1_000_000)}


def test_alignment_window_gates_matches(spark):
    # C's only matching frame sits 4 indices away from A's — outside
    # align_window=1, so no pair; widening the window admits it
    rows = [("A", 0, 10, True), ("A", 2, 99, True),
            ("C", 4, 10, True), ("C", 6, 77, True)]
    assert _pairs(spark, rows) == {}
    got = _pairs(spark, rows, align_window=4, tau=0.5)
    assert got == {("A", "C"): (1, 2, 2, 500_000)}


def test_tau_boundary_is_inclusive(spark):
    # 1 of 2 frames matched = exactly tau=0.5 → kept (>=); tau just
    # above drops it
    rows = [("A", 0, 10, True), ("A", 2, 99, True),
            ("B", 0, 10, True), ("B", 2, 500, True)]
    assert ("A", "B") in _pairs(spark, rows, tau=0.5)
    assert _pairs(spark, rows, tau=0.500001) == {}


def test_distinct_frame_counting_not_pair_counting(spark):
    # A's frame 0 matches BOTH of B's frames 0 and 1 (window 1) —
    # matched counts A's distinct frames (1), not match pairs (2)
    rows = [("A", 0, 10, True), ("A", 2, 99, True),
            ("B", 0, 10, True), ("B", 1, 10, True)]
    got = _pairs(spark, rows, tau=0.5)
    assert got == {("A", "B"): (1, 2, 2, 500_000)}


def test_hamming_radius_and_pigeonhole(spark):
    # 3 bits spread across 3 different 16-bit bands still matches
    # (Hamming 3 ≤ k); 4 bits does not
    base = 0x0123_4567_89AB_CDEF
    three = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32)
    four = three ^ (1 << 48)
    rows = [("A", 0, base, True), ("B", 0, three, True),
            ("C", 0, four, True)]
    got = _pairs(spark, rows, tau=1.0)
    assert ("A", "B") in got and ("A", "C") not in got
    # B vs C differ by 1 bit → also a pair
    assert ("B", "C") in got


def test_poison_rows_excluded(spark):
    # an undecodable container (null phash, decode_ok False) neither
    # crashes nor counts toward sizes
    rows = [("A", 0, 10, True), ("A", None, None, False),
            ("B", 0, 10, True)]
    got = _pairs(spark, rows)
    assert got == {("A", "B"): (1, 1, 1, 1_000_000)}


def test_negative_phash_band_split(spark):
    # top-bit-set phashes are stored as negative int64 — the unsigned
    # band shift and bit_count must still pair them
    h = -(1 << 63) + 5          # 0x8000000000000005 as signed
    rows = [("A", 0, h, True), ("B", 0, h ^ 1, True)]
    assert ("A", "B") in _pairs(spark, rows)
