"""SemDeDup (operators/similarity.semdedup): k-means clusters +
within-cluster cosine pruning, keep-lowest-id.

Pins:
- planted near-dup groups INSIDE one cluster collapse to their lowest
  id; cross-cluster near-dups are (by design) not compared;
- survivors match a brute-force numpy replica of the exact rule;
- the vectorized (broadcast-matmul) assignment path returns the
  identical survivor set as the literal-Catalyst path.
"""

import numpy as np
from pyspark.sql import functions as F

from colly_spark.operators.similarity import ivf_centroids, semdedup

DIM, NLIST, SEED = 8, 4, 7


def _mk(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute(vecs, cents, threshold):
    v = np.asarray(vecs, dtype=np.float64)
    cells = np.argmax(v @ cents.T, axis=1)
    n = len(vecs)
    cos = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None]
                       * np.linalg.norm(v, axis=1)[None, :])
    kept = []
    for i in range(n):
        dup = any(cells[j] == cells[i] and round(cos[i, j], 6) >= threshold
                  for j in range(i))
        if not dup:
            kept.append((i, int(cells[i])))
    return set(kept)


def test_planted_groups_collapse(spark):
    cents = ivf_centroids(DIM, NLIST, SEED)
    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, DIM))
    vecs = []
    for b in base:
        vecs.append(b)                      # group leader
        vecs.append(b + 0.01 * rng.standard_normal(DIM))  # near-dup
        vecs.append(b + 0.02 * rng.standard_normal(DIM))  # near-dup
    got = {(r.vec_id, r.cell)
           for r in semdedup(_mk(spark, vecs), threshold=0.95, nlist=NLIST,
                             dim=DIM, seed=SEED).collect()}
    expected = _brute(vecs, cents, 0.95)
    assert got == expected
    # every planted triple shares a cell, so exactly the leaders survive
    assert {i for i, _ in got} == {0, 3, 6, 9, 12, 15}


def test_matches_brute_force_random(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, DIM))
    cents = ivf_centroids(DIM, NLIST, SEED)
    for thr in (0.5, 0.8):
        got = {(r.vec_id, r.cell)
               for r in semdedup(_mk(spark, vecs), threshold=thr,
                                 nlist=NLIST, dim=DIM, seed=SEED).collect()}
        assert got == _brute(vecs, cents, thr), thr


def test_fat_cell_guard_bounds_pairs_and_reports(spark):
    """A planted duplicate-heavy fat cell: with max_cell_size the fat
    cell is excluded from pair generation (all its members survive,
    un-deduped) while normal cells still dedup, and
    semdedup_oversized_cells reports exactly the excluded cell with
    its size — the truncation is never silent."""
    from colly_spark.operators.similarity import semdedup_oversized_cells

    cents = ivf_centroids(DIM, NLIST, SEED)
    rng = np.random.default_rng(5)
    lead = rng.standard_normal(DIM)
    fat = [lead + 0.001 * rng.standard_normal(DIM) for _ in range(40)]
    fat_cell = int(np.argmax(np.asarray(fat) @ cents.T, axis=1)[0])
    # a second, small near-dup pair planted in a DIFFERENT cell
    other = None
    for _ in range(200):
        c = rng.standard_normal(DIM)
        if int(np.argmax(c @ cents.T)) != fat_cell:
            other = c
            break
    assert other is not None
    vecs = fat + [other, other + 0.001 * rng.standard_normal(DIM)]
    df = _mk(spark, vecs)

    cap = 10
    out = {(r.vec_id, r.cell)
           for r in semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM,
                             seed=SEED, max_cell_size=cap).collect()}
    # fat cell untouched: all 40 members survive; small cell deduped
    assert {i for i, _ in out} == set(range(40)) | {40}
    rep = semdedup_oversized_cells(df, nlist=NLIST, dim=DIM, seed=SEED,
                                   max_cell_size=cap).collect()
    assert [(r.cell, r.n_members) for r in rep] == [(fat_cell, 40)]
    # unguarded (max_cell_size=0) still collapses the fat cell
    raw = {i for i, _ in
           ((r.vec_id, r.cell) for r in
            semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM,
                     seed=SEED, max_cell_size=0).collect())}
    assert raw == {0, 40}


def test_vectorized_assignment_equals_catalyst(spark):
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((80, DIM))
    df = _mk(spark, vecs)
    lit = semdedup(df, threshold=0.6, nlist=NLIST, dim=DIM, seed=SEED,
                   assign="catalyst")
    vec = semdedup(df, threshold=0.6, nlist=NLIST, dim=DIM, seed=SEED,
                   assign="vectorized")
    assert ({tuple(r) for r in lit.collect()}
            == {tuple(r) for r in vec.collect()})


def test_two_level_dedups_fat_cell(spark):
    """The production remedy: a planted fat cell is re-clustered by
    the sub-quantizer and DEDUPED (unlike the cap guard, which skips
    it); normal cells keep exact level-1 semantics (same survivors as
    plain semdedup); sub_cell is NULL exactly for normal-cell rows."""
    from colly_spark.operators.similarity import semdedup_two_level

    cents = ivf_centroids(DIM, NLIST, SEED)
    rng = np.random.default_rng(5)
    lead = rng.standard_normal(DIM)
    fat = [lead + 0.001 * rng.standard_normal(DIM) for _ in range(40)]
    fat_cell = int(np.argmax(np.asarray(fat) @ cents.T, axis=1)[0])
    other = None
    for _ in range(200):
        c = rng.standard_normal(DIM)
        if int(np.argmax(c @ cents.T)) != fat_cell:
            other = c
            break
    vecs = fat + [other, other + 0.001 * rng.standard_normal(DIM)]
    df = _mk(spark, vecs)

    out = semdedup_two_level(df, threshold=0.95, nlist=NLIST, dim=DIM,
                             seed=SEED, max_cell_size=10,
                             sub_nlist=4).collect()
    by_id = {r.vec_id: r for r in out}
    # normal cell: the small pair still collapses to its leader
    assert 40 in by_id and 41 not in by_id
    assert by_id[40].sub_cell is None
    # fat cell: near-identical members land in ONE sub-cell each and
    # collapse there — far fewer than the 40 the cap guard would keep,
    # at least 1 survivor (the lowest id in each occupied sub-cell)
    fat_survivors = [r for r in out if r.cell == fat_cell]
    assert 1 <= len(fat_survivors) <= 4  # ≤ sub_nlist occupied sub-cells
    assert all(r.sub_cell is not None for r in fat_survivors)
    assert min(r.vec_id for r in fat_survivors) == 0
    # survivors of normal cells equal plain semdedup's on those cells
    plain = {(r.vec_id, r.cell)
             for r in semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM,
                               seed=SEED, max_cell_size=0).collect()
             if r.cell != fat_cell}
    two = {(r.vec_id, r.cell) for r in out if r.cell != fat_cell}
    assert two == plain


def test_two_level_vectorized_equals_catalyst(spark):
    """The broadcast-matmul assignment path returns the identical
    two-level survivor set as the literal-Catalyst path (both levels'
    quantizers swap together)."""
    from colly_spark.operators.similarity import semdedup_two_level

    rng = np.random.default_rng(29)
    lead = rng.standard_normal(DIM)
    vecs = ([lead + 0.001 * rng.standard_normal(DIM) for _ in range(30)]
            + list(rng.standard_normal((50, DIM))))
    df = _mk(spark, vecs)
    kw = dict(threshold=0.8, nlist=NLIST, dim=DIM, seed=SEED,
              max_cell_size=10, sub_nlist=4)
    lit = {tuple(r) for r in
           semdedup_two_level(df, assign="catalyst", **kw).collect()}
    vec = {tuple(r) for r in
           semdedup_two_level(df, assign="vectorized", **kw).collect()}
    assert lit == vec


def test_still_fat_sub_cell_reported_and_still_deduped(spark):
    """The residual level-2 exposure, PLANTED: 40 near-identical
    vectors land in one (cell, sub_cell) with max_cell_size=10 — the
    sub-quantizer cannot split a point mass.
    semdedup_two_level_oversized_cells must report exactly that
    (cell, sub_cell, 40); semdedup_two_level itself still DEDUPES it
    (the sub-cell pair join runs, just quadratically in that
    sub-cell) — the report is a cost alarm, not a correctness hole."""
    from colly_spark.operators.similarity import (
        semdedup_two_level, semdedup_two_level_oversized_cells)

    cents = ivf_centroids(DIM, NLIST, SEED)
    rng = np.random.default_rng(5)
    lead = rng.standard_normal(DIM)
    flood = [lead + 1e-4 * rng.standard_normal(DIM) for _ in range(40)]
    fat_cell = int(np.argmax(np.asarray(flood) @ cents.T, axis=1)[0])
    scatter = list(rng.standard_normal((12, DIM)))
    df = _mk(spark, flood + scatter)
    kw = dict(nlist=NLIST, dim=DIM, seed=SEED, max_cell_size=10,
              sub_nlist=4)

    rep = semdedup_two_level_oversized_cells(df, **kw).collect()
    assert len(rep) == 1
    # the flood (plus any scatter vectors sharing its sub-cell) is the
    # one reported sub-cell
    assert rep[0].cell == fat_cell and rep[0].n_members >= 40
    assert rep[0].sub_cell is not None
    # the flood still collapses to its lowest id despite being sub-fat
    out = semdedup_two_level(df, threshold=0.95, **kw).collect()
    flood_survivors = [r.vec_id for r in out
                      if r.cell == fat_cell and r.vec_id < 40]
    assert flood_survivors == [0]
    # and a corpus whose fat cell DOES split cleanly reports nothing
    ok_rep = semdedup_two_level_oversized_cells(
        _mk(spark, scatter), **kw).collect()
    assert ok_rep == []


def test_oversized_report_attached_and_warns(spark):
    """semdedup's truncation is observable from the call itself: the
    returned DataFrame carries the exclusion report as a lazy
    .oversized_cells attribute, and warn_oversized=True raises a
    RuntimeWarning naming the excluded cell count."""
    import warnings

    cents = ivf_centroids(DIM, NLIST, SEED)
    rng = np.random.default_rng(5)
    lead = rng.standard_normal(DIM)
    fat = [lead + 0.001 * rng.standard_normal(DIM) for _ in range(40)]
    fat_cell = int(np.argmax(np.asarray(fat) @ cents.T, axis=1)[0])
    df = _mk(spark, fat)

    out = semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM, seed=SEED,
                   max_cell_size=10)
    rep = [(r.cell, r.n_members) for r in out.oversized_cells.collect()]
    assert rep == [(fat_cell, 40)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM, seed=SEED,
                 max_cell_size=10, warn_oversized=True)
        assert any(issubclass(w.category, RuntimeWarning)
                   and "EXCLUDED" in str(w.message) for w in caught)
    # guard disabled → no report to attach
    assert semdedup(df, threshold=0.95, nlist=NLIST, dim=DIM, seed=SEED,
                    max_cell_size=0).oversized_cells is None
