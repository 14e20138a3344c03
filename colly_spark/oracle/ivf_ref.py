"""Independent numpy/decimal replica of the IVF-Flat paths — the
golden-oracle source for `ann_ivf_trained` and `ann_ivf_prod`
(scripts/make_golden.py) and the equality reference for
tests/test_ann_training.py.

Mirrors operators/similarity.py's float operations CALL-FOR-CALL so
the replica is bit-exact, not merely close:

- seeded init: ivf_centroids' Gaussian draw + row normalization,
  re-derived here from numpy's seeded Generator (not imported — the
  replica stays independent of the engine module);
- training (`train_kmeans`): the spherical Lloyd loop of
  ivf_train_kmeans(..., exact=True). Spark's order-stability trick is
  the repo's engine-neutral float discipline (operators/classifier.py):
  each coordinate is round(x, 12) in double then summed as
  DECIMAL(38,18) — an ORDER-INDEPENDENT exact sum. The replica replays
  round(x, 12) as HALF_UP on the shortest decimal repr (Spark's
  BigDecimal.valueOf round) and accumulates python Decimals, then runs
  the SAME driver-side numpy mean/renormalize lines on the recovered
  doubles, so the trained matrix matches bit-for-bit;
- serving (`ivf_topk`): ann_ivf_topk's assign="vectorized" plan —
  matmul-argmax cell assignment (ivfpq_ref.assign_cells), stable
  argsort probe lists (probe_cells), the JVM left-fold cosine rounded
  HALF_UP at 6 dp (fold_cosine6), rank by (cos desc, neighbor_id);
- `widen_256`: q_ann_ivf_prod's deterministic 64→256 widening
  (concat(v, reverse(v), v*0.5+0.25, -v) on doubles) — elementwise
  IEEE ops, identical in numpy.

Reference parity note: the trained coarse quantizer replaces Colly's
in-memory visited/storage layer with no analogue — it belongs to the
LLM-data-pipeline surface (SemDeDup/IVF serving), not the crawl core.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from .ivfpq_ref import assign_cells, fold_cosine6, probe_cells

_Q12 = Decimal("1e-12")


def spark_round12(x: float) -> Decimal:
    """Spark round(double, 12): HALF_UP on the shortest decimal repr,
    kept as a Decimal (the value DECIMAL(38,18) stores exactly)."""
    return Decimal(repr(float(x))).quantize(_Q12, rounding=ROUND_HALF_UP)


def init_centroids(dim: int, nlist: int, seed: int = 7) -> np.ndarray:
    """ivf_centroids' seeded draw, re-derived."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((nlist, dim)).astype(np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_kmeans(vecs: np.ndarray, nlist: int, n_iter: int,
                 dim: int, seed: int = 7) -> np.ndarray:
    """ivf_train_kmeans(..., exact=True) replayed without Spark."""
    cents = init_centroids(dim, nlist, seed)
    v = np.asarray(vecs, dtype=np.float64)
    n, _ = v.shape
    for _ in range(n_iter):
        cells = assign_cells(v, cents)
        acc = [[Decimal(0)] * dim for _ in range(nlist)]
        counts = np.zeros(nlist)
        for i in range(n):
            c = int(cells[i])
            counts[c] += 1
            row = acc[c]
            for p in range(dim):
                row[p] += spark_round12(v[i, p])
        sums = np.zeros((nlist, dim))
        for c in range(nlist):
            for p in range(dim):
                sums[c, p] = float(acc[c][p])
        # identical driver-side numpy lines as ivf_train_kmeans
        nxt = cents.copy()
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(nxt, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = nxt / norms
    return cents


def ivf_topk(ids: np.ndarray, vecs: np.ndarray, query_ids: np.ndarray,
             centroids: np.ndarray, k: int = 5,
             nprobe: int = 2) -> list[tuple]:
    """Rows of ann_ivf_topk(assign="vectorized") over a self-query
    corpus: (query_id, neighbor_id, rank, cos_sim)."""
    v = np.asarray(vecs, dtype=np.float64)
    cells = assign_cells(v, centroids)
    by_id = {int(i): n for n, i in enumerate(ids)}
    qpos = np.array([by_id[int(q)] for q in query_ids])
    probes = probe_cells(v[qpos], centroids, nprobe)
    out = []
    for iq, (qi, qid) in enumerate(zip(qpos, query_ids)):
        probe_set = {int(c) for c in probes[iq]}
        cand = []
        for nn in range(len(ids)):
            if int(ids[nn]) == int(qid) or int(cells[nn]) not in probe_set:
                continue
            cand.append((fold_cosine6(v[nn], v[qi]), int(ids[nn])))
        cand.sort(key=lambda t: (-t[0], t[1]))
        out.extend((int(qid), nid, r + 1, cos)
                   for r, (cos, nid) in enumerate(cand[:k]))
    return out


def widen_256(vecs: np.ndarray) -> np.ndarray:
    """q_ann_ivf_prod's deterministic 64→256 widening on doubles."""
    v = np.asarray(vecs, dtype=np.float64)
    return np.concatenate([v, v[:, ::-1], v * 0.5 + 0.25, -v], axis=1)
