"""Independent plain-numpy IVF-PQ replica — the golden-oracle source
for `ann_ivfpq` / `ann_ivfpq_refined` (scripts/make_golden.py) and the
equality reference for tests/test_ivfpq.py.

Mirrors operators/pq.py's float operations CALL-FOR-CALL so the replica
is bit-exact, not merely close:

- cell assignment: ``vecs @ ascontiguousarray(centroids.T)`` then
  argmax (ivf_cell_vec's exact matmul form);
- PQ codes: residual einsum + ``‖B‖² − 2 r·B`` argmin (pq_codes_vec);
- ADC: per-query ``einsum("jd,jkd->jk")`` lookup table + per-row
  ``np.dot(q, centroid_cell)`` bias + an m-length table-row sum —
  the batch-shape-INDEPENDENT ops adc_scores deliberately restricts
  itself to, which is what makes a full-array replica of a batched
  engine possible;
- exact re-rank: the JVM left-fold cosine (cosine_expr's
  ``aggregate(zip_with(...))``) replayed as a sequential Python fold,
  rounded with Spark's HALF_UP-on-shortest-repr round(x, 6).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

_Q6 = Decimal("0.000001")


def spark_round6(x: float) -> float:
    """Spark round(double, 6): HALF_UP on the shortest decimal repr."""
    return float(Decimal(repr(float(x))).quantize(_Q6,
                                                  rounding=ROUND_HALF_UP))


def fold_dot(a, b) -> float:
    """cosine_expr's deterministic JVM left-fold dot."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def fold_cosine6(a, b) -> float:
    return spark_round6(
        fold_dot(a, b) / (math.sqrt(fold_dot(a, a))
                          * math.sqrt(fold_dot(b, b))))


def assign_cells(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    ct = np.ascontiguousarray(centroids.T, dtype=np.float64)
    return np.argmax(vecs @ ct, axis=1).astype(np.int32)


def probe_cells(vecs: np.ndarray, centroids: np.ndarray,
                nprobe: int) -> np.ndarray:
    ct = np.ascontiguousarray(centroids.T, dtype=np.float64)
    dots = vecs @ ct
    return np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]


def encode(vecs: np.ndarray, centroids: np.ndarray,
           books: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cells, codes) for every vector — pq_encode's exact rule."""
    m, ksub, dsub = books.shape
    cells = assign_cells(vecs, centroids)
    resid = vecs - np.ascontiguousarray(
        centroids, dtype=np.float64)[cells]
    rs = resid.reshape(len(vecs), m, dsub)
    prod = np.einsum("bjd,jkd->bjk", rs, books)
    d2 = (books * books).sum(axis=2)[None, :, :] - 2.0 * prod
    return cells, d2.argmin(axis=2).astype(np.int32)


def topk(ids: np.ndarray, vecs: np.ndarray, query_ids: np.ndarray,
         centroids: np.ndarray, books: np.ndarray, k: int = 5,
         nprobe: int = 4, refine: int = 0) -> list[tuple]:
    """Rows of ann_ivfpq_topk over a self-query corpus: (query_id,
    neighbor_id, rank, score). refine=0 → score is the raw ADC double;
    refine>0 → top-``refine`` ADC candidates re-ranked by the exact
    6-dp fold cosine."""
    m = books.shape[0]
    dsub = books.shape[2]
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cells, codes = encode(vecs, centroids, books)
    by_id = {int(i): n for n, i in enumerate(ids)}
    qpos = np.array([by_id[int(q)] for q in query_ids])
    probes = probe_cells(vecs[qpos], centroids, nprobe)
    sub_idx = np.arange(m)

    out = []
    for iq, (qi, qid) in enumerate(zip(qpos, query_ids)):
        q = vecs[qi]
        table = np.einsum("jd,jkd->jk", q.reshape(m, dsub), books)
        cand = []
        probe_set = set(int(c) for c in probes[iq])
        for n in range(len(ids)):
            if int(ids[n]) == int(qid) or int(cells[n]) not in probe_set:
                continue
            bias = np.dot(q, cents[cells[n]])
            adc = float(bias + table[sub_idx, codes[n]].sum())
            cand.append((adc, int(ids[n])))
        cand.sort(key=lambda t: (-t[0], t[1]))
        if refine <= 0:
            out.extend((int(qid), nid, r + 1, adc)
                       for r, (adc, nid) in enumerate(cand[:k]))
            continue
        re_rank = [(fold_cosine6(vecs[by_id[nid]], q), nid)
                   for _adc, nid in cand[:refine]]
        re_rank.sort(key=lambda t: (-t[0], t[1]))
        out.extend((int(qid), nid, r + 1, cos)
                   for r, (cos, nid) in enumerate(re_rank[:k]))
    return out
