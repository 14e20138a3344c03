"""DSIR importance resampling (operators/dsir.py).

Pins:
- the Spark pipeline matches an independent pure-Python replica of
  the exact rule (hashed-gram Lidstone models, decimal-rounded log
  ratios, deterministic Gumbel, top-k) on synthetic docs;
- the selection is enriched in the target slice (the operator's whole
  point: target-looking docs are over-represented vs the corpus rate);
- rank is deterministic across runs.
"""

import math
from decimal import Decimal

from colly_spark.functions.urlnorm import fnv64a_bytes
from colly_spark.operators.dsir import GUMBEL_MOD, dsir_select

B, ALPHA, SEED = 64, 0.1, 17

DOCS = [
    # target-ish docs repeat "good clean prose" vocabulary
    (0, "good clean prose flows well and reads well", True),
    (1, "clean prose reads well good prose flows", True),
    (2, "good prose good prose clean and clean", True),
    # raw junk repeats "spam click buy" vocabulary
    (3, "spam click buy now spam click buy now", False),
    (4, "buy spam buy spam click click now", False),
    (5, "click now buy spam now now click", False),
    # mixed
    (6, "good prose spam click and well now", False),
    (7, "clean reads buy now flows spam", False),
    (8, "", False),
    (9, "good clean reads flows prose well and", False),
]


def _grams(text):
    toks = [t.lower() for t in text.strip().split()] or [""]
    if text.strip() == "":
        toks = [""]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bkt(gram):
    return fnv64a_bytes(gram.encode()) % B


def _replica(docs, k):
    cq, cp = {}, {}
    for _i, text, is_t in docs:
        for g in _grams(text):
            b = _bkt(g)
            cq[b] = cq.get(b, 0) + 1
            if is_t:
                cp[b] = cp.get(b, 0) + 1
    nq, np_ = sum(cq.values()), sum(cp.values())
    lr = {b: Decimal(str(round(
        math.log(((cp.get(b, 0) + ALPHA) / (np_ + ALPHA * B))
                 / ((c + ALPHA) / (nq + ALPHA * B))), 9)))
        for b, c in cq.items()}
    out = []
    for i, text, _ in docs:
        grams = _grams(text)
        logw = sum((lr[_bkt(g)] for g in grams), Decimal(0))
        h = fnv64a_bytes(f"{i}:gumbel:{SEED}".encode()) % GUMBEL_MOD
        u = (h + 0.5) / GUMBEL_MOD
        gum = Decimal(str(round(-math.log(-math.log(u)), 9)))
        out.append((i, len(grams), logw, logw + gum))
    out.sort(key=lambda r: (-r[3], r[0]))
    return [(i, n, float(w), float(key), rank + 1)
            for rank, (i, n, w, key) in enumerate(out[:k])]


def _mk(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, is_t boolean")


def test_matches_python_replica(spark):
    got = [tuple(r) for r in
           dsir_select(_mk(spark), "is_t", k=6, buckets=B, alpha=ALPHA,
                       seed=SEED).orderBy("rank").collect()]
    assert got == _replica(DOCS, 6)


def test_target_enrichment(spark):
    # select half the corpus: the 3 target docs + the target-like doc 9
    # must all survive ahead of the spam cluster
    got = dsir_select(_mk(spark), "is_t", k=5, buckets=B, alpha=ALPHA,
                      seed=SEED).collect()
    chosen = {r.doc_id for r in got}
    assert {0, 1, 2, 9} <= chosen
    assert not {3, 4, 5} & chosen


def test_deterministic(spark):
    df = _mk(spark)
    a = [tuple(r) for r in dsir_select(df, "is_t", k=7, buckets=B,
                                       seed=SEED).orderBy("rank").collect()]
    b = [tuple(r) for r in dsir_select(df, "is_t", k=7, buckets=B,
                                       seed=SEED).orderBy("rank").collect()]
    assert a == b


def test_planted_register_enrichment(spark):
    """ROADMAP round-4 #1c (DSIR half): targeting the planted formal
    register, the selected top-100 is overwhelmingly formal-register
    docs (even doc_ids) — enrichment >=0.9 against the 0.5 base rate
    the weak lang label could never separate."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    res = entry.queries()["dsir_planted"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(res) == 100
    enrich = sum(r.doc_id % 2 == 0 for r in res) / len(res)
    assert enrich >= 0.9


def test_float_mode_same_selection(spark):
    """exact=False (native doubles) selects the same documents in the
    same rank order on the planted fixture — the DECIMAL discipline
    buys oracle bit-equality, not different answers."""
    a = [(r.doc_id, r.rank) for r in
         dsir_select(_mk(spark), "is_t", k=6, buckets=B, alpha=ALPHA,
                     seed=SEED).orderBy("rank").collect()]
    b = [(r.doc_id, r.rank) for r in
         dsir_select(_mk(spark), "is_t", k=6, buckets=B, alpha=ALPHA,
                     seed=SEED, exact=False).orderBy("rank").collect()]
    assert a == b
