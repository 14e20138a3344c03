"""PageRank (operators/graph.py) vs an independent numpy replica of
the exact DECIMAL-rounded recurrence, plus structural properties.

Pins:
- per-node equality with the replica on a random graph with dangling
  nodes, hubs, and self-loops;
- mass conservation (Σ pr = 1 exactly under the rounding discipline,
  up to the rounded residue);
- a hand-checked 3-node KAT;
- determinism across runs.
"""

from decimal import ROUND_HALF_UP, Decimal

from colly_spark.operators.graph import pagerank

D = 0.85
_Q12 = Decimal("1e-12")


def _r12(x: float) -> Decimal:
    """Spark's round(double, 12): HALF_UP on the SHORTEST decimal repr
    (BigDecimal.valueOf semantics) — NOT Python round()'s half-even on
    the exact binary value; the two differ ~1e-12 on near-tie values."""
    return Decimal(repr(float(x))).quantize(_Q12, rounding=ROUND_HALF_UP)


def _replica(edges, n_iter):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    p = {v: _r12(1.0 / n) for v in nodes}
    for _ in range(n_iter):
        contrib = {}
        for s, t in edges:
            c = _r12(float(p[s]) / outdeg[s])
            contrib[t] = contrib.get(t, Decimal(0)) + c
        dang = sum((p[v] for v in nodes if v not in outdeg), Decimal(0))
        share = float(_r12(float(dang) / n))
        p = {v: _r12((1.0 - D) / n
                     + D * (float(contrib.get(v, Decimal(0))) + share))
             for v in nodes}
    return {v: float(p[v]) for v in nodes}


def _run(spark, edges, n_iter=8):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.pr for r in pagerank(df, n_iter=n_iter).collect()}


def test_matches_replica_random_graph(spark):
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    edges += [(i, 0) for i in range(1, 12)]          # hub
    edges += [(7, 7)]                                # self-loop
    edges = [(s, t) for s, t in edges if s % 9 != 0]  # dangling 0,9,18,27,36
    got = _run(spark, edges)
    exp = _replica(edges, 8)
    assert got == exp
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_three_node_kat(spark):
    # 0->1, 1->2, 2->0: symmetric ring, stationary pr = 1/3 each
    got = _run(spark, [(0, 1), (1, 2), (2, 0)], n_iter=5)
    assert got == {0: 1 / 3, 1: 1 / 3, 2: 1 / 3} or all(
        abs(v - 1 / 3) < 1e-12 for v in got.values())
    # 0->2, 1->2: sinks mass into 2 (dangling), which redistributes
    got2 = _run(spark, [(0, 2), (1, 2)], n_iter=8)
    assert got2[2] > got2[0] == got2[1]
    assert abs(sum(got2.values()) - 1.0) < 1e-9


def test_deterministic(spark):
    edges = [(i, (i * 3 + 1) % 13) for i in range(13)]
    assert _run(spark, edges) == _run(spark, edges)


def test_float_mode_close_to_exact(spark):
    """exact=False (native doubles) lands within float-ordering noise
    of the DECIMAL path and preserves the rank ordering on the KAT
    graph."""
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long")
    ex = {r.node: r.pr for r in pagerank(df, n_iter=8).collect()}
    fl = {r.node: r.pr for r in
          pagerank(df, n_iter=8, exact=False).collect()}
    assert set(ex) == set(fl)
    for n in ex:
        assert abs(ex[n] - fl[n]) < 1e-9
    assert (sorted(ex, key=ex.get) == sorted(fl, key=fl.get))
