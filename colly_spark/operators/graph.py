"""Distributed PageRank (Page et al. 1999) over a link graph — the
crawl-scheduling use: score frontier hosts/URLs by link authority so
the politeness budget is spent on high-value pages first (the
OPIC/PageRank frontier-prioritization family used by production
crawlers; the reference's queue is FIFO-only, this is the scale-path
extension).

Power iteration, one round = one equi-join + one groupBy:

    p_{k+1}(v) = (1-d)/N + d * (Σ_{u→v} p_k(u)/outdeg(u) + dangling/N)

Scale shape at 100 TB (10^10-edge graphs):

- the edge list is the only big table; each round shuffles it once,
  keyed by dst (groupBy sum of contributions) after a join keyed by
  src — both equi-joins, AQE-skew-splittable (hub pages are the skew
  risk and exactly what AQE's skew-join handles);
- the rank vector (one row per node) localCheckpoints per round so
  lineage is O(1) in n_iter, and the dangling-mass term is a 1-row
  broadcast aggregate, not a driver action;
- N (node count) is computed once up front — the single scalar action.

Engine-neutral float discipline (same as operators/dsir.py): every
per-round quantity is rounded to 12 dp and carried as DECIMAL —
contributions sum exactly (order-independent), so after any number of
rounds the Spark vector and the DuckDB oracle (the same recurrence
unrolled as CTEs) are bit-equal.
"""

from __future__ import annotations

DEFAULT_DAMPING = 0.85
DEFAULT_ITERS = 8
_DEC = "decimal(28,14)"


def pagerank(edges, n_iter: int = DEFAULT_ITERS,
             damping: float = DEFAULT_DAMPING,
             src_col: str = "src", dst_col: str = "dst",
             exact: bool = True):
    """PageRank over an edge DataFrame. Nodes = distinct src ∪ dst;
    dangling nodes (no out-edges) spread their mass uniformly.
    Returns (node, pr) as DOUBLE.

    ``exact=True`` (oracle-harness default) rounds each per-round
    quantity to 12 dp and sums as DECIMAL — order-independent and
    bit-equal to the unrolled DuckDB recurrence. ``exact=False`` is
    the production mode: native double sums, same plan shape (one
    edge join + one groupBy per round), no DECIMAL tax; ranks differ
    from the oracle only by float-sum-ordering noise.
    scripts/exact_vs_float_bench.py records the A/B timing."""
    from pyspark.sql import functions as F

    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()  # the one scalar action
    d = float(damping)

    # exact mode: F.round (HALF_UP) matches DuckDB's half-away-from-
    # zero on positives; Python round() would not
    r12 = ((lambda c: F.round(c, 12).cast(_DEC)) if exact
           else (lambda c: c))
    zero = F.lit(0).cast(_DEC) if exact else F.lit(0.0)

    outdeg = e.groupBy("src").agg(F.count("*").alias("odeg"))
    # odeg rides the rank vector so each round is one join with the
    # edge list, not two
    p = (nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
         .select("node", F.coalesce("odeg", F.lit(0)).alias("odeg"),
                 r12(F.lit(1.0 / n)).alias("p"))
         .localCheckpoint())

    for _ in range(n_iter):
        contrib = (e.join(p, e["src"] == p["node"])
                   .filter(F.col("odeg") > 0)
                   .select("dst",
                           r12(F.col("p").cast("double")
                               / F.col("odeg")).alias("c")))
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        dang = (p.filter(F.col("odeg") == 0)
                .agg(F.coalesce(F.sum("p"), zero).alias("dm")))
        p = (p.join(insum, p["node"] == insum["dst"], "left")
             .crossJoin(F.broadcast(dang))
             .select(
                 "node", "odeg",
                 r12(F.lit((1.0 - d) / n)
                     + F.lit(d)
                     * (F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + r12(F.col("dm").cast("double") / F.lit(n))
                        .cast("double"))).alias("p"))
             .localCheckpoint())
    return p.select("node", F.col("p").cast("double").alias("pr"))


def pagerank_sql(edges_cte: str, n_iter: int = DEFAULT_ITERS,
                 damping: float = DEFAULT_DAMPING,
                 n_expr: str = "(SELECT count(*) FROM nodes)") -> str:
    """DuckDB oracle: the identical recurrence unrolled as CTEs.
    ``edges_cte`` must define ``e(src, dst)`` (already distinct).
    Emits nodes/odeg CTEs plus p0..p{n_iter}; final SELECT is
    (node, pr) ordered by node."""
    # every CTE is MATERIALIZED: p{k} is referenced three times per
    # round (directly, via s{k}, via d{k}), so DuckDB's default CTE
    # inlining would build a 3^n_iter-way plan that re-opens the
    # source parquet thousands of times (observed as EMFILE)
    d = float(damping)
    parts = [f"""nodes AS MATERIALIZED (SELECT DISTINCT node FROM
           (SELECT src AS node FROM e UNION SELECT dst FROM e)),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
odeg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS odeg
                      FROM e GROUP BY 1),
p0 AS MATERIALIZED (SELECT node, coalesce(odeg, 0) AS odeg,
              round(1.0 / n, 12)::DECIMAL(28,14) AS p
       FROM nodes LEFT JOIN odeg ON node = src, nn)"""]
    for k in range(n_iter):
        parts.append(f"""c{k} AS MATERIALIZED (SELECT dst,
        round(CAST(p AS DOUBLE) / odeg, 12)::DECIMAL(28,14) AS c
        FROM e JOIN p{k} ON src = node WHERE odeg > 0),
s{k} AS MATERIALIZED (SELECT dst, sum(c) AS s FROM c{k} GROUP BY 1),
d{k} AS MATERIALIZED (SELECT coalesce(sum(p), 0::DECIMAL(28,14)) AS dm
         FROM p{k} WHERE odeg = 0),
p{k + 1} AS MATERIALIZED (SELECT node, odeg,
        round({(1.0 - d)!r} / n + {d!r}
              * (coalesce(CAST(s AS DOUBLE), 0.0)
                 + round(CAST(dm AS DOUBLE) / n, 12)),
              12)::DECIMAL(28,14) AS p
        FROM p{k} LEFT JOIN s{k} ON node = dst, d{k}, nn)""")
    body = ",\n".join(parts)
    return (f"WITH {edges_cte},\n{body}\n"
            f"SELECT node, CAST(p AS DOUBLE) AS pr FROM p{n_iter} "
            f"ORDER BY node")
