"""Politeness scheduler — per-domain admission quotas per micro-batch.

Reference semantics (http_backend.go:53-149, 199-211): a LimitRule
matches a host (first-match-wins in registration order); a worker holds
one of ``Parallelism`` per-rule semaphore slots for the whole
``fetch + Delay + rand(RandomDelay)`` window, so the steady-state
per-domain rate is ``parallelism / (service + delay + E[rand])``.

Spark mapping (SURVEY.md §2.5/P1-P2): each micro-batch represents one
simulated politeness window of ``cfg.batch_window_ms``; a domain may
admit at most ``quota(domain)`` requests per batch, in per-domain FIFO
(``seq``) order. The quota is a *pure function* of (host, config) —
computed in a vectorized pandas UDF (no shuffle) — and admission is a
single window:

    row_number() over (partition by host order by seq) <= quota

which is the only shuffle of the admission path (and is unavoidable:
per-domain FIFO *is* a partition-by-host ordering). Deferred rows stay
pending to the next batch — they were already seen-marked at admission
(check-and-mark-before-fetch, colly.go:745-753), exactly like a queued
Colly request holding its dedup mark while waiting on the semaphore.

Hot-domain skew: the window puts one hot domain in one task; that is
semantically required for FIFO admission but bounded work (quota rows
kept per domain). The heavy stages downstream (fetch/extract/decode)
are explicitly round-robin repartitioned after admission so skew never
reaches them (plans/crawler.py).
"""

from __future__ import annotations

import pandas as pd

from colly_spark.config import CrawlConfig


def quota_udf(cfg: CrawlConfig):
    """host → per-batch admission quota (int). Vectorized; the
    first-match-wins rule scan is memoized per distinct host."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _udf(hosts: pd.Series) -> pd.Series:
        memo: dict = {}

        def q(h):
            if h is None:
                return 0
            v = memo.get(h)
            if v is None:
                v = memo[h] = min(cfg.domain_quota(h), 1 << 30)
            return v

        return hosts.map(q).astype("int32")

    return _udf


def with_fetch_now_flag(pending_df, cfg: CrawlConfig, flag_col: str = "_fetch_now",
                        priority_col: str | None = None,
                        skew_salt: int = 0,
                        crawl_delay_col: str | None = None):
    """Append ``flag_col``: True = within this batch's per-domain FIFO
    quota. One window shuffle by host; the crawler fuses this into the
    admission checkpoint so the quota decision costs no extra job.

    ``priority_col``: optional frontier-prioritization seam (the
    PageRank/OPIC scheduling family, operators/graph.py) — when set,
    each domain's quota admits its HIGHEST-priority pending URLs
    first (NULLs last, seq as the tie-break), instead of strict FIFO.
    Reference parity holds for the default: the reference queue is
    FIFO-only (queue/queue.go), so priority is opt-in and absent
    priorities degrade to exact FIFO.

    ``skew_salt`` = S > 1: two-phase salted admission for hot-domain
    skew. The plain window sorts a domain's ENTIRE pending set in one
    task — at a 10^10-URL frontier a hot host with 10^7 queued URLs is
    one straggler task doing an O(n log n) sort for a quota of a few
    rows. Salting splits each host across S tasks by pmod(seq, S),
    takes the per-salt top-quota (every task bounded by its salt
    share), then ranks only the ≤ S·quota survivors per host in the
    second window; losers of phase 1 are flagged False directly (for
    any total order, top-q of the union of per-part top-qs IS the
    global top-q, so the flag is IDENTICAL to the plain window's).
    Cost: a second (tiny) shuffle + a union — only worth it when a
    domain's backlog dwarfs its quota, which is why it is opt-in
    (Crawler(politeness_salt=S))."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [F.col(priority_col).desc_nulls_last(), F.col("seq").asc()] \
        if priority_col else [F.col("seq").asc()]
    q = quota_udf(cfg)(F.col("host"))
    if crawl_delay_col is not None:
        # respect_crawl_delay: a robots-advertised Crawl-delay of
        # cd_ms caps the host at one request per cd_ms — sub-window
        # delays divide the batch quota (window // cd, min 1); the
        # super-window spacing (cd > window → gaps BETWEEN batches)
        # is enforced by the hosthealth block, not here
        win = max(1, cfg.batch_window_ms)
        cd = F.col(crawl_delay_col)
        q_cd = F.greatest(F.lit(1),
                          F.floor(F.lit(win) / cd).cast("int"))
        q = F.when(cd.isNotNull() & (cd > 0), F.least(q, q_cd)).otherwise(q)
    if skew_salt and skew_salt > 1:
        w1 = Window.partitionBy("host", "_salt").orderBy(*order)
        ranked = (pending_df
                  .withColumn("_q", q)
                  .withColumn("_salt", F.pmod(F.col("seq"),
                                              F.lit(skew_salt)))
                  .withColumn("_rn1", F.row_number().over(w1)))
        losers = (ranked.filter(F.col("_rn1") > F.col("_q"))
                  .withColumn(flag_col, F.lit(False)))
        w2 = Window.partitionBy("host").orderBy(*order)
        survivors = (ranked.filter(F.col("_rn1") <= F.col("_q"))
                     .withColumn(flag_col,
                                 F.row_number().over(w2) <= F.col("_q")))
        return (survivors.unionByName(losers)
                .drop("_q", "_salt", "_rn1"))
    w = Window.partitionBy("host").orderBy(*order)
    return pending_df.withColumn(flag_col, F.row_number().over(w) <= q)


def admit_batch(pending_df, cfg: CrawlConfig, skew_salt: int = 0):
    """Split pending rows into (fetch_now, deferred) by per-domain FIFO
    quota. ``pending_df`` must carry ``host`` and ``seq`` columns.
    Returns (fetch_now_df, deferred_df) with original columns."""
    from pyspark.sql import functions as F

    cols = pending_df.columns
    flagged = with_fetch_now_flag(pending_df, cfg, skew_salt=skew_salt)
    fetch_now = flagged.filter(F.col("_fetch_now")).select(cols)
    deferred = flagged.filter(~F.col("_fetch_now")).select(cols)
    return fetch_now, deferred


def recrawl_schedule(history_df, id_col: str = "url_hash",
                     changed_col: str = "changed"):
    """Freshness-driven revisit scheduling (Cho & Garcia-Molina 2003,
    "Effective page refresh policies for web crawlers"): estimate each
    page's Poisson change rate from its binary change history with the
    paper's consistent estimator

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5))

    (n observations at unit interval, X observed changes; the +0.5
    terms are the paper's bias correction that also keeps the log
    finite at X = n), and schedule the next revisit proportionally at
    interval 1/lambda_hat (NULL for never-changed pages — they fall to
    the uniform-policy floor the caller picks). The reference crawls
    once and exposes max_revisits (storage.go visited counts); at a
    10^10-URL frontier the revisit BUDGET is the scarce resource and
    this is the standard allocator.

    Pure Catalyst: one groupBy(id) — uniform key, map-side partials;
    rounding discipline per operators/graph.py so the DuckDB oracle is
    bit-equal (ln on identical doubles, same IEEE-libm parity as
    lm_perplexity).

    Returns (id_col, n_obs, n_changed, lambda_hat, revisit_interval).
    """
    from pyspark.sql import functions as F

    g = (history_df.groupBy(id_col)
         .agg(F.count("*").cast("long").alias("n_obs"),
              F.sum(F.col(changed_col).cast("long")).cast("long")
              .alias("n_changed")))
    lam = F.round(
        -F.log((F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
               / (F.col("n_obs") + F.lit(0.5))), 9)
    return (g.withColumn("lambda_hat", lam)
            .withColumn(
                "revisit_interval",
                F.when(F.col("n_changed") > 0,
                       F.round(F.lit(1.0) / F.col("lambda_hat"), 6))))
