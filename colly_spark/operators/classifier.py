"""FastText-style quality-classifier TRAINING + scoring: distributed
logistic regression over hashed n-gram frequency features — the
learned quality filter of the GPT-3/LLaMA-family data pipelines
(Brown et al. 2020 §A trains exactly this shape against a
WebText-positive/common-crawl-negative split, then keeps documents by
score; fastText: Joulin et al. 2017).

Full-batch gradient descent, one round = two shuffles:

    margin_i = Σ_b x_ib · w_k[b]           (join grams→w, groupBy doc)
    resid_i  = y_i − σ(margin_i)
    w_{k+1}[b] = w_k[b] + lr/N · Σ_i x_ib · resid_i
                                           (join grams→resid, groupBy b)

with x_ib = (gram occurrences of doc i in bucket b) / (grams of doc i)
— the same FNV-hashed unigram+bigram features as operators/dsir.py
(gram_stream is shared).

Scale shape at 100 TB:

- the gram-bucket table is built ONCE (one explode + one
  groupBy(doc, bucket)) and reused every round;
- the weight vector (≤ buckets rows) broadcasts into the margin join;
  the residual vector (one row per doc) shuffles by doc id (uniform);
- per round the only driver traffic is nothing at all — w stays a
  DataFrame, localCheckpoint'ed so lineage is O(1) in n_iter;
- scoring is the margin join alone (map-side after the broadcast).

Engine-neutral float discipline (operators/graph.py's): every product
is rounded to 12 dp and summed as DECIMAL, so margins, gradients, and
weights are bit-equal to the DuckDB oracle that unrolls the same
recurrence as MATERIALIZED CTEs. σ uses exp() on identical doubles
(same IEEE-libm parity the lm_perplexity oracle already relies on).
"""

from __future__ import annotations

DEFAULT_BUCKETS = 64
DEFAULT_ITERS = 5
# full-batch GD: the gradient is averaged over N docs whose feature
# rows each sum to 1, so per-feature steps are ~lr/N · O(1/buckets);
# lr is correspondingly large (a separable corpus converges in ~10
# rounds at this setting — tests/test_classifier.py)
DEFAULT_LR = 200.0
_DEC = "decimal(28,14)"


def doc_features(docs, label_col: str, buckets: int = DEFAULT_BUCKETS,
                 id_col: str = "doc_id", text_col: str = "text"):
    """(id, y, bkt, x): per-document hashed-gram frequency features.
    x = bucket occurrences / total grams of the doc (so Σ_b x_ib = 1
    and the margin scale is corpus-size-free)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from colly_spark.functions.udfs import fnv64a_udf
    from colly_spark.operators.dsir import gram_stream

    g = (gram_stream(docs, id_col, text_col, extra_cols=(label_col,))
         .withColumn("bkt", F.pmod(fnv64a_udf(F.col("gram")),
                                   F.lit(buckets))))
    cnt = (g.groupBy("id", label_col, "bkt")
           .agg(F.count("*").alias("cb")))
    tot = Window.partitionBy("id")
    return (cnt
            .withColumn("nt", F.sum("cb").over(tot))
            .select("id",
                    F.col(label_col).cast("double").alias("y"),
                    "bkt",
                    (F.col("cb").cast("double")
                     / F.col("nt").cast("double")).alias("x")))


def train_classifier(feats, n_iter: int = DEFAULT_ITERS,
                     lr: float = DEFAULT_LR, exact: bool = True):
    """Full-batch GD on logistic loss over ``doc_features`` output.
    Returns the weight DataFrame (bkt, w).

    ``exact=True`` (the oracle-harness default) carries every sum as
    round-12 DECIMAL — order-independent, bit-equal to the DuckDB
    recurrence, and the documented price of a hard oracle.
    ``exact=False`` is the production mode: native doubles end to end
    (no per-term round, no DECIMAL) — the same plan shape (broadcast-w
    join + two groupBys per round) minus the DECIMAL tax; results
    differ from the oracle only in float-sum ordering noise.
    tests/test_classifier.py pins that the planted-corpus accuracy
    holds on both modes; scripts/exact_vs_float_bench.py records the
    A/B timing in BENCH.md."""
    from pyspark.sql import functions as F

    n = feats.select("id").distinct().count()  # the one scalar action
    feats = feats.localCheckpoint()

    if exact:
        msum = lambda: F.sum(  # noqa: E731
            F.round(F.col("x") * F.col("w").cast("double"), 12)
            .cast(_DEC))
        w0 = F.lit(0).cast(_DEC)
    else:
        msum = lambda: F.sum(F.col("x") * F.col("w"))  # noqa: E731
        w0 = F.lit(0.0)
    w = (feats.select("bkt").distinct()
         .select("bkt", w0.alias("w"))
         .localCheckpoint())
    for _ in range(n_iter):
        margin = (feats.join(F.broadcast(w), "bkt")
                  .groupBy("id", "y")
                  .agg(msum().alias("m")))
        sigma = (F.lit(1.0)
                 / (F.lit(1.0) + F.exp(-F.col("m").cast("double"))))
        resid = margin.select(
            "id",
            (F.round(F.col("y") - sigma, 12) if exact
             else (F.col("y") - sigma)).alias("r"))
        gterm = (F.round(F.col("x") * F.col("r"), 12).cast(_DEC)
                 if exact else F.col("x") * F.col("r"))
        grad = (feats.join(resid, "id")
                .groupBy("bkt")
                .agg(F.sum(gterm).alias("g")))
        step = (F.col("w").cast("double")
                + F.lit(lr / n)
                * F.coalesce(F.col("g").cast("double"), F.lit(0.0)))
        w = (w.join(grad, "bkt", "left")
             .select("bkt",
                     (F.round(step, 12).cast(_DEC) if exact
                      else step).alias("w"))
             .localCheckpoint())
    return w


def score_documents(feats, w, exact: bool = True):
    """(id, label, score, predicted): σ(margin) under trained weights,
    rounded to 6 dp for engine-neutral hashing. ``exact=False`` sums
    margins as native doubles (train_classifier's production mode —
    without it the float mode would still pay one DECIMAL aggregation
    pass here)."""
    from pyspark.sql import functions as F

    msum = (F.sum(F.round(F.col("x") * F.col("w").cast("double"), 12)
                  .cast(_DEC)) if exact
            else F.sum(F.col("x") * F.col("w")))
    margin = (feats.join(F.broadcast(w), "bkt")
              .groupBy("id", "y")
              .agg(msum.alias("m")))
    score = F.round(F.lit(1.0) / (F.lit(1.0)
                                  + F.exp(-F.col("m").cast("double"))), 6)
    return margin.select("id",
                         (F.col("y") > 0.5).alias("label"),
                         score.alias("score"),
                         (score > 0.5).alias("predicted"))


def quality_classifier(docs, label_col: str, n_iter: int = DEFAULT_ITERS,
                       lr: float = DEFAULT_LR,
                       buckets: int = DEFAULT_BUCKETS,
                       id_col: str = "doc_id", text_col: str = "text",
                       exact: bool = True):
    """End-to-end: featurize, train on the full corpus, score every
    document. Returns (id_col, label, score, predicted).
    ``exact=False`` = train_classifier's float production mode."""
    from pyspark.sql import functions as F

    feats = doc_features(docs, label_col, buckets, id_col, text_col)
    w = train_classifier(feats, n_iter, lr, exact=exact)
    return (score_documents(feats, w, exact=exact)
            .select(F.col("id").alias(id_col), "label", "score",
                    "predicted"))


# image-admission features: (stat column, fixed scale). Scales are
# data-INDEPENDENT constants chosen so x is O(1) (luma/sharpness are
# 0..255-ish, contrast ≤ 127.5, entropy ≤ 8 bits) — a data-dependent
# standardization would need an extra pass and poison the oracle.
# The final ("", 0) entry is the intercept (x = 1).
IMAGE_FEATS = (("mean_luma", 256.0), ("contrast", 64.0),
               ("entropy", 8.0), ("sharpness", 256.0), ("", 0.0))


def image_features(stats_df, label_col: str = "y",
                   id_col: str = "image_id"):
    """(id, y, bkt, x): dense pixel-stat features (operators/
    multimodal.image_stats output + a double label column) in
    train_classifier's layout — bkt is the feature ordinal, x the
    fixed-scale-normalized stat, plus an intercept feature (the
    threshold-shaped quality labels are not separable through the
    origin). decode-failed rows carry no stats and are excluded (an
    admission pipeline gates them before scoring)."""
    from pyspark.sql import functions as F

    entries = [
        F.struct(F.lit(i).alias("bkt"),
                 (F.lit(1.0) if not c else
                  F.col(c).cast("double") / F.lit(s)).alias("x"))
        for i, (c, s) in enumerate(IMAGE_FEATS)]
    return (stats_df.filter(F.col("decode_ok"))
            .select(F.col(id_col).alias("id"),
                    F.col(label_col).cast("double").alias("y"),
                    F.explode(F.array(*entries)).alias("e"))
            .select("id", "y", F.col("e.bkt").alias("bkt"),
                    F.col("e.x").alias("x")))


def image_quality_classifier(stats_df, label_col: str = "y",
                             n_iter: int = DEFAULT_ITERS,
                             lr: float = DEFAULT_LR,
                             id_col: str = "image_id",
                             exact: bool = True):
    """The image twin of quality_classifier (the learned half of a
    LAION-style admission gate; the reference treats image bytes as
    opaque — response.go:189-194 — so this is pipeline surface, not
    parity): train logistic weights over decoded pixel statistics,
    score every image. Identical distributed shape — the feature
    table is 5 rows/image, the weight vector is 5 rows total."""
    from pyspark.sql import functions as F

    feats = image_features(stats_df, label_col, id_col)
    w = train_classifier(feats, n_iter, lr, exact=exact)
    return (score_documents(feats, w, exact=exact)
            .select(F.col("id").alias(id_col), "label", "score",
                    "predicted"))


def image_classifier_sql(stats_cte: str, label_sql: str,
                         n_iter: int = DEFAULT_ITERS,
                         lr: float = DEFAULT_LR) -> str:
    """DuckDB oracle for image_quality_classifier: ``stats_cte`` must
    define ``s(image_id, mean_luma, contrast, entropy, sharpness)``
    (decode_ok rows only); ``label_sql`` is the double label
    expression over s's columns."""
    unions = []
    for i, (c, s) in enumerate(IMAGE_FEATS):
        x = "1.0" if not c else f"CAST({c} AS DOUBLE) / {s!r}"
        unions.append(f"SELECT image_id AS id, ({label_sql}) AS y,"
                      f" {i} AS bkt, {x} AS x FROM s")
    prefix = (f"{stats_cte},\nf AS MATERIALIZED (\n  "
              + "\n  UNION ALL\n  ".join(unions) + ")")
    return gd_sql(prefix, n_iter, lr, id_out="image_id")


def classifier_sql(docs_cte: str, fnv_bkt: str, n_iter: int = DEFAULT_ITERS,
                   lr: float = DEFAULT_LR) -> str:
    """DuckDB oracle: the identical recurrence unrolled. ``docs_cte``
    must define ``t(id, y, tk)`` (id, double label, token array);
    ``fnv_bkt`` is the bucket expression over column ``gram``. All
    CTEs MATERIALIZED (same 3^k-inlining hazard as pagerank_sql)."""
    prefix = f"""{docs_cte},
g0 AS MATERIALIZED (
  SELECT id, y, tk[i] AS gram FROM t, UNNEST(range(1, len(tk) + 1)) u(i)
  UNION ALL
  SELECT id, y, tk[i] || ' ' || tk[i + 1] FROM t,
         UNNEST(range(1, len(tk))) u(i)),
gb AS MATERIALIZED (SELECT id, y, {fnv_bkt} AS bkt, count(*) AS cb
                    FROM g0 GROUP BY 1, 2, 3),
f AS MATERIALIZED (SELECT id, y, bkt,
          CAST(cb AS DOUBLE) / CAST(sum(cb) OVER (PARTITION BY id)
                                    AS DOUBLE) AS x
       FROM gb)"""
    return gd_sql(prefix, n_iter, lr)


def gd_sql(feats_ctes: str, n_iter: int = DEFAULT_ITERS,
           lr: float = DEFAULT_LR, id_out: str = "doc_id") -> str:
    """The GD recurrence + scoring tail of the DuckDB oracle, unrolled
    over ANY prefix CTE chain whose last CTE is ``f(id, y, bkt, x)``
    (``feats_ctes`` goes verbatim after WITH; names nn/w*/m*/r*/gr*/fm
    are reserved). Shared by the text (hashed-gram) and image
    (pixel-stat) classifier oracles — one recurrence, two feature
    front-ends, exactly like train_classifier itself."""
    parts = [f"""{feats_ctes},
nn AS MATERIALIZED (SELECT count(DISTINCT id)::BIGINT AS n FROM f),
w0 AS MATERIALIZED (SELECT DISTINCT bkt, 0::DECIMAL(28,14) AS w FROM f)"""]
    for k in range(n_iter):
        parts.append(f"""m{k} AS MATERIALIZED (
  SELECT f.id, f.y, sum(round(f.x * CAST(w AS DOUBLE), 12)
                        ::DECIMAL(28,14)) AS m
  FROM f JOIN w{k} USING (bkt) GROUP BY 1, 2),
r{k} AS MATERIALIZED (
  SELECT id, round(y - 1.0 / (1.0 + exp(-CAST(m AS DOUBLE))), 12) AS r
  FROM m{k}),
gr{k} AS MATERIALIZED (
  SELECT bkt, sum(round(f.x * r, 12)::DECIMAL(28,14)) AS g
  FROM f JOIN r{k} USING (id) GROUP BY 1),
w{k + 1} AS MATERIALIZED (
  SELECT w{k}.bkt,
         round(CAST(w AS DOUBLE) + {lr!r} / n
               * coalesce(CAST(g AS DOUBLE), 0.0), 12)
         ::DECIMAL(28,14) AS w
  FROM w{k} LEFT JOIN gr{k} ON w{k}.bkt = gr{k}.bkt, nn)""")
    body = ",\n".join(parts)
    return f"""WITH {body},
fm AS MATERIALIZED (
  SELECT f.id, f.y, sum(round(f.x * CAST(w AS DOUBLE), 12)
                        ::DECIMAL(28,14)) AS m
  FROM f JOIN w{n_iter} USING (bkt) GROUP BY 1, 2)
SELECT id AS {id_out}, y > 0.5 AS label,
       round(1.0 / (1.0 + exp(-CAST(m AS DOUBLE))), 6) AS score,
       round(1.0 / (1.0 + exp(-CAST(m AS DOUBLE))), 6) > 0.5 AS predicted
FROM fm ORDER BY {id_out}"""
