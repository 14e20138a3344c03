"""Text analysis for training-data curation — pure Catalyst versions.

Language-ID, quality scoring, token counting and fingerprinting over a
crawled document corpus. Everything here is built from JVM-side
``pyspark.sql.functions`` (split/filter/transform/aggregate) — zero
Python in the hot path, whole-stage-codegen'd, so these run at scan
speed over 100 TB. Each has an exactly-equivalent ANSI-SQL oracle
(__spark_entry__.py) — the heuristics are deliberately expressible in
both engines so correctness is hash-checkable.
"""

from __future__ import annotations

# marker words per language for the stopword-hit language heuristic;
# deliberately tiny + deterministic (parity with the SQL oracle, which
# inlines the same lists)
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "de": ("der", "die", "das", "und", "ist"),
}


def tokens_expr(text_col):
    from pyspark.sql import functions as F

    return F.split(F.trim(text_col), r"\s+")


def token_count_expr(text_col):
    from pyspark.sql import functions as F

    return F.size(tokens_expr(text_col))


def distinct_ratio_expr(text_col):
    """lexical diversity: distinct tokens / tokens, 6 dp."""
    from pyspark.sql import functions as F

    t = tokens_expr(text_col)
    return F.round(F.size(F.array_distinct(t)) / F.size(t), 6)


def mean_token_len_expr(text_col):
    from pyspark.sql import functions as F

    t = tokens_expr(text_col)
    total = F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x)
    return F.round(total / F.size(t), 6)


def marker_hits_expr(text_col, markers):
    from pyspark.sql import functions as F

    t = tokens_expr(text_col)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(t, lambda x: F.array_contains(arr, F.lower(x))))


def langid_expr(text_col):
    """argmax over marker-hit counts; ties / zero hits → 'und'.
    Tie-break: language key order en < es < de by hit count strictly
    greater — encoded as a fixed comparison chain in both engines."""
    from pyspark.sql import functions as F

    en = marker_hits_expr(text_col, LANG_MARKERS["en"])
    es = marker_hits_expr(text_col, LANG_MARKERS["es"])
    de = marker_hits_expr(text_col, LANG_MARKERS["de"])
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_score_expr(text_col):
    """Composite quality score in [0, 1]: length score (tokens/256
    capped at 1) × 0.5 + diversity × 0.3 + mean-token-length score
    (mean_len/8 capped at 1) × 0.2 — the usual shape of crawl-corpus
    quality heuristics (length, lexical diversity, word-length)."""
    from pyspark.sql import functions as F

    ntok = token_count_expr(text_col).cast("double")
    length_score = F.least(ntok / F.lit(256.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(tokens_expr(text_col))) / F.size(tokens_expr(text_col))
    t = tokens_expr(text_col)
    mean_len = F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x) / F.size(t)
    len_score = F.least(mean_len / F.lit(8.0), F.lit(1.0))
    return F.round(length_score * 0.5 + diversity * 0.3 + len_score * 0.2, 6)
