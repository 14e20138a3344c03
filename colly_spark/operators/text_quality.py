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


def _gram_frame(df, id_col, text_col, ns):
    """(id, n, gram, n_chars) rows: token n-grams for each n in ``ns``
    from a SINGLE scan — every n's gram array is built per-row, the
    arrays flatten, and one explode emits the stream. The scale shape
    is explode -> groupBy on (id, n, gram): ONE pass over the text
    column (a per-n union would re-scan the table |ns| times at
    100 TB) and one shuffle keyed by gram text, never a per-row
    O(tokens²) array comparison."""
    from pyspark.sql import functions as F

    t = tokens_expr(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(F.trim(F.col(text_col))).alias("n_chars"),
        t.alias("t"), F.size(t).alias("ntok"))

    def gram_arr(n):
        return F.transform(
            F.sequence(F.lit(0), F.col("ntok") - F.lit(n)),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", *[F.element_at("t", i + F.lit(k + 1))
                                   for k in range(n)]).alias("gram")))

    # docs shorter than n contribute a NULL slot (filtered pre-flatten)
    # so the sequence() never runs start > stop
    arrs = F.array(*[F.when(F.col("ntok") >= n, gram_arr(n)) for n in ns])
    allg = F.flatten(F.filter(arrs, lambda x: x.isNotNull()))
    return (base.select("id", "n_chars", F.explode(allg).alias("g"))
            .select("id", "n_chars",
                    F.col("g.n").alias("n"), F.col("g.gram").alias("gram")))


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signals (Rae et al. 2021, 'Scaling
    Language Models', App. A quality heuristics), over token n-grams:

    - ``top_2gram_frac`` / ``top_3gram_frac``: characters covered by
      the most-covering n-gram (count x gram length, tie-free by
      construction) / document characters;
    - ``dup_4gram_frac``: characters covered by 4-grams occurring more
      than once (every occurrence counted) / document characters.

    Documents shorter than n tokens contribute 0.0. Rounded to 6 dp to
    hash-match the DuckDB oracle. Scale shape: one explode + one
    groupBy((id, n, gram)) + one groupBy(id) — shuffle volume is the
    token stream, uniformly keyed by gram text; no per-row quadratic
    array work, no skew (gram keys are near-unique)."""
    from pyspark.sql import functions as F

    grams = _gram_frame(df, id_col, text_col, (2, 3, 4))
    counts = (grams.groupBy("id", "n", "gram")
              .agg(F.count("*").alias("cnt"),
                   F.first("n_chars").alias("n_chars")))
    cov = F.col("cnt") * F.length("gram")
    per_n = (counts.groupBy("id", "n")
             .agg(F.max(cov).alias("maxcov"),
                  F.sum(F.when(F.col("cnt") >= 2, cov).otherwise(0))
                  .alias("dupcov"),
                  F.first("n_chars").alias("n_chars")))
    stats = (per_n.groupBy("id")
             .agg(*[F.round(
                 F.coalesce(
                     F.max(F.when(F.col("n") == n,
                                  F.col(src) / F.col("n_chars"))),
                     F.lit(0.0)), 6).alias(alias)
                 for n, src, alias in ((2, "maxcov", "top_2gram_frac"),
                                       (3, "maxcov", "top_3gram_frac"),
                                       (4, "dupcov", "dup_4gram_frac"))]))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(stats, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
                    F.coalesce("top_3gram_frac", F.lit(0.0)).alias("top_3gram_frac"),
                    F.coalesce("dup_4gram_frac", F.lit(0.0)).alias("dup_4gram_frac")))


def gopher_filter_exprs(text_col):
    """The Gopher document-level admission flags that are expressible
    per-row (repetition flags come from ``repetition_stats``): token
    count in [50, 100000], mean token length in [3, 10], and >= 80%
    of tokens containing at least one alphabetic character. Returns a
    dict of named boolean expressions plus the conjunction."""
    from pyspark.sql import functions as F

    ntok = token_count_expr(text_col)
    mean_len = mean_token_len_expr(text_col)
    t = tokens_expr(text_col)
    alpha_frac = F.round(
        F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / F.size(t), 6)
    flags = {
        "ok_token_count": (ntok >= 50) & (ntok <= 100000),
        "ok_mean_token_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "ok_alpha_frac": alpha_frac >= 0.8,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    return flags, keep


# GPT-2-style pretokenizer, restricted to the RE2-compatible subset
# (no lookahead) so the DuckDB oracle runs the IDENTICAL pattern:
# contractions, space-prefixed letter runs, digit runs, symbol runs,
# whitespace runs. Alternation is leftmost-first in both Java regex
# and RE2's Perl-compatible mode.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens_expr(text_col):
    """Array of BPE-pretokenizer segments (whitespace-run matches
    dropped — a BPE vocab would merge them into the following token).
    Pure Catalyst: regexp_extract_all + filter, map-side."""
    from pyspark.sql import functions as F

    return F.filter(
        F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_RE), F.lit(0)),
        lambda x: ~x.rlike(r"^\s+$"))


def bpe_token_stats_cols(text_col):
    """(n_bpe_tokens, bpe_chars_per_token): segment count under the
    GPT-2-style pretokenizer and the chars-per-token diagnostic
    (trimmed chars / segments, NULL for empty docs)."""
    from pyspark.sql import functions as F

    toks = bpe_tokens_expr(text_col)
    n = F.size(toks).cast("long")
    cpt = F.when(n > 0, F.round(F.length(F.trim(text_col)) / n, 6))
    return n.alias("n_bpe_tokens"), cpt.alias("bpe_chars_per_token")


# PII scrubbing — the standard pre-training redaction pass (emails,
# IPv4 addresses, international-format phone numbers → typed
# placeholder tokens).  Patterns are restricted to the syntax Java
# regex and RE2 share (no lookaround), so the DuckDB oracle runs the
# IDENTICAL patterns; replacement order (email → ip → phone) is part
# of the contract — an email's host can contain dotted digits, so
# emails must be redacted before the IP pass sees them.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"
PII_PASSES = ((PII_EMAIL_RE, "<EMAIL>"), (PII_IPV4_RE, "<IP>"),
              (PII_PHONE_RE, "<PHONE>"))


def pii_scrub_cols(text_col):
    """(n_emails, n_ipv4, n_phones, clean_text): occurrence counts on
    the raw text plus the text with every match replaced by its
    placeholder.  Pure Catalyst (regexp_count / regexp_replace) —
    map-side, whole-stage-codegen'd, scan-speed at 100 TB."""
    from pyspark.sql import functions as F

    counts = [
        F.regexp_count(text_col, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text_col, F.lit(PII_IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(text_col, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
    ]
    clean = text_col
    for pat, tok in PII_PASSES:
        clean = F.regexp_replace(clean, pat, tok)
    return (*counts, clean.alias("clean_text"))


def pii_scrub(df, text_col="text", id_col="doc_id"):
    """Per-document PII redaction: returns (id, n_emails, n_ipv4,
    n_phones, clean_text)."""
    from pyspark.sql import functions as F

    return df.select(F.col(id_col), *pii_scrub_cols(F.col(text_col)))


# ---------------------------------------------------------------------------
# C4-style line-level corrections (Raffel et al. 2020 §2.2 — the
# "Colossal Clean Crawled Corpus" rule set, the standard first-pass
# cleanup of every web-LLM pipeline since):
#   line rules  — keep only lines that end in terminal punctuation,
#                 have >= 3 words, and do not mention "javascript";
#   page rules  — drop the whole page if it contains "lorem ipsum" or
#                 a curly brace, or if fewer than MIN_KEPT lines
#                 survive the line rules (the paper's 5-sentence
#                 minimum re-expressed at line granularity).
# Pure Catalyst (split / filter / rlike / array_join) — map-side,
# whole-stage-codegen'd, scan-speed at 100 TB; no shuffle at all.

C4_TERMINAL_RE = r'[.!?"]$'
C4_MIN_WORDS = 3
C4_MIN_KEPT = 5


def c4_line_filter_cols(text_col, min_kept: int = C4_MIN_KEPT):
    """(n_lines, n_kept, page_kept, kept_text) for newline-separated
    page text under the C4 rules above. kept_text is NULL for dropped
    pages (they carry no usable text downstream)."""
    from pyspark.sql import functions as F

    lines = F.split(text_col, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(l), " ")) >= C4_MIN_WORDS)
        & ~F.lower(l).contains("javascript"))
    page_kept = (~F.lower(text_col).contains("lorem ipsum")
                 & ~text_col.contains("{")
                 & (F.size(kept) >= min_kept))
    return (F.size(lines).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            page_kept.alias("page_kept"),
            F.when(page_kept, F.array_join(kept, "\n"))
            .otherwise(F.lit(None)).alias("kept_text"))


def c4_line_filter(df, text_col="text", id_col="doc_id",
                   min_kept: int = C4_MIN_KEPT):
    """Per-page C4 cleanup: (id, n_lines, n_kept, page_kept,
    kept_text)."""
    from pyspark.sql import functions as F

    return df.select(F.col(id_col),
                     *c4_line_filter_cols(F.col(text_col), min_kept))
