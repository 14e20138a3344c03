"""Admission filter chain (F1-F5) as a pure-Catalyst expression.

Reference: requestCheck evaluation order is fixed and observable
(colly.go:715-756 → checkFilters colly.go:758-773 → isDomainAllowed
colly.go:775-790): MaxDepth → DisallowedURLFilters → URLFilters →
DisallowedDomains → AllowedDomains. Each stage short-circuits with its
own error (taxonomy colly.go:204-231), which this when-chain encodes.

Everything here compiles to Catalyst-native predicates (rlike folds) —
whole-stage-codegen'd, pushed into the frontier scan where possible; no
Python in this path. Domain-glob semantics follow the v3 filter engine
(filters/glob.go:20-65) via ``fnmatch.translate`` → Java regex.
"""

from __future__ import annotations

from fnmatch import translate as glob_translate
from functools import reduce

from colly_spark import config as cfgmod
from colly_spark.config import CrawlConfig


def admission_error_expr(cfg: CrawlConfig, url_col, host_col, depth_col):
    """Column expression: error-kind string for rejected rows, NULL for
    admitted rows. Apply to (canonical url, host, depth) columns."""
    from pyspark.sql import functions as F

    def rx_any(col, patterns):
        return reduce(lambda a, b: a | b, (col.rlike(p) for p in patterns))

    def glob_any(col, globs):
        # rlike is a substring *search*; fnmatch.translate only
        # end-anchors (\Z). Anchor the start too so globs are full-host
        # matches like the reference's gobwas/glob (filters/glob.go:20-65)
        # — otherwise 'src*.test' would admit host 'evilsrc0.test'.
        return reduce(lambda a, b: a | b,
                      (col.rlike(r"\A(?:" + glob_translate(g) + r")") for g in globs))

    chain = []
    if cfg.max_depth > 0:
        chain.append((depth_col > cfg.max_depth, cfgmod.ERR_MAX_DEPTH))
    if cfg.disallowed_url_filters:
        chain.append((rx_any(url_col, cfg.disallowed_url_filters), cfgmod.ERR_FORBIDDEN_URL))
    if cfg.url_length_min or cfg.url_length_max:
        # F6: exclusion filter, evaluated with the other exclusions
        # (before inclusions — filter.go:254-302 ordering)
        cond = F.length(url_col) < cfg.url_length_min
        if cfg.url_length_max:
            cond = cond | (F.length(url_col) > cfg.url_length_max)
        chain.append((cond, cfgmod.ERR_URL_LENGTH))
    if cfg.url_filters:
        chain.append((~rx_any(url_col, cfg.url_filters), cfgmod.ERR_NO_URL_FILTERS_MATCH))
    if cfg.disallowed_domain_globs:
        chain.append((glob_any(host_col, cfg.disallowed_domain_globs), cfgmod.ERR_FORBIDDEN_DOMAIN))
    if cfg.allowed_domain_globs:
        chain.append((~glob_any(host_col, cfg.allowed_domain_globs), cfgmod.ERR_FORBIDDEN_DOMAIN))
    if not chain:
        return F.lit(None).cast("string")
    expr = F.when(chain[0][0], F.lit(chain[0][1]))
    for cond, kind in chain[1:]:
        expr = expr.when(cond, F.lit(kind))
    return expr.otherwise(F.lit(None).cast("string"))
