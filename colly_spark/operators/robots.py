"""robots.txt gate — longest-match Allow/Disallow semantics.

Reference behavior (colly.go:792-827 checkRobots + the temoto/robotstxt
library it uses, pinned by colly_test.go:1033-1119):

- robots fetched once per host and cached; a fetch **error blocks all
  visits** to that host (colly_test.go:1108-1119).
- the tested path is ``EscapedPath() + "?" + RawQuery`` — so
  ``Disallow: /allowed*q=`` blocks ``/allowed?q=1``
  (colly_test.go:1070-1085).
- HEAD requests skip robots entirely (colly.go:723).
- longest-pattern match wins between Allow and Disallow (google
  robots.txt semantics); tie → Allow wins. ``*`` wildcard and ``$``
  end-anchor supported.

Implemented as a pure-Python matcher (shared verbatim by the oracle
simulator) plus a vectorized pandas-UDF wrapper for the Spark path.
At scale the per-host rules table is tiny (≤ #hosts rows) and is
broadcast-joined onto the admission batch — never shuffled.
"""

from __future__ import annotations

import re
from functools import lru_cache


def parse_rules(body: str | None) -> list[tuple[bool, str]]:
    """Parse a robots.txt body into [(is_allow, pattern), ...] for the
    ``*`` user-agent group (the synthetic corpus only uses ``*``)."""
    if not body:
        return []
    rules: list[tuple[bool, str]] = []
    in_star_group = False
    seen_any_group = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star_group = val == "*"
            seen_any_group = True
        elif key in ("allow", "disallow") and (in_star_group or not seen_any_group):
            if val:
                rules.append((key == "allow", val))
            # empty Disallow: means allow-all → no rule
    return rules


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out))


def allowed(rules: list[tuple[bool, str]], path_query: str) -> bool:
    """Longest-match wins; tie → allow; no match → allow."""
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        if _pattern_re(pattern).match(path_query):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow):
                best_len = plen
                best_allow = is_allow
    return best_allow


def path_query_of(canon_url: str) -> str:
    """EscapedPath + '?' + query — the string robots rules match on."""
    from colly_spark.functions.urlnorm import split_url

    _, _, _, _, path, query, _ = split_url(canon_url)
    pq = path or "/"
    if query is not None:
        pq += "?" + query
    return pq


def robots_allowed(canon_url: str, robots_body: str | None, fetch_error: bool) -> bool:
    """Full gate for one URL: fetch-error host blocks everything; no
    robots row (body None, no error) allows everything."""
    if fetch_error:
        return False
    if robots_body is None:
        return True
    return allowed(parse_rules(robots_body), path_query_of(canon_url))


def robots_allowed_udf():
    """Vectorized pandas UDF: (canon_url, robots_body, fetch_error) →
    bool. robots_body arrives via broadcast join on host."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    def _udf(urls, bodies, errors):
        return pd.Series(
            [
                robots_allowed(u, b if isinstance(b, str) else None, bool(e) if e is not None else False)
                for u, b, e in zip(urls, bodies, errors)
            ]
        )

    return F.pandas_udf(_udf, BooleanType())
