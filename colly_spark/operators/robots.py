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


def parse_groups(body: str | None) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """Parse a robots.txt body into UA groups:
    [([agent_token, ...], [(is_allow, pattern), ...]), ...].

    Grammar per the temoto/robotstxt library the reference uses
    (colly.go:792-827): consecutive ``User-agent`` lines open one group
    sharing the rule block that follows; rules before any group belong
    to an implicit ``*`` group; empty Allow/Disallow values add no rule."""
    if not body:
        return []
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if agents or rules:
                    groups.append((agents or ["*"], rules))
                agents, rules = [], []
                collecting_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if val:
                rules.append((key == "allow", val))
    if agents or rules:
        groups.append((agents or ["*"], rules))
    return groups


def select_group(groups, user_agent: str) -> list[tuple[bool, str]]:
    """The group whose UA token is the **longest prefix** of the
    collector's UserAgent (temoto FindGroup semantics — the group for
    agent 'colly-spark/1.0' prefers token 'colly-spark' over '*');
    falls back to the ``*`` group, else no rules (allow all)."""
    ua = (user_agent or "").lower()
    best_len = -1
    best_rules: list[tuple[bool, str]] | None = None
    star_rules: list[tuple[bool, str]] | None = None
    for agents, rules in groups:
        for token in agents:
            if token == "*":
                if star_rules is None:
                    star_rules = rules
            elif ua.startswith(token) and len(token) > best_len:
                best_len = len(token)
                best_rules = rules
    if best_rules is not None:
        return best_rules
    return star_rules if star_rules is not None else []


def parse_rules(body: str | None, user_agent: str = "*") -> list[tuple[bool, str]]:
    """Rules applying to ``user_agent`` (``"*"`` → the default group)."""
    groups = parse_groups(body)
    if user_agent == "*":
        return select_group(groups, "\0no-such-agent")  # only the * group
    return select_group(groups, user_agent)


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


def robots_allowed(canon_url: str, robots_body: str | None, fetch_error: bool,
                   user_agent: str = "*") -> bool:
    """Full gate for one URL: fetch-error host blocks everything; no
    robots row (body None, no error) allows everything. The rule group
    is selected by the collector's UserAgent (F8, colly.go:792-827)."""
    if fetch_error:
        return False
    if robots_body is None:
        return True
    return allowed(select_group(parse_groups(robots_body), user_agent),
                   path_query_of(canon_url))


def robots_allowed_udf():
    """Vectorized pandas UDF: (canon_url, robots_body, fetch_error,
    user_agent) → bool. robots_body arrives via broadcast join on
    host; the UA is a per-ROW column (a constant lit for a fixed UA,
    or the RandomUserAgent pick — each request's UA selects its own
    robots group, colly.go:792-827)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    def _udf(urls, bodies, errors, uas):
        return pd.Series(
            [
                robots_allowed(u, b if isinstance(b, str) else None,
                               bool(e) if e is not None else False, ua or "*")
                for u, b, e, ua in zip(urls, bodies, errors, uas)
            ]
        )

    return F.pandas_udf(_udf, BooleanType())
