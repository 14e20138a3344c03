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


def parse_group_delays(body: str | None) -> list[tuple[list[str], float | None]]:
    """Per-UA-group ``Crawl-delay`` seconds, with the SAME grouping
    grammar as :func:`parse_groups` (consecutive User-agent lines share
    one block; directives before any group belong to ``*``). The
    directive is non-standard but near-universal on real robots.txt;
    the reference's robotstxt library parses it (temoto CrawlDelay)
    though colly itself never applies it — applying it is this
    engine's respect_crawl_delay extension."""
    if not body:
        return []
    out: list[tuple[list[str], float | None]] = []
    agents: list[str] = []
    delay: float | None = None
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
                if agents or delay is not None:
                    out.append((agents or ["*"], delay))
                agents, delay = [], None
                collecting_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
        elif key == "crawl-delay":
            collecting_agents = False
            try:
                v = float(val)
                if v >= 0:
                    delay = v
            except ValueError:
                pass  # malformed value → directive ignored
    if agents or delay is not None:
        out.append((agents or ["*"], delay))
    return out


def crawl_delay_of(body: str | None, user_agent: str) -> float | None:
    """Crawl-delay seconds applying to ``user_agent``: the longest-
    prefix-matching group's value (temoto FindGroup semantics, exactly
    like rule selection), falling back to the ``*`` group; None when
    neither advertises one."""
    ua = (user_agent or "").lower()
    best_len = -1
    best: float | None = None
    star: float | None = None
    for agents, delay in parse_group_delays(body):
        for token in agents:
            if token == "*":
                if star is None:
                    star = delay
            elif ua.startswith(token) and len(token) > best_len:
                best_len = len(token)
                best = delay
    return best if best_len >= 0 else star


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
