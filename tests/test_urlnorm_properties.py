"""Property-based hardening of the URL kernel + politeness quota KATs.

The canonicalizer already has reference-derived KATs (test_urlnorm) and
a DuckDB oracle; these properties pin the ALGEBRA the engine depends on
for dedup correctness at scale — if canonicalize were not idempotent,
redirect-hop re-canonicalization would fork the URL-seen space; if
resolve produced non-canonical output, link-derived frontier rows would
hash differently from seed-derived ones.

All hypothesis runs are derandomized (CI-stable); the generators cover
tab/newline pollution, lone percents, mixed case, default and explicit
ports, dot segments, and fragment/query edge shapes.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.functions.urlnorm import (canonicalize, fnv64a_batch, hostname,
                                           request_hash, resolve, to_signed64)

_SETTINGS = dict(derandomize=True, max_examples=300, deadline=None)

_label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,8}[a-z0-9])?", fullmatch=True)
_host = st.builds(lambda ls: ".".join(ls), st.lists(_label, min_size=1, max_size=3))
_seg_chars = st.sampled_from(
    list("abcXYZ019-._~!$&'()*+,;=:@% \t\né"))
_segment = st.builds("".join, st.lists(_seg_chars, min_size=0, max_size=6))
_path = st.builds(lambda segs: "/" + "/".join(segs),
                  st.lists(_segment, min_size=0, max_size=4))
_query = st.one_of(st.none(), _segment)
_fragment = st.one_of(st.none(), _segment)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Http"]))
    host = draw(_host)
    port = draw(st.one_of(st.none(), st.sampled_from(["80", "443", "8080"])))
    u = scheme + "://" + host + ((":" + port) if port else "") + draw(_path)
    q = draw(_query)
    if q is not None:
        u += "?" + q
    f = draw(_fragment)
    if f is not None:
        u += "#" + f
    return u


@st.composite
def hrefs(draw):
    kind = draw(st.integers(0, 5))
    if kind == 0:
        return draw(urls())                       # absolute
    if kind == 1:
        return "//" + draw(_host) + draw(_path)   # protocol-relative
    if kind == 2:
        return draw(_path)                        # root-relative
    if kind == 3:
        return draw(_segment)                     # path-relative
    if kind == 4:
        return "?" + draw(_segment)               # query-only
    return "#" + draw(_segment)                   # fragment-only


class TestCanonicalizeProperties:
    @settings(**_SETTINGS)
    @given(urls())
    def test_idempotent(self, u):
        c = canonicalize(u)
        if c:
            assert canonicalize(c) == c

    @settings(**_SETTINGS)
    @given(urls())
    def test_canonical_shape(self, u):
        c = canonicalize(u)
        if not c:
            return
        assert c.startswith(("http://", "https://"))
        h = hostname(c)
        assert h == h.lower() and h
        # the scheme's own default port is elided (":80" on https stays)
        authority = c.split("://", 1)[1].split("/", 1)[0]
        if ":" in authority.rsplit("@", 1)[-1]:
            port = authority.rsplit(":", 1)[1]
            default = {"http:": "80", "https": "443"}[c[:5]]
            assert port != default
        assert "\t" not in c and "\n" not in c
        # path never empty
        assert c.split("://", 1)[1].count("/") >= 1

    @settings(**_SETTINGS)
    @given(urls())
    def test_dot_segments_removed(self, u):
        c = canonicalize(u)
        if c:
            path = "/" + c.split("://", 1)[1].split("/", 1)[1]
            path = path.split("?")[0].split("#")[0]
            assert "/./" not in path and not path.endswith("/.")
            assert "/../" not in path and not path.endswith("/..")

    @settings(**_SETTINGS)
    @given(urls(), hrefs())
    def test_resolve_output_is_canonical(self, base, href):
        r = resolve(base, href)
        if r:
            assert canonicalize(r) == r

    @settings(**_SETTINGS)
    @given(urls(), urls())
    def test_resolve_absolute_href_ignores_base(self, base, href):
        # an absolute href resolves independently of the base
        assert resolve(base, href) == canonicalize(href)

    @settings(**_SETTINGS)
    @given(urls(), _segment)
    def test_fragment_only_href_dropped(self, base, frag):
        # request.go:251-262: '#...' hrefs are not crawlable
        assert resolve(base, "#" + frag) == ""

    @settings(**_SETTINGS)
    @given(urls())
    def test_hash_batch_equals_scalar(self, u):
        # request_hash = FNV over canonicalize(url) ‖ body; fnv64a_batch
        # is the raw-bytes layer the fused UDF feeds canon strings into
        c = canonicalize(u) or u
        batch = fnv64a_batch([c, c], [None, b"body"])
        assert int(batch[0]) == to_signed64(request_hash(u, None))
        assert int(batch[1]) == to_signed64(request_hash(u, b"body"))


class TestQuotaKats:
    """Hand-computed politeness arithmetic (http_backend.go:199-211:
    a worker slot is held for service + Delay + rand(RandomDelay), so
    rate = Parallelism / (service + Delay + E[rand]))."""

    def test_basic_rate(self):
        # slot = 75 + 100 + 50/2 = 200 ms; 2 workers × 1000 ms / 200 = 10
        r = LimitRule(delay_ms=100, random_delay_ms=50, parallelism=2)
        assert r.quota(window_ms=1000, service_ms=75) == 10

    def test_no_delay_is_parallelism_bound(self):
        # slot = service only: 4 workers × 1000 / 50 = 80
        r = LimitRule(delay_ms=0, random_delay_ms=0, parallelism=4)
        assert r.quota(window_ms=1000, service_ms=50) == 80

    def test_quota_floor_is_one(self):
        # a huge delay still admits one request per window (progress)
        r = LimitRule(delay_ms=10_000, parallelism=1)
        assert r.quota(window_ms=100, service_ms=50) == 1

    def test_zero_parallelism_treated_as_one(self):
        r = LimitRule(delay_ms=100, parallelism=0)
        assert r.quota(window_ms=1000, service_ms=100) == 5

    def test_first_match_wins_order(self):
        cfg = CrawlConfig(limit_rules=(
            LimitRule(domain_glob="a*.test", delay_ms=400, parallelism=1),
            LimitRule(domain_glob="*", delay_ms=0, parallelism=8),
        ))
        assert cfg.matching_rule("abc.test").delay_ms == 400
        assert cfg.matching_rule("zzz.test").parallelism == 8

    def test_domain_quota_uses_matching_rule(self):
        cfg = CrawlConfig(limit_rules=(
            LimitRule(domain_glob="hot.test", delay_ms=900, random_delay_ms=200,
                      parallelism=2),
            LimitRule(domain_glob="*", parallelism=4),
        ))
        # engine window/service constants: window=1000ms, service=100ms
        # slot = 100 + 900 + 100 = 1100; 2×1000//1100 = 1
        assert cfg.domain_quota("hot.test") == 1
