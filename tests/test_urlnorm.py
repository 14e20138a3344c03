"""Kernel parity tests — URL cases from the reference suite
(colly_test.go:905-1016) plus FNV-64a known-answer vectors."""

import numpy as np
import pytest

from colly_spark.functions import urlnorm


class TestCanonicalize:
    def test_trailing_slash_added(self):
        # requestHash comment: "http://example.com" vs "http://example.com/"
        assert urlnorm.canonicalize("http://example.com") == "http://example.com/"
        assert urlnorm.canonicalize("http://example.com/") == "http://example.com/"

    def test_scheme_host_lowercased(self):
        assert urlnorm.canonicalize("HTTP://ExAmPle.COM/Path") == "http://example.com/Path"

    def test_default_port_elided(self):
        assert urlnorm.canonicalize("http://example.com:80/a") == "http://example.com/a"
        assert urlnorm.canonicalize("https://example.com:443/a") == "https://example.com/a"
        assert urlnorm.canonicalize("http://example.com:8080/a") == "http://example.com:8080/a"

    def test_tabs_and_newlines_stripped(self):
        # WHATWG step 3 — colly_test.go:953-983
        assert (
            urlnorm.canonicalize("http://exa\tmple.com/foo\nbar/x\ry")
            == "http://example.com/foobar/xy"
        )
        assert urlnorm.canonicalize("  http://example.com/  ") == "http://example.com/"

    def test_lone_percent_path_encoded(self):
        # colly_test.go:985-1016 — /100% → /100%25
        assert urlnorm.canonicalize("http://x.com/100%") == "http://x.com/100%25"
        # valid escapes untouched
        assert urlnorm.canonicalize("http://x.com/100%25") == "http://x.com/100%25"

    def test_lone_percent_query_preserved(self):
        # colly_test.go: "/?a=100%zz" keeps raw query
        assert urlnorm.canonicalize("http://x.com/?a=100%zz") == "http://x.com/?a=100%zz"

    def test_dot_segments(self):
        assert urlnorm.canonicalize("http://x.com/a/b/../c/./d") == "http://x.com/a/c/d"

    def test_query_and_fragment(self):
        assert urlnorm.canonicalize("http://x.com/p?q=1#frag") == "http://x.com/p?q=1#frag"
        assert urlnorm.canonicalize("http://x.com/p?") == "http://x.com/p?"

    def test_space_encoded(self):
        assert urlnorm.canonicalize("http://x.com/a b") == "http://x.com/a%20b"

    def test_unparseable(self):
        assert urlnorm.canonicalize("not a url") == ""
        assert urlnorm.canonicalize("") == ""


class TestResolve:
    BASE = "http://srv.test/foobar/page.html"

    def test_absolute_passthrough(self):
        assert urlnorm.resolve(self.BASE, "http://xy.com/z") == "http://xy.com/z"

    def test_fragment_only_skipped(self):
        # request.go:251-262 — "#x" resolves to ""
        assert urlnorm.resolve(self.BASE, "#section") == ""

    def test_root_relative(self):
        assert urlnorm.resolve(self.BASE, "/z") == "http://srv.test/z"

    def test_relative(self):
        # TestBaseTagRelative expectation shape: base /foobar/ + z
        assert urlnorm.resolve("http://srv.test/foobar/", "z") == "http://srv.test/foobar/z"
        assert urlnorm.resolve(self.BASE, "z") == "http://srv.test/foobar/z"

    def test_protocol_relative(self):
        assert urlnorm.resolve(self.BASE, "//cdn.test/a") == "http://cdn.test/a"

    def test_tabs_in_href(self):
        # TestTabsAndNewlines: href "/foo\tbar/\nx\ry" → /foobar/xy
        assert (
            urlnorm.resolve("http://srv.test/tabs_and_newlines", "/foo\tbar/\nx\ry")
            == "http://srv.test/foobar/xy"
        )

    def test_query_relative(self):
        assert urlnorm.resolve(self.BASE, "?p=2") == "http://srv.test/foobar/page.html?p=2"

    def test_parent_dir(self):
        assert urlnorm.resolve(self.BASE, "../z") == "http://srv.test/z"


class TestFNV64a:
    # Known-answer vectors for FNV-64a (public constants).
    KAT = {
        b"": 14695981039346656037,
        b"a": 12638187200555641996,
        b"foobar": 9625390261332436968,
        b"http://example.com/": 3626013177403016945,
    }

    def test_scalar_kat(self):
        for data, want in self.KAT.items():
            assert urlnorm.fnv64a_bytes(data) == want

    def test_batch_matches_scalar(self):
        strs = ["", "a", "foobar", "http://example.com/", "x" * 300, "日本語"]
        got = urlnorm.fnv64a_batch(strs)
        want = np.array(
            [urlnorm.to_signed64(urlnorm.fnv64a_bytes(s.encode("utf-8"))) for s in strs],
            dtype=np.int64,
        )
        assert (got == want).all()

    def test_batch_with_bodies(self):
        strs = ["http://x.com/", "http://x.com/"]
        bodies = [b"a=1", None]
        got = urlnorm.fnv64a_batch(strs, bodies)
        assert got[0] != got[1]
        assert got[0] == urlnorm.to_signed64(
            urlnorm.fnv64a_bytes(b"http://x.com/a=1")
        )

    def test_request_hash_canonicalizes_first(self):
        # "http://example.com" and "http://example.com/" collapse
        assert urlnorm.request_hash("http://example.com") == urlnorm.request_hash(
            "http://example.com/"
        )

    def test_post_body_in_key(self):
        u = "http://x.com/login"
        assert urlnorm.request_hash(u, b"user=a") != urlnorm.request_hash(u, b"user=b")
        assert urlnorm.request_hash(u, b"user=a") != urlnorm.request_hash(u)


@pytest.mark.parametrize(
    "url,host",
    [
        ("http://example.com:8080/a", "example.com"),
        ("https://Sub.Example.COM/", "sub.example.com"),
        ("http://u:p@h.test/x", "h.test"),
    ],
)
def test_hostname(url, host):
    assert urlnorm.hostname(url) == host
