"""Known-answer tests with HAND-WRITTEN expected values derived from
the reference test suite — independent of the engine/simulator shared
kernels (closing the r01 parity blind spot: the simulator imports the
same robots/extract kernels as the engine, so parity alone cannot
catch a shared-kernel bug; these KATs can).

Sources: colly_test.go:1033-1119 (robots family), 905-951 (base tag),
http_backend.go:229-240 (gzip), response.go:76-104 (charset),
colly.go:792-827 (UA-group selection via temoto FindGroup).
"""

from __future__ import annotations

import gzip

from colly_spark.operators.extract import decode_body, decode_text, extract_page
from colly_spark.operators.robots import robots_allowed

_ROBOTS_STAR = (
    "User-agent: *\n"
    "Allow: /allowed\n"
    "Disallow: /disallowed\n"
    "Disallow: /allowed*q=\n"
)


class TestRobotsKats:
    """colly_test.go:1033-1119: TestRobotsWhenAllowed/Disallowed +
    the wildcard query-param case."""

    def test_allowed_path(self):
        assert robots_allowed("http://x.test/allowed", _ROBOTS_STAR, False)

    def test_disallowed_path(self):
        assert not robots_allowed("http://x.test/disallowed", _ROBOTS_STAR, False)

    def test_wildcard_query_blocked(self):
        # Disallow: /allowed*q= blocks /allowed?q=1 (colly_test.go:1070-1085)
        assert not robots_allowed("http://x.test/allowed?q=1", _ROBOTS_STAR, False)

    def test_wildcard_other_query_allowed(self):
        # '?q2=1' contains no 'q=' sequence → not matched
        assert robots_allowed("http://x.test/allowed?q2=1", _ROBOTS_STAR, False)

    def test_fetch_error_blocks_host(self):
        # robots fetch error propagates as a visit error
        # (colly_test.go:1108-1119)
        assert not robots_allowed("http://x.test/anything", None, True)

    def test_no_robots_allows(self):
        assert robots_allowed("http://x.test/anything", None, False)

    def test_longest_match_allow_wins(self):
        body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
        assert not robots_allowed("http://x.test/a/c", body, False)
        assert robots_allowed("http://x.test/a/b/c", body, False)

    def test_end_anchor(self):
        body = "User-agent: *\nDisallow: /exact$\n"
        assert not robots_allowed("http://x.test/exact", body, False)
        assert robots_allowed("http://x.test/exactly", body, False)


class TestRobotsUaGroups:
    """colly.go:792-827: the collector's UserAgent selects its group
    (temoto FindGroup — longest UA token that prefixes the agent)."""

    BODY = (
        "User-agent: colly-spark\n"
        "Disallow: /only-for-colly\n"
        "\n"
        "User-agent: colly\n"
        "Disallow: /for-colly-prefix\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /for-everyone\n"
    )

    def test_longest_prefix_group_selected(self):
        # agent 'colly-spark/1.0' matches both 'colly' and 'colly-spark';
        # the longer token wins and REPLACES every other group
        ua = "colly-spark/1.0"
        assert not robots_allowed("http://x.test/only-for-colly", self.BODY, False, ua)
        assert robots_allowed("http://x.test/for-colly-prefix", self.BODY, False, ua)
        assert robots_allowed("http://x.test/for-everyone", self.BODY, False, ua)

    def test_shorter_prefix_group(self):
        ua = "colly/2.0"
        assert not robots_allowed("http://x.test/for-colly-prefix", self.BODY, False, ua)
        assert robots_allowed("http://x.test/only-for-colly", self.BODY, False, ua)

    def test_unknown_agent_falls_back_to_star(self):
        ua = "googlebot/2.1"
        assert not robots_allowed("http://x.test/for-everyone", self.BODY, False, ua)
        assert robots_allowed("http://x.test/only-for-colly", self.BODY, False, ua)

    def test_multiple_agents_share_group(self):
        body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert not robots_allowed("http://t.test/x", body, False, "a/1.0")
        assert not robots_allowed("http://t.test/x", body, False, "b/1.0")
        assert robots_allowed("http://t.test/x", body, False, "c/1.0")

    def test_rules_before_any_group_apply_to_all(self):
        body = "Disallow: /x\n"
        assert not robots_allowed("http://t.test/x", body, False, "anyone/1.0")


class TestBaseTagKats:
    """colly_test.go:905-951: <base href> rebinds relative resolution."""

    def test_absolute_base(self):
        html = ('<html><head><base href="http://xy.com/" /></head>'
                '<body><a href="z">link</a></body></html>')
        links, _ = extract_page("http://a.test/base", html, "text/html")
        assert links == ["http://xy.com/z"]

    def test_relative_base(self):
        # /base_relative with base "sub/" resolves against the page URL
        html = ('<html><head><base href="sub/" /></head>'
                '<body><a href="z">link</a></body></html>')
        links, _ = extract_page("http://a.test/base_relative", html, "text/html")
        assert links == ["http://a.test/z"] or links == ["http://a.test/sub/z"]
        # WHATWG: base 'sub/' against /base_relative → /sub/ ; href z → /sub/z
        assert links == ["http://a.test/sub/z"]

    def test_fragment_href_skipped(self):
        html = '<a href="#frag">f</a><a href="/real">r</a>'
        links, _ = extract_page("http://a.test/", html, "text/html")
        assert links == ["http://a.test/real"]

    def test_first_base_wins(self):
        html = ('<base href="http://one.test/"><base href="http://two.test/">'
                '<a href="z">l</a>')
        links, _ = extract_page("http://a.test/", html, "text/html")
        assert links == ["http://one.test/z"]


class TestGzipCharsetKats:
    def test_xml_gz_decode_and_ct_rewrite(self):
        raw = b"<urlset><url><loc>http://x.test/p</loc></url></urlset>"
        body, ct = decode_body("http://x.test/sitemap.xml.gz",
                               gzip.compress(raw, mtime=0),
                               "application/gzip", 1 << 20)
        assert body == raw and ct == "application/xml"

    def test_content_encoding_style_html(self):
        raw = b"<html><body><a href='/x'>l</a></body></html>"
        body, ct = decode_body("http://x.test/page", gzip.compress(raw, mtime=0),
                               "text/html; charset=utf-8", 1 << 20)
        assert body == raw and "html" in ct

    def test_truncation_applies_to_decoded_bytes(self):
        raw = b"A" * 1000
        body, _ = decode_body("http://x.test/p.gz", gzip.compress(raw, mtime=0),
                              "application/gzip", 100)
        assert body == b"A" * 100

    def test_corrupt_gzip_tolerated(self):
        bad = b"\x1f\x8b" + b"corrupt"
        body, _ = decode_body("http://x.test/p.gz", bad, "application/gzip", 1 << 20)
        assert body == bad  # raw passthrough, no crash

    def test_binary_not_decompressed_without_label(self):
        data = b"\x1f\x8b\x00\x00payload"
        body, ct = decode_body("http://x.test/blob.bin", data,
                               "application/octet-stream", 1 << 20)
        assert body == data and ct == "application/octet-stream"

    def test_charset_from_content_type(self):
        text = "caf\xe9"
        assert decode_text(text.encode("iso-8859-1"),
                           "text/html; charset=iso-8859-1") == text

    def test_charset_sniffed_from_meta(self):
        html = '<html><head><meta charset="iso-8859-1"></head><body>s\xfcd</body></html>'
        assert decode_text(html.encode("iso-8859-1"), "text/html") == html

    def test_utf8_default_with_replacement_fallback(self):
        assert decode_text("héllo".encode(), "text/html") == "héllo"
        garbled = decode_text(b"\xff\xfe\xfa", "text/html")
        assert "�" in garbled

    def test_latin1_link_extraction_end_to_end(self):
        html = '<html><body><a href="/page/1">caf\xe9</a></body></html>'
        links, _ = extract_page("http://d.test/latin1",
                                html.encode("iso-8859-1"),
                                "text/html; charset=iso-8859-1")
        assert links == ["http://d.test/page/1"]


class TestDetectCharset:
    """X3 DetectCharset (colly.go:104-106, config.go:41-42): statistical
    detection for bodies with NO declared charset — the engine's
    deterministic subset: BOM dispatch, strict-UTF8 validation,
    windows-1252 fallback."""

    def test_bom_dispatch(self):
        from colly_spark.operators.extract import detect_encoding
        assert detect_encoding(b"\xef\xbb\xbfhi") == "utf-8-sig"
        # "utf-16" (not -le/-be): the decoder must consume the BOM so
        # the decoded text does not start with a stray U+FEFF
        assert detect_encoding(b"\xff\xfeh\x00i\x00") == "utf-16"
        assert detect_encoding(b"\xfe\xff\x00h\x00i") == "utf-16"
        assert b"\xff\xfeh\x00i\x00".decode(
            detect_encoding(b"\xff\xfeh\x00i\x00")) == "hi"
        assert b"\xfe\xff\x00h\x00i".decode(
            detect_encoding(b"\xfe\xff\x00h\x00i")) == "hi"

    def test_utf8_valid_vs_high_byte_fallback(self):
        from colly_spark.operators.extract import detect_encoding
        assert detect_encoding("héllo".encode()) == "utf-8"
        assert detect_encoding("caf\xe9".encode("iso-8859-1")) == "windows-1252"

    def test_statistical_cjk_cyrillic(self):
        """Byte-bigram/structural detection of the encodings the
        reference's chardet library covers beyond latin fallback
        (saintfish/chardet behind colly.go:104-106): shift_jis, big5,
        koi8-r — each must round-trip its own text exactly."""
        from colly_spark.operators.extract import detect_encoding
        sj = "日本語のテキストです。検出の対象。".encode("shift_jis")
        b5 = "這是一段繁體中文的測試文字，用於偵測。".encode("big5")
        ko = "это русский текст для проверки кодировки".encode("koi8_r")
        assert detect_encoding(sj) == "shift_jis"
        assert detect_encoding(b5) == "big5"
        assert detect_encoding(ko) == "koi8-r"
        for raw in (sj, b5, ko):
            enc = detect_encoding(raw)
            assert raw.decode(enc).encode(enc) == raw
        # latin-accent text must NOT be mistaken for koi8-r (isolated
        # high bytes: the high-high bigram ratio is ~0)
        assert detect_encoding(
            "caf\xe9 au lait r\xe9sum\xe9 s\xfcd".encode("windows-1252")
        ) == "windows-1252"

    def test_statistical_detection_canonical_links(self):
        """The exact canonical links detection must produce — the
        UTF-8 percent-encoding of the CORRECTLY decoded href (mojibake
        would canonicalize differently)."""
        from colly_spark.functions import urlnorm
        from colly_spark.operators.extract import extract_page

        cases = [
            ("shift_jis", "日本", "%E6%97%A5%E6%9C%AC"),
            ("big5", "中文", "%E4%B8%AD%E6%96%87"),
            ("koi8_r", "гора", "%D0%B3%D0%BE%D1%80%D0%B0"),
        ]
        for codec, word, pct in cases:
            html = (f"<html><body><p>{word}{word}{word}</p>"
                    f'<a href="/{word}">{word}</a></body></html>')
            raw = html.encode(codec)
            links, _ = extract_page("http://x.test/p", raw, "text/html",
                                    detect_charset=True)
            assert urlnorm.canonicalize(f"http://x.test/{pct}") in links, \
                (codec, links)

    def test_decode_text_detect_flag(self):
        raw = "caf\xe9".encode("iso-8859-1")
        # off (default): utf-8 replacement mangles the é
        assert "�" in decode_text(raw, "text/html")
        # on: windows-1252 detection recovers it
        assert decode_text(raw, "text/html", detect=True) == "caf\xe9"
        # a declared charset always wins over detection
        assert decode_text(raw, "text/html; charset=iso-8859-1",
                           detect=True) == "caf\xe9"

    def test_detect_changes_extracted_canonical_link(self):
        html = '<html><body><a href="/caf\xe9">x</a></body></html>'
        raw = html.encode("iso-8859-1")
        on, _ = extract_page("http://d.test/bare", raw, "text/html",
                             detect_charset=True)
        off, _ = extract_page("http://d.test/bare", raw, "text/html")
        assert on == ["http://d.test/caf%C3%A9"]    # é → UTF-8 bytes
        assert off == ["http://d.test/caf%EF%BF%BD"]  # U+FFFD bytes
