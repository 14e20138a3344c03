"""Unit tests: XML/sitemap extraction (E2), filename sanitizer (C4),
declarative field extraction (E3 unmarshal)."""

from __future__ import annotations

from colly_spark.functions.urlnorm import sanitize_filename
from colly_spark.operators.extract import extract_page, extract_xml_links


def test_sitemap_urlset():
    body = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a.test/p/1</loc></url>"
        "<url><loc>http://a.test/p/2</loc></url>"
        "</urlset>"
    )
    links, images = extract_page("http://a.test/sitemap.xml", body, "application/xml")
    assert links == ["http://a.test/p/1", "http://a.test/p/2"]
    assert images == []


def test_xml_relative_loc_and_attrs():
    body = "<feed><entry href='/x'/><loc> /y </loc></feed>"
    out = extract_xml_links("http://b.test/f.xml", body)
    assert out == ["http://b.test/x", "http://b.test/y"]


def test_xml_parse_error_returns_empty():
    assert extract_xml_links("http://a.test/", "<not<closed") == []


def test_html_not_routed_to_xml():
    links, _ = extract_page(
        "http://a.test/", '<a href="/z">z</a>', "text/html; charset=utf-8")
    assert links == ["http://a.test/z"]


def test_sanitize_filename():
    assert sanitize_filename("report final.pdf") == "report_final.pdf"
    assert sanitize_filename("weird*chars?.tar.gz") == "weird_chars_.tar.gz"
    assert sanitize_filename("noext") == "noext.unknown"
    assert sanitize_filename("../../etc/passwd") == "etc_passwd.unknown"
    assert sanitize_filename("a-b.c-d") == "a_b.c_d"


def test_unmarshal_spec():
    from colly_spark.operators.unmarshal import extract_fields

    html = (
        '<div id="main"><h1 class="title">Hello</h1>'
        '<a class="link" href="/next">next</a>'
        '<span data-k="v">txt</span></div>'
    )
    spec = [
        {"field": "title", "selector": "h1.title"},
        {"field": "next_href", "selector": "a.link", "attr": "href"},
        {"field": "k", "selector": "span", "attr": "data-k"},
        {"field": "missing", "selector": "h2"},
    ]
    out = extract_fields(html, spec)
    assert out == {"title": "Hello", "next_href": "/next", "k": "v", "missing": None}


def test_unmarshal_udf(spark):
    from pyspark.sql import functions as F

    from colly_spark.operators.unmarshal import extract_fields_udf

    df = spark.createDataFrame(
        [(1, '<h1 class="t">A</h1><a href="/a">x</a>'),
         (2, '<h1 class="t">B</h1>')],
        "id long, html string")
    spec = [{"field": "title", "selector": "h1.t"},
            {"field": "href", "selector": "a", "attr": "href"}]
    out = df.select("id", extract_fields_udf(spec)(F.col("html")).alias("s")) \
            .select("id", "s.title", "s.href").orderBy("id").collect()
    assert [tuple(r) for r in out] == [(1, "A", "/a"), (2, "B", None)]
