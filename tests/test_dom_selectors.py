"""CSS/XPath selector engine + unmarshal — the reference test cases
re-expressed (unmarshal_test.go:18-161, element_test.go accessors,
colly.go:1123-1182 OnXML-over-HTML)."""

from __future__ import annotations

from colly_spark.operators.dom import parse_dom, select, xpath_lite
from colly_spark.operators.extract import extract_elements, extract_xpath
from colly_spark.operators.unmarshal import extract_fields

# corpora mirroring the reference test fixtures (unmarshal_test.go:12-14)
BASIC = ('<ul><li class="x">list <span>item</span> 1</li>'
         "<li>list item 2</li><li>3</li></ul>")
NESTED = "<div><p>a</p><div><p>b</p><div><p>c</p></div></div></div>"
PTRSLICE = ('<ul class="object"><li class="info">Information: '
            '<span>Info 1</span></li><li class="info">Information: '
            "<span>Info 2</span></li></ul>")


class TestUnmarshalReferenceCases:
    def test_basic_unmarshal(self):
        # TestBasicUnmarshal: attr from li:first-child, text from
        # li:last-child inside an embedded struct (empty selector keeps
        # scope), []string multi-match
        out = extract_fields(BASIC, [
            {"field": "String", "selector": "li:first-child", "attr": "class"},
            {"field": "Items", "selector": "li", "many": True},
            {"field": "Struct", "fields": [
                {"field": "String", "selector": "li:last-child"}]},
        ])
        assert out["String"] == "x"
        assert out["Items"] == ["list item 1", "list item 2", "3"]
        assert out["Struct"]["String"] == "3"

    def test_nested_unmarshal(self):
        # TestNestedUnmarshal: div > p / div > div recursion → a, b, c
        out = extract_fields(NESTED, [
            {"field": "String", "selector": "div > p"},
            {"field": "Struct", "selector": "div > div", "fields": [
                {"field": "String", "selector": "div > p"},
                {"field": "Struct", "selector": "div > div", "fields": [
                    {"field": "String", "selector": "p"}]},
            ]},
        ])
        assert out["String"] == "a"
        assert out["Struct"]["String"] == "b"
        assert out["Struct"]["Struct"]["String"] == "c"

    def test_nested_map_unmarshal(self):
        # TestNestedUnmarshalMap: 'div > p' → a ; 'span' → item
        assert extract_fields(NESTED, [{"field": "String", "selector": "div > p"}]) \
            == {"String": "a"}
        assert extract_fields(BASIC, [{"field": "String", "selector": "span"}]) \
            == {"String": "item"}

    def test_struct_slice_unmarshal(self):
        # TestPointerSliceUnmarshall / TestStructSliceUnmarshall:
        # []struct over li.info, each with span text
        out = extract_fields(PTRSLICE, [
            {"field": "Info", "selector": "li.info", "many": True, "fields": [
                {"field": "Text", "selector": "span"}]},
        ])
        assert [i["Text"] for i in out["Info"]] == ["Info 1", "Info 2"]


class TestCssEngine:
    def test_selector_list_and_nth_child(self):
        root = parse_dom(BASIC)
        assert [n.text() for n in select(root, "li:nth-child(2), span")] \
            == ["item", "list item 2"]

    def test_attr_presence_and_value(self):
        html = '<a href="/x" rel="nofollow">a</a><a href="/y">b</a>'
        root = parse_dom(html)
        assert [n.attrs["href"] for n in select(root, "a[rel]")] == ["/x"]
        assert [n.attrs["href"] for n in select(root, 'a[rel="nofollow"]')] == ["/x"]

    def test_descendant_vs_child(self):
        html = "<div><section><p>deep</p></section><p>shallow</p></div>"
        root = parse_dom(html)
        assert [n.text() for n in select(root, "div p")] == ["deep", "shallow"]
        assert [n.text() for n in select(root, "div > p")] == ["shallow"]

    def test_extract_elements_rows(self):
        rows = extract_elements(BASIC, ["li", "span"])
        assert [(r["selector"], r["index"], r["text"]) for r in rows] == [
            ("li", 0, "list item 1"), ("li", 1, "list item 2"), ("li", 2, "3"),
            ("span", 0, "item")]


class TestXpathLite:
    def test_sitemap_loc(self):
        # the OnXML("//urlset/url/loc") shopify_sitemap pattern
        xml = ('<?xml version="1.0"?><urlset xmlns="http://x/ns">'
               "<url><loc>http://a.test/1</loc></url>"
               "<url><loc>http://a.test/2</loc></url></urlset>")
        root = parse_dom(xml)
        locs = xpath_lite(root, "//urlset/url/loc")
        assert [n.text() for n in locs] == ["http://a.test/1", "http://a.test/2"]

    def test_attr_terminal(self):
        html = '<div><a href="/x">1</a><a href="/y">2</a></div>'
        assert xpath_lite(parse_dom(html), "//a/@href") == ["/x", "/y"]

    def test_text_terminal_and_predicate(self):
        html = ('<div class="x"><p>in</p></div><div class="y"><p>out</p></div>')
        root = parse_dom(html)
        assert xpath_lite(root, '//div[@class="x"]//p/text()') == ["in"]

    def test_positional_predicate(self):
        html = "<ul><li>a</li><li>b</li><li>c</li></ul>"
        got = xpath_lite(parse_dom(html), "//li[2]")
        assert [n.text() for n in got] == ["b"]

    def test_xpath_over_html_rows(self):
        rows = extract_xpath("<div><a href='/z'>link</a></div>",
                             ["//a/@href", "//a/text()"])
        assert [(r["xpath"], r["text"]) for r in rows] == [
            ("//a/@href", "/z"), ("//a/text()", "link")]
