"""element_test.go:20-133 re-expressed: the HTMLElement / XMLElement
accessor API over the repo's DOM engine, using the reference's own
fixture page, plus the accessor spec kinds in the callback registry."""

from __future__ import annotations

from colly_spark.operators.callbacks import (ON_HTML, EventCallbacks,
                                             apply_on_html)
from colly_spark.operators.dom import parse_dom
from colly_spark.operators.element import HTMLElement, XMLElement

# the element_test.go fixture page (element_test.go:20-41), verbatim
# structure: title/h1/p + a two-bullet list with classed <li>s
_PAGE = """
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
  <head>
    <title>Your page title here</title>
  </head>
  <body>
    <h1>Your major heading here</h1>
    <p>
      This is a regular text paragraph.
    </p>
    <ul>
      <li class="list-item-1">
        First bullet of a bullet list.
      </li>
      <li class="list-item-2">
        This is the <em>second</em> bullet.
      </li>
    </ul>
  </body>
</html>
"""


def _html_root():
    root = parse_dom(_PAGE)
    (html,) = [n for n in root.element_children() if n.tag == "html"]
    return html


class TestXMLElementXPath:
    """The XMLElement cases (element_test.go:55-133), XPath queries."""

    def setup_method(self):
        self.el = XMLElement(_html_root())

    def test_attr(self):
        assert self.el.attr("xmlns") == "http://www.w3.org/1999/xhtml"
        assert self.el.attr("xml:lang") == "en"
        assert self.el.attr("nope") == ""

    def test_child_text(self):
        assert self.el.child_text("//p") == "This is a regular text paragraph."
        assert self.el.child_text("//dl") == ""

    def test_child_texts(self):
        assert self.el.child_texts("//li") == [
            "First bullet of a bullet list.", "This is the second bullet."]
        assert self.el.child_texts("//dl") == []

    def test_child_attr(self):
        assert self.el.child_attr("/body/ul/li[1]", "class") == "list-item-1"
        assert self.el.child_attr("/body/ul/li[2]", "class") == "list-item-2"

    def test_child_attrs(self):
        attrs = self.el.child_attrs("/body/ul/li", "class")
        assert sorted(attrs) == ["list-item-1", "list-item-2"]


class TestHTMLElementCSS:
    """The same page through the CSS accessor family
    (element.go:75-153 semantics)."""

    def setup_method(self):
        self.el = HTMLElement(_html_root())

    def test_child_text_single(self):
        assert self.el.child_text("p") == "This is a regular text paragraph."

    def test_child_text_concatenates_all_matches(self):
        # goquery Find(sel).Text() concatenates across matches and
        # strips only the ends
        t = self.el.child_text("li")
        assert t.startswith("First bullet of a bullet list.")
        assert t.endswith("This is the second bullet.")

    def test_child_texts_and_attrs(self):
        assert self.el.child_texts("ul > li") == [
            "First bullet of a bullet list.", "This is the second bullet."]
        assert self.el.child_attr("li.list-item-2", "class") == "list-item-2"
        assert self.el.child_attrs("li", "class") == [
            "list-item-1", "list-item-2"]
        assert self.el.child_attr("dl", "class") == ""
        assert self.el.child_attrs("dl", "class") == []

    def test_for_each_running_index(self):
        seen = []
        self.el.for_each("li", lambda i, e: seen.append((i, e.attr("class"))))
        assert seen == [(0, "list-item-1"), (1, "list-item-2")]

    def test_for_each_with_break(self):
        seen = []

        def cb(i, e):
            seen.append(e.attr("class"))
            return False  # break immediately (element.go:142-153)

        self.el.for_each_with_break("li", cb)
        assert seen == ["list-item-1"]


def test_accessor_spec_kinds_in_registry(spark):
    """The callback registry's child_* spec kinds — what a reference
    OnHTML callback does by calling e.ChildText/ChildAttrs."""
    cbs = EventCallbacks()
    cbs.add(ON_HTML, "ul", {"name": "bullets", "kind": "child_texts",
                            "query": "li"})
    cbs.add(ON_HTML, "ul", {"name": "classes", "kind": "child_attrs",
                            "query": "li", "attr": "class"})
    cbs.add(ON_HTML, "body", {"name": "heading", "kind": "child_text",
                              "query": "h1"})
    df = spark.createDataFrame([("p1", _PAGE)], "url string, body string")
    rows = {r.callback: r.value
            for r in apply_on_html(df, cbs).collect()}
    assert rows["bullets"] == ("First bullet of a bullet list.,"
                               "This is the second bullet.")
    assert rows["classes"] == "list-item-1,list-item-2"
    assert rows["heading"] == "Your major heading here"
