"""HTMLElement / XMLElement accessor API (element.go:21-260).

The reference hands callbacks an element object with child-query
accessors; here the same API wraps a :class:`~colly_spark.operators.
dom.Node` so spec-driven extraction (unmarshal, the callback
registry's spec kinds) and user code share one surface:

- ``HTMLElement`` — CSS selectors via dom.select (goquery analogue,
  element.go:75-153): Attr, ChildText (concatenated text of ALL
  matches, stripped — goquery ``Find(sel).Text()`` semantics),
  ChildTexts (per-match, stripped), ChildAttr (first match, stripped),
  ChildAttrs (present attrs only, stripped), ForEach /
  ForEachWithBreak (running index across matches; the break variant
  stops when the callback returns falsy, element.go:139-153).
- ``XMLElement`` — XPath via dom.xpath_lite (element.go:160-260, the
  htmlquery/xmlquery analogue); same accessor set.

These are plain-Python objects used *inside* Arrow-batched UDFs (one
DOM parse per document, accessors per element) — never per-row Spark
calls.
"""

from __future__ import annotations

from colly_spark.operators.dom import Node, select, xpath_lite


class _ElementBase:
    __slots__ = ("node", "index")

    def __init__(self, node: Node, index: int = 0):
        self.node = node
        self.index = index

    @property
    def name(self) -> str:
        return self.node.tag

    @property
    def text(self) -> str:
        return self.node.text()

    def attr(self, key: str) -> str:
        """Element's own attribute, '' when absent (element.go:75-83)."""
        return self.node.attrs.get(key, "")

    # subclasses supply _find(query) -> list[Node | str]

    def child_text(self, query: str) -> str:
        """Concatenated text of ALL matches, stripped (goquery
        Find().Text() — element.go:86-88)."""
        parts = [n.text() if isinstance(n, Node) else str(n)
                 for n in self._find(query)]
        return "".join(parts).strip()

    def child_texts(self, query: str) -> list[str]:
        """Per-match stripped text (element.go:91-99)."""
        return [(n.text() if isinstance(n, Node) else str(n)).strip()
                for n in self._find(query)]

    def child_attr(self, query: str, attr: str) -> str:
        """First match's attribute, stripped; '' when no match or no
        attribute (element.go:102-108)."""
        for n in self._find(query):
            if isinstance(n, Node):
                return (n.attrs.get(attr) or "").strip()
        return ""

    def child_attrs(self, query: str, attr: str) -> list[str]:
        """All matches that carry the attribute, stripped
        (element.go:111-121)."""
        out = []
        for n in self._find(query):
            if isinstance(n, Node) and attr in n.attrs:
                out.append((n.attrs.get(attr) or "").strip())
        return out

    def for_each(self, query: str, callback) -> None:
        """callback(i, element) per match with a running index
        (element.go:125-134)."""
        for i, n in enumerate(self._find(query)):
            if isinstance(n, Node):
                callback(i, type(self)(n, i))

    def for_each_with_break(self, query: str, callback) -> None:
        """Like for_each, but stops when the callback returns falsy
        (element.go:142-153)."""
        i = 0
        for n in self._find(query):
            if not isinstance(n, Node):
                continue
            if not callback(i, type(self)(n, i)):
                return
            i += 1


class HTMLElement(_ElementBase):
    """CSS-selector accessors (goquery analogue)."""

    def _find(self, query: str):
        return select(self.node, query)


class XMLElement(_ElementBase):
    """XPath accessors over HTML and XML docs alike (the reference's
    XMLElement serves both via htmlquery/xmlquery)."""

    def _find(self, query: str):
        return xpath_lite(self.node, query)
