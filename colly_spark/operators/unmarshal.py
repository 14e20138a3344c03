"""Declarative field extraction — the UnmarshalHTML analogue (E3).

Reference: ``UnmarshalHTML`` fills a struct from CSS-selector tags
``selector:"css" attr:"x"`` (unmarshal.go:43-77; accessors
element.go:75-260, pinned by unmarshal_test.go:18-161). The Spark
shape: a *spec* — a list of ``{field, selector, attr?}`` dicts — drives
one HTML parse per document inside an Arrow-batched UDF returning a
struct column (spec fixed per run, like the registered callbacks).

Selector subset (covers the reference test patterns): ``tag``,
``.class``, ``#id``, ``tag.class``, ``tag#id``, ``tag[attr]``,
``tag[attr=value]``. First match in document order wins; without
``attr`` the field is the element's text content.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser


def _parse_selector(sel: str):
    m = re.match(r"^([a-zA-Z0-9]*)?(?:#([\w-]+))?(?:\.([\w-]+))?(?:\[([\w-]+)(?:=([^\]]*))?\])?$",
                 sel.strip())
    if not m:
        return None
    tag, id_, cls, attr, attr_val = m.groups()
    return (tag.lower() if tag else None, id_, cls, attr, attr_val)


# HTML void elements never get an end tag — they must not open a depth
# level, or a <br> inside a captured element keeps the capture alive
# past the element's close (goquery/DOM text semantics).
_VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class _FieldExtractor(HTMLParser):
    def __init__(self, specs):
        super().__init__(convert_charrefs=True)
        # specs: [(field, parsed_selector, attr_or_None)]
        self.specs = specs
        self.values: dict = {}
        self._capturing: list = []  # (field, depth_mark)
        self._depth = 0

    def _matches(self, sel, tag, attrs):
        stag, sid, scls, sattr, sattr_val = sel
        if stag and tag != stag:
            return False
        a = dict(attrs)
        if sid and a.get("id") != sid:
            return False
        if scls and scls not in (a.get("class") or "").split():
            return False
        if sattr is not None:
            if sattr not in a:
                return False
            if sattr_val is not None and a.get(sattr) != sattr_val:
                return False
        return True

    def handle_starttag(self, tag, attrs):
        is_void = tag in _VOID_ELEMENTS
        if not is_void:
            self._depth += 1
        for field, sel, attr in self.specs:
            if field in self.values:
                continue
            if self._matches(sel, tag, attrs):
                if attr is not None:
                    v = dict(attrs).get(attr)
                    if v is not None:
                        self.values[field] = v
                else:
                    self.values.setdefault(field, "")
                    if not is_void:  # void elements have no text content
                        self._capturing.append((field, self._depth))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_ELEMENTS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _VOID_ELEMENTS:  # stray </br> etc. — no depth level
            return
        self._capturing = [(f, d) for f, d in self._capturing if d < self._depth]
        self._depth -= 1

    def handle_data(self, data):
        for field, _d in self._capturing:
            self.values[field] = self.values.get(field, "") + data


def extract_fields(html: str, spec: list[dict]) -> dict:
    """One document → {field: value_or_None} per the spec."""
    compiled = []
    for s in spec:
        sel = _parse_selector(s["selector"])
        if sel is not None:
            compiled.append((s["field"], sel, s.get("attr")))
    p = _FieldExtractor(compiled)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    out = {}
    for s in spec:
        v = p.values.get(s["field"])
        out[s["field"]] = v.strip() if isinstance(v, str) else v
    return out


def extract_fields_udf(spec: list[dict]):
    """Arrow-batched UDF: html → struct<field: string, …> per spec."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    fields = [s["field"] for s in spec]
    schema = StructType([StructField(f, StringType()) for f in fields])

    def _udf(htmls):
        rows = [extract_fields(h or "", spec) for h in htmls]
        return pd.DataFrame(rows, columns=fields)

    return F.pandas_udf(_udf, schema)
