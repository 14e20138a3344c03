"""Declarative field extraction — the UnmarshalHTML analogue (E3).

Reference: ``UnmarshalHTML`` fills a struct from CSS-selector tags
``selector:"css" attr:"x"`` (unmarshal.go:40-120; accessors
element.go:75-260, pinned by unmarshal_test.go:18-161). The Spark
shape: a *spec* — a list of dicts — drives one DOM parse per document
inside an Arrow-batched UDF returning a struct column (spec fixed per
run, like the registered callbacks).

Spec entry grammar (mirrors the reference's supported field kinds):

    {"field": name, "selector": css}                  → string (first match text)
    {"field": name, "selector": css, "attr": a}       → string (first match attr)
    {"field": name, "selector": css, "many": True}    → [string] ([]string / ChildTexts)
    {"field": name, "selector": css, "fields": [...]} → struct (nested, scoped)
    {...,  "many": True, "fields": [...]}             → [struct] ([]struct slice)

Selectors run on the shared CSS engine (operators/dom.py): compound
selectors, descendant and ``>`` child combinators, selector lists,
``:first-child``/``:last-child``/``:nth-child(n)`` — the grammar the
reference tests exercise (``li:first-child``, ``div > p``,
``li.info``). An empty/absent selector with ``fields`` keeps the
current scope (the embedded-struct case of TestBasicUnmarshal).
"""

from __future__ import annotations

from colly_spark.operators.dom import Node, parse_dom, select


def _value_of(node: Node, attr: str | None):
    if attr is not None:
        return node.attrs.get(attr)
    return node.text()


def _clean(v):
    return v.strip() if isinstance(v, str) else v


def apply_spec(scope: Node, spec: list[dict]) -> dict:
    """Evaluate a spec against a DOM scope (document root or a matched
    element for nested structs)."""
    out: dict = {}
    for s in spec:
        field = s["field"]
        selector = s.get("selector") or ""
        nodes = select(scope, selector) if selector else [scope]
        if s.get("fields"):
            if s.get("many"):
                out[field] = [apply_spec(n, s["fields"]) for n in nodes]
            else:
                out[field] = apply_spec(nodes[0], s["fields"]) if nodes else None
        elif s.get("many"):
            vals = (_value_of(n, s.get("attr")) for n in nodes)
            out[field] = [_clean(v) for v in vals if v is not None]
        else:
            v = None
            for n in nodes:
                v = _value_of(n, s.get("attr"))
                if v is not None:
                    break
            out[field] = _clean(v)
    return out


def extract_fields(html: str, spec: list[dict]) -> dict:
    """One document → {field: value} per the spec."""
    return apply_spec(parse_dom(html or ""), spec)


def _spec_schema(spec: list[dict]):
    from pyspark.sql.types import (ArrayType, StringType, StructField,
                                   StructType)

    fields = []
    for s in spec:
        if s.get("fields"):
            sub = _spec_schema(s["fields"])
            t = ArrayType(sub) if s.get("many") else sub
        elif s.get("many"):
            t = ArrayType(StringType())
        else:
            t = StringType()
        fields.append(StructField(s["field"], t))
    return StructType(fields)


def extract_fields_udf(spec: list[dict]):
    """Arrow-batched UDF: html → struct per spec (nested structs and
    string arrays typed accordingly)."""
    import pandas as pd
    from pyspark.sql import functions as F

    schema = _spec_schema(spec)
    names = [s["field"] for s in spec]

    def _udf(htmls):
        rows = [extract_fields(h or "", spec) for h in htmls]
        return pd.DataFrame(rows, columns=names)

    return F.pandas_udf(_udf, schema)
