"""The v3 ordered/positioned callback registry (event.go:11-364) and
its Spark bridge.

The reference keeps every user callback in an ``EventCallbacks`` list
grouped by ``(event, arg)`` — arg is the CSS selector for ON_HTML, the
XPath for ON_XML, ``NO_ARG`` for the request/response/error/scraped
events — with an *explicit integer position* per item: ``Add`` with a
position sets/overwrites that slot, ``Add`` without appends after the
current maximum key, and firing order is ascending position
(event.go:234-358 set/append/sort; exhaustive state tables in
event_test.go:12-3188). ``EventCallbacks`` here replays those exact
semantics.

Spark-side, callbacks can't be per-row closures — they become
*declarative specs* (the SURVEY §2.9 mapping: "everything
user-extensible becomes a UDF or config value"). ``on_html_plan``
turns the registry's ON_HTML slice into the ordered ``(selector,
[spec, ...])`` program, and ``apply_on_html`` runs it as one
Arrow-batched UDF producing a row per (element × callback) in the
reference's firing order: selectors in registration order — a
deterministic refinement of Go's map iteration in handleOnHTML
(collector.go:279), which guarantees no inter-selector order —
elements in document order with a running per-selector index
(collector.go:281-284), callbacks at one element in ascending
position (collector.go:293-297 iterates the sorted list).
"""

from __future__ import annotations

import math

# event ids — collector.go:54-61
ON_REQUEST = 0
ON_RESPONSE_HDR = 1
ON_RESPONSE = 2
ON_ERROR = 3
ON_HTML = 4
ON_XML = 5
ON_SCRAPED = 6

# collector.go:64
NO_ARG = ""

_MAX_INT = 2**63 - 1  # Go math.MaxInt on 64-bit (event.go:285)


class _ItemList:
    """eventArgItemList (event.go:258-364): int-keyed slots, fired in
    ascending-key order."""

    def __init__(self):
        self.original: dict[int, object] = {}

    def set(self, key: int, item) -> bool:
        present = key in self.original
        self.original[key] = item
        return not present

    def append(self, item) -> bool:
        # a MaxInt slot blocks further appends (event.go:284-286)
        if _MAX_INT in self.original:
            return False
        key = 0
        if self.original:
            key = max(self.original) + 1
        self.original[key] = item
        return True

    def remove(self, key: int) -> bool:
        if key not in self.original:
            return False
        del self.original[key]
        return True

    @property
    def sorted(self) -> list:
        return [self.original[k] for k in sorted(self.original)]

    def count(self) -> int:
        return len(self.original)

    def is_empty(self) -> bool:
        return not self.original


class EventCallbacks:
    """eventList (event.go:21-137): the collector's callback registry.

    Python dicts preserve insertion order, so ``get(event)`` yields
    args in registration order — a deterministic refinement of the
    reference's (unordered) map iteration."""

    def __init__(self):
        self._events: dict[int, dict[str, _ItemList]] = {}
        self._counters: dict[int, int] = {}

    # -- mutation (event.go:58-79) --------------------------------

    def add(self, event: int, arg: str, item, index: int | None = None) -> None:
        args = self._events.setdefault(event, {})
        il = args.setdefault(arg, _ItemList())
        incr = il.set(index, item) if index is not None else il.append(item)
        if incr:
            self._counters[event] = self._counters.get(event, 0) + 1

    def remove(self, event: int, arg: str, *indices: int) -> None:
        args = self._events.get(event)
        if args is None or arg not in args:
            return
        if not indices:
            self._counters[event] = self._counters.get(event, 0) - args[arg].count()
            del args[arg]
            return
        for key in indices:
            if args[arg].remove(key):
                self._counters[event] = self._counters.get(event, 0) - 1

    # -- access (event.go:83-137) ---------------------------------

    def get(self, event: int) -> dict[str, list]:
        args = self._events.get(event)
        if not args:
            return {}
        return {arg: il.sorted for arg, il in args.items() if not il.is_empty()}

    def get_arg(self, event: int, arg: str) -> list:
        args = self._events.get(event)
        if not args or arg not in args or args[arg].is_empty():
            return []
        return args[arg].sorted

    def count(self, event: int, *args: str) -> int:
        evs = self._events.get(event)
        if evs is None:
            return 0
        if not args:
            return self._counters.get(event, 0)
        return sum(evs[a].count() for a in args if a in evs)

    def is_empty(self, event: int, *args: str) -> bool:
        evs = self._events.get(event)
        if evs is None:
            return True
        if not args:
            return self._counters.get(event, 0) == 0
        return all(a not in evs or evs[a].is_empty() for a in args)


# ---------------------------------------------------------------------------
# Spark bridge — registry → ordered extraction program
# ---------------------------------------------------------------------------


def on_html_plan(cbs: EventCallbacks) -> list[tuple[str, list]]:
    """The ON_HTML firing program: [(selector, [spec in position
    order]), ...] with selectors in registration order."""
    return [(sel, list(specs)) for sel, specs in cbs.get(ON_HTML).items()]


def _fire_rows(text: str, plan: list[tuple[str, list]]) -> list[dict]:
    """One parse, then the handleOnHTML loop (collector.go:279-301):
    per selector → matched elements in document order with running
    index → each registered spec in position order. A spec is a dict
    {name, kind, attr?, query?}: kind 'text' captures element text,
    'attr' captures attrs[attr], 'html' the tag name, and the
    element-accessor kinds 'child_text'/'child_texts'/'child_attr'/
    'child_attrs' (element.go:86-121) run the spec's ``query``
    (CSS) against the matched element — what a reference callback
    does by calling e.ChildText(...); multi-valued accessors join
    with ','."""
    from colly_spark.operators.dom import parse_dom, select
    from colly_spark.operators.element import HTMLElement

    root = parse_dom(text or "")
    rows: list[dict] = []
    fire_seq = 0
    for sel, specs in plan:
        for idx, n in enumerate(select(root, sel)):
            for spec in specs:
                kind = spec.get("kind", "text")
                if kind == "attr":
                    value = n.attrs.get(spec.get("attr", ""), None)
                elif kind == "html":
                    value = n.tag
                elif kind == "child_text":
                    value = HTMLElement(n, idx).child_text(spec.get("query", ""))
                elif kind == "child_texts":
                    value = ",".join(
                        HTMLElement(n, idx).child_texts(spec.get("query", "")))
                elif kind == "child_attr":
                    value = HTMLElement(n, idx).child_attr(
                        spec.get("query", ""), spec.get("attr", ""))
                elif kind == "child_attrs":
                    value = ",".join(HTMLElement(n, idx).child_attrs(
                        spec.get("query", ""), spec.get("attr", "")))
                else:
                    value = n.text().strip()
                rows.append(dict(fire_seq=fire_seq, selector=sel, index=idx,
                                 callback=spec.get("name", ""), value=value))
                fire_seq += 1
    return rows


def _fires_schema():
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)

    return ArrayType(StructType([
        StructField("fire_seq", IntegerType()),
        StructField("selector", StringType()),
        StructField("index", IntegerType()),
        StructField("callback", StringType()),
        StructField("value", StringType()),
    ]))


def apply_on_html(df, cbs: EventCallbacks, text_col: str = "body",
                  key_cols: tuple = ("url",)):
    """Run the registry's ON_HTML program over an HTML column: one
    Arrow-batched UDF pass (the plan is captured at call time — the
    registry is driver-side config, exactly like the reference's
    collector setup phase), exploded to a row per callback firing.

    Returns key_cols + (fire_seq, selector, index, callback, value);
    fire_seq is the total firing order within each document. Map-side
    only — no shuffle; at 100 TB this is scan-speed."""
    import pandas as pd
    from pyspark.sql import functions as F

    plan = on_html_plan(cbs)

    def _udf(htmls):
        return pd.Series([_fire_rows(h or "", plan) for h in htmls])

    udf = F.pandas_udf(_udf, _fires_schema())
    fired = df.select(*key_cols, F.explode(udf(F.col(text_col))).alias("f"))
    return fired.select(*key_cols, "f.fire_seq", "f.selector", "f.index",
                        "f.callback", "f.value")
