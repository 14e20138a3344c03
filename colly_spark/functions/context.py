"""Generic per-request Context — the reference's KV bag crossing the
request→response boundary (context.go:22-88: NewContext, Put, Get,
GetAny, ForEach; extensions/referer.go:10-19 is its canonical user).

In the engine the context rides the frontier as a single ``ctx``
column holding deterministic JSON (sorted keys, compact separators) —
schema-stable, hash-stable for oracles, and cheap to carry through
every checkpoint. Discovered links inherit their parent's context
verbatim, matching the reference where ``Request.Visit`` passes the
SAME Ctx object to the child request (colly.go:589 scrape(..., r.Ctx)
via request.go:151-153); the engine's declarative pipeline has no
mid-flight mutation hooks, so inherit-by-value at discovery time is
the reproducible equivalent.

The ``referer`` column (and the cookie jar) remain dedicated columns:
they are the two context users whose *semantics* the engine implements
natively; ``ctx`` carries arbitrary user KV state.
"""

from __future__ import annotations

import json


class Context:
    """Mirror of the reference Context API (context.go:22-88). Values
    are JSON-representable; ``Get`` narrows to string like the
    reference (non-strings come back as "" there — we match)."""

    __slots__ = ("_m",)

    def __init__(self, initial: dict | None = None):
        self._m: dict = dict(initial or {})

    # context.go:40-44
    def Put(self, key: str, value) -> None:
        self._m[key] = value

    # context.go:52-58 — returns the string value or ""
    def Get(self, key: str) -> str:
        v = self._m.get(key)
        return v if isinstance(v, str) else ""

    # context.go:62-68 — returns the raw value or None (Go nil)
    def GetAny(self, key: str):
        return self._m.get(key)

    # context.go:72-80
    def UnmarshalBinary(self, _data) -> None:  # interface parity
        return None

    # context.go:82-88 — apply fn to every (k, v), collect results
    def ForEach(self, fn) -> list:
        return [fn(k, v) for k, v in self._m.items()]

    def to_json(self) -> str | None:
        return ctx_json(self._m)

    @classmethod
    def from_json(cls, s: str | None) -> "Context":
        return cls(json.loads(s) if s else None)

    def __len__(self) -> int:
        return len(self._m)

    def __eq__(self, other) -> bool:
        return isinstance(other, Context) and self._m == other._m

    def __repr__(self) -> str:
        return f"Context({self._m!r})"


def ctx_json(ctx) -> str | None:
    """Deterministic JSON for a context (dict / Context / None).
    Empty → None (NULL column), so requests without a context cost
    nothing in the frontier."""
    if ctx is None:
        return None
    if isinstance(ctx, Context):
        ctx = ctx._m
    if isinstance(ctx, str):
        return ctx if ctx else None
    if not ctx:
        return None
    return json.dumps(ctx, sort_keys=True, separators=(",", ":"))
