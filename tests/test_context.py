"""The generic request Context API (context.go:22-88) — pure-Python
unit tests mirroring context_test.go's Put/Get/GetAny/ForEach
iteration contract, plus the JSON column encoding the engine carries
through the frontier."""

from colly_spark.functions.context import Context, ctx_json


def test_put_get_narrows_to_string():
    c = Context()
    c.Put("k", "v")
    c.Put("n", 7)
    # Get returns the string value or "" (context.go:52-58)
    assert c.Get("k") == "v"
    assert c.Get("n") == ""
    assert c.Get("absent") == ""
    # GetAny returns the raw value or None (context.go:62-68)
    assert c.GetAny("n") == 7
    assert c.GetAny("absent") is None


def test_foreach_applies_to_every_pair():
    # context_test.go iteration contract: fn over every (k, v),
    # results collected
    c = Context({"a": "1", "b": "2"})
    out = sorted(c.ForEach(lambda k, v: f"{k}={v}"))
    assert out == ["a=1", "b=2"]
    assert len(c) == 2


def test_json_roundtrip_deterministic():
    c = Context({"b": "2", "a": "1"})
    s = c.to_json()
    # sorted keys, compact — hash-stable for oracles
    assert s == '{"a":"1","b":"2"}'
    assert Context.from_json(s) == c
    # dict and Context encode identically; empty → NULL column
    assert ctx_json({"b": "2", "a": "1"}) == s
    assert ctx_json(s) == s
    assert ctx_json(None) is None
    assert ctx_json({}) is None
    assert ctx_json(Context()) is None
