"""Post/PostMultipart body construction + serialized-request wire
format (functions/requests.py) — reference KATs and engine wiring."""

from __future__ import annotations

import json

import pytest

from colly_spark.functions.requests import (
    deterministic_boundary,
    form_body,
    marshal_request,
    multipart_body,
    post,
    post_multipart,
    unmarshal_request,
)


def test_form_body_go_encode_kat():
    # Go url.Values.Encode: sorted keys, '+' for space, %26 for '&'
    assert form_body({"b": "2 x", "a": "1&"}) == b"a=1%26&b=2+x"
    assert form_body({}) == b""


def test_multipart_body_reference_construction():
    """Byte-for-byte the createMultipartReader layout
    (colly.go:1398-1414): leading Content-type line, LF endings,
    'Content-Length: N \\n\\n', closing '--boundary--\\n\\n'."""
    body = multipart_body({"file1": b"hello"}, boundary="BNDRY")
    assert body == (
        b"Content-type: multipart/form-data; boundary=BNDRY\n\n"
        b"--BNDRY\n"
        b"Content-Disposition: form-data; name=file1\n"
        b"Content-Length: 5 \n\n"
        b"hello\n"
        b"--BNDRY--\n\n"
    )


def test_multipart_deterministic_and_order_independent():
    a = multipart_body({"x": b"1", "y": b"2"})
    b = multipart_body({"y": b"2", "x": b"1"})
    assert a == b                      # sorted parts → same bytes
    assert multipart_body({"x": b"1", "y": b"3"}) != a
    bd = deterministic_boundary({"x": b"1"})
    assert len(bd) == 60 and all(c in "0123456789abcdef" for c in bd)


def test_post_helpers_seed_tuples():
    url, method, body = post("http://a.test/f", {"q": "1"})
    assert (url, method, body) == ("http://a.test/f", "POST", b"q=1")
    url, method, body = post_multipart("http://a.test/m", {"p": b"z"}, "B")
    assert method == "POST" and b"--B\n" in body


def test_marshal_unmarshal_roundtrip():
    data = marshal_request(
        "http://a.test/x", "POST", b"abc", depth=3,
        ctx={"referer": "http://a.test/"}, host="a.test",
        headers={"X-H": ["v"]}, req_id=7)
    sr = json.loads(data)
    # Go JSON conventions: capitalized field names, []byte as base64
    assert sr["URL"] == "http://a.test/x" and sr["Body"] == "YWJj"
    r = unmarshal_request(data)
    assert r["seed"] == ("http://a.test/x", "POST", b"abc")
    assert r["depth"] == 3 and r["ctx"] == {"referer": "http://a.test/"}
    assert r["headers"] == {"X-H": ["v"]} and r["host"] == "a.test"
    assert r["id"] == 7


def test_unmarshal_defaults_and_errors():
    r = unmarshal_request(b'{"URL": "http://a.test/"}')
    assert r["seed"] == ("http://a.test/", "GET", None)
    assert r["depth"] == 1 and r["ctx"] == {}
    with pytest.raises(ValueError):
        unmarshal_request(b"not json")
    with pytest.raises(ValueError):
        unmarshal_request(b'{"Method": "GET"}')   # missing URL


def test_multipart_post_dedup_parity(spark):
    """Two PostMultipart submissions with identical parts produce
    identical bodies (deterministic boundary) → the FNV-64a dedup key
    (S3) collapses them; different parts → distinct keys."""
    from colly_spark.functions.urlnorm import fnv64a_batch

    s1 = post_multipart("http://d00.test/upload", {"f": b"data"})
    s2 = post_multipart("http://d00.test/upload", {"f": b"data"})
    s3 = post_multipart("http://d00.test/upload", {"f": b"DATA"})
    h = fnv64a_batch(
        [s1[0], s2[0], s3[0]], [s1[2], s2[2], s3[2]])
    assert h[0] == h[1] != h[2]


def test_bootstrap_accepts_depth_tuples(spark, corpus_spark, tmp_path):
    """4-ary seed tuples (deserialized queue requests) keep their
    Depth: with max_depth=2, a depth-2 seed is admitted but its links
    (depth 3) are rejected."""
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(max_depth=2, ignore_robots=True)
    c = Crawler(spark, corpus_spark, cfg, str(tmp_path / "st"))
    r = unmarshal_request(marshal_request("http://d00.test/", depth=2))
    handles = c.run([(*r["seed"], r["depth"])])
    trace = handles.trace().toPandas()
    assert (trace["depth"] == 2).all() and len(trace) == 1
