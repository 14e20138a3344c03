"""Request-body builders + request (de)serialization — the reference's
``Post``/``PostMultipart`` form construction and the serialized-request
queue wire format, re-expressed for the columnar frontier.

- ``form_body``: createFormReader (colly.go:1390-1396) — Go's
  ``url.Values.Encode`` output: keys sorted, percent-encoded,
  ``k=v&k2=v2``. The body then participates in the POST dedup key
  (S3: FNV-64a over url‖body) exactly like a PostRaw body.
- ``multipart_body``: createMultipartReader (colly.go:1398-1414) —
  byte-for-byte the reference's construction (its idiosyncratic
  leading ``Content-type:`` line inside the body, LF line endings, a
  ``Content-Length`` line with a trailing space before ``\\n\\n``).
  The reference iterates a Go map (random order); we sort part names
  so the body — and therefore the dedup hash — is deterministic.
  Boundary: the reference draws 30 random bytes (randomBoundary,
  colly.go:1416-1424); here deterministic-by-default, derived from the
  part content via FNV-64a, so identical parts → identical bytes →
  stable request hash (injectable for explicit control).
- ``marshal_request`` / ``unmarshal_request``: the serialized-request
  format of the queue storages (UnmarshalRequest colly.go:560-587;
  serializableRequest fields URL/Host/Method/Depth/Body/ID/Ctx/Headers
  with Go's JSON conventions — ``[]byte`` as base64). A queue of
  serialized requests maps to frontier rows: ``unmarshal_request``
  yields the (url, method, body) seed tuple plus depth/ctx, and the
  CLI's ``--requests @file`` feeds JSONL of these straight into
  ``Crawler.bootstrap``.

Scale note: these are driver-side seed/API helpers (bounded by seed
list size), not per-row crawl-path code — the hot path keeps bodies as
opaque ``binary`` columns.
"""

from __future__ import annotations

import base64
import json
from urllib.parse import quote_plus

from colly_spark.functions.urlnorm import fnv64a_bytes


def form_body(data: dict[str, str]) -> bytes:
    """Go ``url.Values.Encode``: sorted keys, application/x-www-form-
    urlencoded (space → '+')."""
    return "&".join(
        f"{quote_plus(str(k))}={quote_plus(str(v))}" for k, v in sorted(data.items())
    ).encode("utf-8")


def deterministic_boundary(data: dict[str, bytes]) -> str:
    """Deterministic stand-in for randomBoundary (colly.go:1416-1424):
    60 hex chars (same length as the reference's hex(30 random bytes)),
    derived from the part contents via FNV-64a."""
    acc = b"".join(
        k.encode() + b"\x00" + bytes(v) + b"\x01" for k, v in sorted(data.items())
    )
    h = fnv64a_bytes(acc) & 0xFFFFFFFFFFFFFFFF
    out = []
    while len("".join(out)) < 60:
        out.append(f"{h:016x}")
        h = fnv64a_bytes(f"{h:016x}".encode()) & 0xFFFFFFFFFFFFFFFF
    return "".join(out)[:60]


def multipart_body(data: dict[str, bytes], boundary: str | None = None) -> bytes:
    """createMultipartReader (colly.go:1398-1414), byte-for-byte, with
    sorted part order for determinism."""
    if boundary is None:
        boundary = deterministic_boundary(data)
    dash = "--" + boundary
    buf = bytearray()
    buf += f"Content-type: multipart/form-data; boundary={boundary}\n\n".encode()
    for name, content in sorted(data.items()):
        content = bytes(content)
        buf += f"{dash}\n".encode()
        buf += f"Content-Disposition: form-data; name={name}\n".encode()
        buf += f"Content-Length: {len(content)} \n\n".encode()
        buf += content
        buf += b"\n"
    buf += f"{dash}--\n\n".encode()
    return bytes(buf)


def post(url: str, data: dict[str, str]) -> tuple[str, str, bytes]:
    """``Collector.Post`` (colly.go:518-519) → a bootstrap seed tuple."""
    return (url, "POST", form_body(data))


def post_multipart(
    url: str, data: dict[str, bytes], boundary: str | None = None
) -> tuple[str, str, bytes]:
    """``Collector.PostMultipart`` (colly.go:528-536) → a seed tuple."""
    return (url, "POST", multipart_body(data, boundary))


def marshal_request(
    url: str,
    method: str = "GET",
    body: bytes | None = None,
    depth: int = 1,
    ctx: dict | None = None,
    host: str = "",
    headers: dict[str, list[str]] | None = None,
    req_id: int = 0,
) -> bytes:
    """serializableRequest JSON (request.go:216-245 Marshal): Go field
    names, ``[]byte`` body as base64, http.Header as map[string][]string."""
    sr = {
        "URL": url,
        "Host": host,
        "Method": method,
        "Depth": depth,
        "Body": base64.b64encode(bytes(body)).decode() if body is not None else None,
        "ID": req_id,
        "Ctx": ctx or {},
        "Headers": headers or {},
    }
    return json.dumps(sr, separators=(",", ":")).encode("utf-8")


def unmarshal_request(data: bytes | str) -> dict:
    """UnmarshalRequest (colly.go:560-587): parse serialized JSON back
    into the engine's seed shape. Returns
    ``{"seed": (url, method, body), "depth": int, "ctx": dict,
    "headers": dict, "host": str, "id": int}``; raises ValueError on
    malformed payloads (the reference propagates json/url parse errors)."""
    try:
        sr = json.loads(data)
    except json.JSONDecodeError as e:
        raise ValueError(f"bad serialized request: {e}") from e
    if not isinstance(sr, dict) or not sr.get("URL"):
        raise ValueError("bad serialized request: missing URL")
    raw = sr.get("Body")
    body = base64.b64decode(raw) if raw else None
    return {
        "seed": (sr["URL"], sr.get("Method") or "GET", body),
        "depth": int(sr.get("Depth") or 1),
        "ctx": sr.get("Ctx") or {},
        "headers": sr.get("Headers") or {},
        "host": sr.get("Host") or "",
        "id": int(sr.get("ID") or 0),
    }
