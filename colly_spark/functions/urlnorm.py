"""URL canonicalization + hashing kernel.

Reimplements (from public WHATWG URL spec + observed reference behavior,
NOT by porting code) the URL handling of the reference crawl engine:

- WHATWG basic-URL-parser normalization with single-percent-sign encoding
  (reference: parser.go:35-78 wraps a WHATWG parser constructed
  ``WithPercentEncodeSinglePercentSign``; behavior pinned by
  colly_test.go:953-1016 — TestTabsAndNewlines, TestLonePercent).
- Relative URL resolution against the page URL or a ``<base href>`` tag
  (reference: request.go:251-262 AbsoluteURL; colly_test.go:905-951
  TestBaseTag / TestBaseTagRelative). ``#fragment``-only hrefs resolve
  to "" (skipped).
- FNV-64a request hashing over the canonicalized URL (plus body for
  POST) (reference: colly.go:1484-1498 requestHash).

Everything here is pure Python / numpy so it can run inside vectorized
pandas UDFs on executors — there is no JVM equivalent of these exact
semantics, and parity of this kernel is what makes the whole crawl
(dedup keys, visit ordering) parity-exact.

Scale note: FNV-64a is computed with a **numpy column-sweep** — one
vectorized pass per byte *position* over the whole Arrow batch (so a
10k-row batch of 200-byte URLs costs ~200 numpy ops, not 2M Python
ops). Canonicalization is per-row Python over the batch but is a pure
string pass dominated by the (rare) encode path.
"""

from __future__ import annotations

import numpy as np

FNV64_OFFSET = np.uint64(14695981039346656037)
FNV64_PRIME = np.uint64(1099511628211)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}
_HEX = "0123456789ABCDEFabcdef"

# WHATWG path percent-encode set (C0 + space + " < > ` ? # { }) — we encode
# the ASCII members we can meet in the synthetic corpus; non-ASCII is
# UTF-8 percent-encoded.
_PATH_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@/%"
)
# WHATWG query percent-encode set: C0, space, ", #, <, > (and ' for special
# schemes). Notably "%" is NOT re-encoded in the query — pinned by
# TestLonePercent: "/?a=100%zz" stays "a=100%zz".
_QUERY_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@/?%[]{}|\\^`"
)


def _strip_c0_and_tabs_newlines(url: str) -> str:
    """WHATWG basic URL parser steps 1-3: trim C0-control/space at both
    ends, then remove all ASCII tab and newline characters anywhere."""
    start, end = 0, len(url)
    while start < end and url[start] <= " ":
        start += 1
    while end > start and url[end - 1] <= " ":
        end -= 1
    url = url[start:end]
    if "\t" in url or "\n" in url or "\r" in url:
        url = url.replace("\t", "").replace("\n", "").replace("\r", "")
    return url


def _pct_encode(s: str, safe: frozenset, encode_lone_percent: bool) -> str:
    if not s:
        return s
    out = []
    i, n = 0, len(s)
    for i in range(n):
        ch = s[i]
        if ch == "%":
            if encode_lone_percent and not (
                i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX
            ):
                # WithPercentEncodeSinglePercentSign: a "%" not starting a
                # valid escape becomes "%25" (TestLonePercent: /100% →
                # /100%25).
                out.append("%25")
            else:
                out.append(ch)
        elif ch in safe:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if "." not in path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve trailing slash semantics of "/a/." and "/a/.."
    last = path.rsplit("/", 1)[-1]
    joined = "/".join(output)
    if last in (".", "..") and not joined.endswith("/"):
        joined += "/"
    return joined


def split_url(url: str):
    """Split an absolute URL into (scheme, userinfo, host, port, path,
    query, fragment) without any normalization. query/fragment are None
    when their delimiter is absent."""
    scheme = ""
    rest = url
    for i, ch in enumerate(url):
        if ch == ":" and i > 0:
            cand = url[:i]
            if cand.replace("+", "").replace("-", "").replace(".", "").isalnum() and cand[0].isalpha():
                scheme, rest = cand, url[i + 1 :]
            break
        if not (ch.isalnum() or ch in "+-."):
            break
    fragment = None
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    query = None
    if "?" in rest:
        rest, query = rest.split("?", 1)
    userinfo, host, port, path = "", "", "", ""
    if rest.startswith("//"):
        authority = rest[2:]
        slash = len(authority)
        for i, ch in enumerate(authority):
            if ch == "/":
                slash = i
                break
        authority, path = authority[:slash], authority[slash:]
        if "@" in authority:
            userinfo, authority = authority.rsplit("@", 1)
        if authority.startswith("["):  # IPv6
            close = authority.find("]")
            host = authority[: close + 1]
            if close + 1 < len(authority) and authority[close + 1] == ":":
                port = authority[close + 2 :]
        elif ":" in authority:
            host, port = authority.split(":", 1)
        else:
            host = authority
    else:
        path = rest
    return scheme, userinfo, host, port, path, query, fragment


def canonicalize(url: str) -> str:
    """Canonicalize an absolute URL to its WHATWG serialized form.

    Mirrors the reference's whatwgParser.Parse → url.String() round trip
    (parser.go:60-67) for the URL shapes in the synthetic corpus:
    lowercased scheme+host, default-port elision, dot-segment removal,
    empty path → "/", tab/newline stripping, lone-% encoding in path,
    query preserved byte-for-byte except C0/space/"<>" encoding.

    Returns "" for URLs we cannot parse as absolute http(s) URLs.
    """
    url = _strip_c0_and_tabs_newlines(url)
    if not url:
        return ""
    scheme, userinfo, host, port, path, query, fragment = split_url(url)
    if not scheme or not host:
        return ""
    scheme = scheme.lower()
    host = host.lower()
    if port and port == _DEFAULT_PORTS.get(scheme):
        port = ""
    if not path:
        path = "/"
    if not path.startswith("/"):
        path = "/" + path
    path = _remove_dot_segments(path)
    path = _pct_encode(path, _PATH_SAFE, encode_lone_percent=True)
    out = [scheme, "://"]
    if userinfo:
        out.append(userinfo + "@")
    out.append(host)
    if port:
        out.append(":" + port)
    out.append(path)
    if query is not None:
        out.append("?" + _pct_encode(query, _QUERY_SAFE, encode_lone_percent=False))
    if fragment is not None and fragment != "":
        out.append("#" + fragment)
    return "".join(out)


def hostname(url: str) -> str:
    """Hostname (no port) of a canonical URL — the domain used by
    filters and politeness rules (reference: colly.go:775-790 matches on
    ``parsedURL.Hostname()``)."""
    _, _, host, _, _, _, _ = split_url(url)
    return host.lower()


def resolve(base_url: str, href: str) -> str:
    """AbsoluteURL: resolve ``href`` against ``base_url`` and
    canonicalize. Fragment-only hrefs return "" (reference:
    request.go:251-262 returns "" when the href starts with '#')."""
    href = _strip_c0_and_tabs_newlines(href)
    if href.startswith("#"):
        return ""
    if not href:
        return canonicalize(base_url)
    scheme, _, host, _, _, _, _ = split_url(href)
    if scheme and host:
        return canonicalize(href)
    if scheme and not host:
        # e.g. "mailto:x" or malformed — not crawlable
        if scheme not in ("http", "https"):
            return ""
    b_scheme, b_user, b_host, b_port, b_path, b_query, _ = split_url(base_url)
    if not b_scheme or not b_host:
        return ""
    authority = (b_user + "@" if b_user else "") + b_host + (":" + b_port if b_port else "")
    if href.startswith("//"):
        return canonicalize(b_scheme + ":" + href)
    if href.startswith("/"):
        return canonicalize(f"{b_scheme}://{authority}{href}")
    # relative path: strip last segment of base path
    h_query = None
    if "#" in href:
        href = href.split("#", 1)[0]
    if href.startswith("?"):
        return canonicalize(f"{b_scheme}://{authority}{b_path or '/'}{href}")
    base_dir = (b_path or "/").rsplit("/", 1)[0] + "/"
    return canonicalize(f"{b_scheme}://{authority}{base_dir}{href}")


def fnv64a_bytes(data: bytes) -> int:
    """Scalar FNV-64a (reference: colly.go:1484-1498 uses fnv.New64a()
    over canonicalized URL ‖ body). Returns unsigned 64-bit int."""
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def request_hash(url: str, body: bytes | None = None) -> int:
    """uint64 dedup key: FNV-64a over canonicalize(url) ‖ body.
    Falls back to the raw URL when canonicalization fails, matching the
    reference's err fallback."""
    canon = canonicalize(url) or url
    data = canon.encode("utf-8")
    if body:
        data += body
    return fnv64a_bytes(data)


_SAFE_BASENAME = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-_~")


def sanitize_filename(name: str) -> str:
    """Safe filename from a URL/path (reference: SanitizeFileName,
    colly.go:1377-1388 — split extension, sanitize both halves to a
    conservative base-name charset, '.unknown' when the extension
    sanitizes away, then all '-' → '_')."""
    dot = name.rfind(".")
    slash = max(name.rfind("/"), name.rfind("\\"))
    stem, ext = (name, "") if dot <= slash else (name[:dot], name[dot:])

    def base(s: str) -> str:
        out = "".join(ch if ch in _SAFE_BASENAME else "-" for ch in s)
        return out.strip("-.")

    clean_ext = base(ext) or "unknown"
    return f"{base(stem)}.{clean_ext}".replace("-", "_")


def to_signed64(h: int) -> int:
    """Reinterpret uint64 as int64 (Spark LongType has no unsigned)."""
    return h - (1 << 64) if h >= (1 << 63) else h


def fnv64a_batch(strings, bodies=None) -> np.ndarray:
    """Vectorized FNV-64a over a batch of strings (+ optional per-row
    body bytes): one numpy pass per byte position. Returns int64 array
    (uint64 bit-reinterpreted) suitable for a LongType column.
    """
    n = len(strings)
    encoded = []
    for i in range(n):
        s = strings[i]
        b = (s.encode("utf-8") if isinstance(s, str) else bytes(s or b""))
        if bodies is not None:
            body = bodies[i]
            if body:
                b += bytes(body)
        encoded.append(b)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    mat = np.zeros((n, max_len), dtype=np.uint8)
    for i, b in enumerate(encoded):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, FNV64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            active = lens > j
            if not active.any():
                break
            hj = h[active]
            h[active] = (hj ^ mat[active, j].astype(np.uint64)) * FNV64_PRIME
    return h.view(np.int64)
