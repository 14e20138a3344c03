"""HTML extraction — the OnHTML analogue.

Reference: colly.go:1086-1119 (handleOnHTML) parses each HTML response
once with goquery and fires registered CSS-selector callbacks per
matched node in document order; a ``<base href>`` tag rebinds relative
URL resolution (colly.go:1094-1103, pinned by colly_test.go:905-951).
Content gate: only responses whose Content-Type contains "html" are
parsed (colly.go:1087).

Here the fixed "registered selector set" is {a[href], img[src],
figure>figcaption} and extraction runs as ONE stdlib-HTMLParser pass
per document inside a vectorized Arrow batch (mapInPandas /
pandas_udf) — the idiomatic Spark shape for "parse page once, emit
element rows" (then ``explode``).

Scale: this stage is map-side only (no shuffle), CPU-bound, and is
where hot-domain skew shows up — the crawler repartitions fetched rows
round-robin *before* this stage for even extraction load
(plans/crawler.py), which is legal because extraction is per-row.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from colly_spark.functions.urlnorm import resolve

_GZIP_MAGIC = b"\x1f\x8b"
_CT_CHARSET_RE = re.compile(r"charset=[\"']?([\w.\-]+)", re.I)
_META_CHARSET_RE = re.compile(r"<meta[^>]+charset=[\"']?([\w.\-]+)", re.I)
_XML_ENCODING_RE = re.compile(r"<\?xml[^>]+encoding=[\"']([\w.\-]+)")


def decode_body(url: str, body, content_type: str | None, max_body_size: int):
    """X2 body normalization — transparent gzip + MaxBodySize.

    Reference: http_backend.go:229-244 wraps the response in a gzip
    reader for ``Content-Encoding: gzip`` and the ``.xml.gz`` path
    (colly.go:1123-1182 detects xml by path too), then LimitReader
    truncates the **decoded** stream to MaxBodySize. Here: a body with
    the gzip magic whose URL/Content-Type says gz/html/xml is
    decompressed (the corpus carries no separate header map, so the
    magic + label stands in for Content-Encoding); ``.xml.gz`` rewrites
    the effective Content-Type to xml. Returns (bytes|None, eff_ct).
    """
    ct = content_type or ""
    data = bytes(body) if body is not None else None
    lurl = (url or "").lower()
    if data is not None and data[:2] == _GZIP_MAGIC:
        lct = ct.lower()
        if (lurl.endswith(".gz") or "gzip" in lct
                or "html" in lct or "xml" in lct):
            import gzip

            try:
                data = gzip.decompress(data)
                if lurl.endswith(".xml.gz"):
                    ct = "application/xml"
            except (OSError, EOFError):
                pass  # corrupt gzip → raw bytes (poison-row tolerance)
    if data is not None:
        data = data[:max_body_size]
    return data, ct


def _walk_sjis(data: bytes):
    """Structural Shift-JIS walk: returns (double_byte_pairs,
    halfwidth_katakana, low_trails, invalid). Lead 0x81-0x9F/0xE0-0xEF
    with trail 0x40-0xFC (≠0x7F) is a JIS X 0208 pair; 0xA1-0xDF is
    half-width katakana (single). ``low_trails`` counts pairs whose
    trail byte is ASCII-range (0x40-0x7E) — evidence only a genuine
    double-byte encoding produces (see detect_encoding)."""
    i, n, dbl, kata, low, bad = 0, len(data), 0, 0, 0, 0
    while i < n:
        c = data[i]
        if c < 0x80:
            i += 1
            continue
        if 0xA1 <= c <= 0xDF:
            kata += 1
            i += 1
            continue
        if (0x81 <= c <= 0x9F or 0xE0 <= c <= 0xEF) and i + 1 < n \
                and 0x40 <= data[i + 1] <= 0xFC and data[i + 1] != 0x7F:
            dbl += 1
            if data[i + 1] <= 0x7E:
                low += 1
            i += 2
            continue
        bad += 1
        i += 1
    return dbl, kata, low, bad


def _walk_big5(data: bytes):
    """Structural Big5 walk: lead 0xA1-0xF9, trail 0x40-0x7E or
    0xA1-0xFE. Returns (double_byte_pairs, low_trails, invalid);
    ``low_trails`` counts pairs with an ASCII-range trail."""
    i, n, dbl, low, bad = 0, len(data), 0, 0, 0
    while i < n:
        c = data[i]
        if c < 0x80:
            i += 1
            continue
        if 0xA1 <= c <= 0xF9 and i + 1 < n and (
                0x40 <= data[i + 1] <= 0x7E or 0xA1 <= data[i + 1] <= 0xFE):
            dbl += 1
            if data[i + 1] <= 0x7E:
                low += 1
            i += 2
            continue
        bad += 1
        i += 1
    return dbl, low, bad


# koi8-r Cyrillic letters: 0xC0-0xFF plus ё (0xA3) / Ё (0xB3)
_KOI8_CYR = frozenset(range(0xC0, 0x100)) | {0xA3, 0xB3}


def detect_encoding(data: bytes) -> str:
    """X3 DetectCharset (colly.go:104-106 / config.go:41-42, backed by
    the saintfish/chardet statistical library there): deterministic
    detection for bodies with NO declared charset. BOM dispatch, then
    strict UTF-8 validation, then a byte-bigram/structural model over
    the multi-byte CJK encodings (shift_jis, big5) and koi8-r, with
    windows-1252 (the superset of iso-8859-1 real pages use) as the
    single-byte fallback.

    Discrimination logic (all deterministic, order-stable):
    - shift_jis / big5 candidates require a CLEAN structural walk (no
      invalid lead/trail sequence) and are scored by the fraction of
      high-byte content consumed as valid double-byte pairs. Japanese
      kana pages break the big5 walk (kana leads 0x82/0x83 < 0xA1);
      Chinese big5 text scores low under shift_jis because its
      0xA1-0xDF leads parse as zero-weight half-width katakana.
    - koi8-r requires every high byte to be a koi8-r Cyrillic letter
      and is scored by the high-high bigram ratio — Cyrillic words are
      runs of high bytes, whereas Latin-accent text (windows-1252) has
      isolated high bytes, scoring ~0.
    - an even-length Cyrillic run also walks cleanly as big5 (and, if
      uppercase, as shift_jis) high-high pairs. The discriminator is
      ASCII-range trail bytes (0x40-0x7E): genuine CJK double-byte text
      uses them constantly, while koi8-r letters are all ≥ 0xA1, so a
      pure-Cyrillic body can never produce one. When the koi8-r
      candidate exists, CJK candidates whose walk consumed ZERO
      low-trail pairs are dropped — their evidence is exactly the
      byte pattern Cyrillic runs produce.
    - highest score ≥ 0.5 wins; ties break shift_jis > big5 > koi8-r
      (fixed priority, so detection is reproducible byte-for-byte)."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # "utf-16" consumes the BOM during decode (the -le/-be variants
        # would leave a stray U+FEFF at the start of the text)
        return "utf-16"
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    high = sum(1 for b in data if b >= 0x80)
    if high == 0:
        # invalid-UTF8 without high bytes cannot happen (ASCII is valid
        # UTF-8), but guard the division anyway
        return "windows-1252"
    koi8_ok = all(b in _KOI8_CYR for b in data if b >= 0x80)
    scores: list[tuple[float, int, str]] = []
    dbl, _kata, low, bad = _walk_sjis(data)
    if bad == 0 and dbl > 0 and not (koi8_ok and low == 0):
        scores.append((2.0 * dbl / high, 3, "shift_jis"))
    dbl5, low5, bad5 = _walk_big5(data)
    if bad5 == 0 and dbl5 > 0 and not (koi8_ok and low5 == 0):
        scores.append((2.0 * dbl5 / high, 2, "big5"))
    if koi8_ok:
        hh = sum(1 for a, b in zip(data, data[1:])
                 if a >= 0x80 and b >= 0x80)
        scores.append((hh / high, 1, "koi8-r"))
    if scores:
        score, _prio, enc = max(scores)
        if score >= 0.5:
            return enc
    return "windows-1252"


def decode_text(body, content_type: str | None, detect: bool = False) -> str:
    """X3 charset normalization (fixCharset colly.go:693-696, v3
    response.go:76-104): charset from the Content-Type parameter; else
    sniffed from a leading ``<meta charset>`` / ``<?xml encoding>``
    declaration; else — with ``detect`` (the DetectCharset flag) —
    statistical detection via :func:`detect_encoding`; else utf-8,
    with replacement-character fallback as the last resort."""
    if isinstance(body, str):
        return body
    data = bytes(body)
    m = _CT_CHARSET_RE.search(content_type or "")
    enc = m.group(1) if m else None
    if enc is None:
        head = data[:1024].decode("latin-1", errors="replace")
        m2 = _META_CHARSET_RE.search(head) or _XML_ENCODING_RE.search(head)
        enc = m2.group(1) if m2 else None
    if enc is None and detect:
        enc = detect_encoding(data)
    candidates = [enc] if enc else []
    candidates.append("utf-8")
    for e in candidates:
        try:
            return data.decode(e)
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace")


class _LinkExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.base: str | None = None
        self.hrefs: list[str] = []      # a[href] in document order
        self.img_srcs: list[str] = []   # img[src] in document order
        self.captions: list[str] = []   # figcaption text in document order
        self._in_figcaption = 0
        self._cap_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag == "img":
            for k, v in attrs:
                if k == "src" and v is not None:
                    self.img_srcs.append(v)
                    break
        elif tag == "base" and self.base is None:
            # first <base href> wins (goquery .First() semantics)
            for k, v in attrs:
                if k == "href" and v:
                    self.base = v
                    break
        elif tag == "figcaption":
            self._in_figcaption += 1
            self._cap_parts = []

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "figcaption" and self._in_figcaption:
            self._in_figcaption -= 1
            self.captions.append("".join(self._cap_parts).strip())

    def handle_data(self, data):
        if self._in_figcaption:
            self._cap_parts.append(data)


def extract_xml_links(page_url: str, body: bytes | str,
                      content_type: str | None = None) -> list[str]:
    """E2 XML extraction — the ``OnXML("//urlset/url/loc")`` sitemap
    pattern (reference example shopify_sitemap.go.txt:17-24; engine
    colly.go:1150-1180). Parses the document with ElementTree and
    collects, in document order: ``<loc>`` text (sitemap urlset /
    sitemapindex, namespace-agnostic) and ``href``/``src`` attributes
    of any element. Resolved + canonicalized like HTML hrefs."""
    text = decode_text(body, content_type) if not isinstance(body, str) else body
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []
    out: list[str] = []
    for el in root.iter():
        tag = el.tag.rsplit("}", 1)[-1].lower()
        if tag == "loc" and el.text and el.text.strip():
            r = resolve(page_url, el.text.strip())
            if r:
                out.append(r)
        for attr in ("href", "src"):
            v = el.get(attr)
            if v:
                r = resolve(page_url, v)
                if r:
                    out.append(r)
    return out


def extract_elements(text: str, css_selectors: list[str]) -> list[dict]:
    """E1 generic OnHTML surface (colly.go:1104-1119): for each
    registered CSS selector, the matched elements in document order
    with a running index — the rows an OnHTML callback would see."""
    from colly_spark.operators.dom import parse_dom, select

    root = parse_dom(text or "")
    rows: list[dict] = []
    for sel in css_selectors:
        for idx, n in enumerate(select(root, sel)):
            rows.append(dict(selector=sel, index=idx, tag=n.tag,
                             text=n.text().strip(), attrs=dict(n.attrs)))
    return rows


def extract_xpath(text: str, xpaths: list[str]) -> list[dict]:
    """E2 generic OnXML surface — XPath over HTML *and* XML documents
    (colly.go:1123-1182 runs htmlquery on HTML docs and xmlquery on
    xml ones; one DOM serves both here, namespace prefixes ignored)."""
    from colly_spark.operators.dom import Node, parse_dom, xpath_lite

    root = parse_dom(text or "")
    rows: list[dict] = []
    for xp in xpaths:
        for idx, r in enumerate(xpath_lite(root, xp)):
            if isinstance(r, Node):
                rows.append(dict(xpath=xp, index=idx, tag=r.tag,
                                 text=r.text().strip(), attrs=dict(r.attrs)))
            else:
                rows.append(dict(xpath=xp, index=idx, tag=None,
                                 text=str(r).strip(), attrs={}))
    return rows


def _elements_schema(key_field: str):
    from pyspark.sql.types import (ArrayType, IntegerType, MapType, StringType,
                                   StructField, StructType)

    return ArrayType(StructType([
        StructField(key_field, StringType()),
        StructField("index", IntegerType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
        StructField("attrs", MapType(StringType(), StringType())),
    ]))


def on_html_udf(css_selectors: list[str]):
    """Arrow-batched UDF: html → array<struct<selector,index,tag,text,
    attrs>> — ``explode`` it for the per-element callback rows."""
    import pandas as pd
    from pyspark.sql import functions as F

    sels = list(css_selectors)

    def _udf(htmls):
        return pd.Series([extract_elements(h or "", sels) for h in htmls])

    return F.pandas_udf(_udf, _elements_schema("selector"))


def on_xml_udf(xpaths: list[str]):
    """Arrow-batched UDF: document → array<struct<xpath,index,tag,text,
    attrs>> (works on HTML and XML bodies alike)."""
    import pandas as pd
    from pyspark.sql import functions as F

    xps = list(xpaths)

    def _udf(docs):
        return pd.Series([extract_xpath(d or "", xps) for d in docs])

    return F.pandas_udf(_udf, _elements_schema("xpath"))


def extract_page(page_url: str, body: bytes | str, content_type: str | None,
                 detect_charset: bool = False):
    """Parse one page → (out_links, images) where

    - out_links: canonical resolved a[href]+img[src] URLs, document
      order, fragment-only and unresolvable hrefs dropped (AbsoluteURL
      semantics, request.go:251-262);
    - images: [(img_url, caption_or_None)] pairing img[src] with the
      figcaption of the same <figure> by document order.

    XML content (Content-Type containing "xml" — sitemaps etc.) goes
    through the XML path (E2, OnXML analogue: colly.go:1123-1182 parses
    xml docs detected by Content-Type or .xml path); other non-HTML
    content types return ([], []) — the parse gate.
    """
    if content_type is None:
        return [], []
    ct = content_type.lower()
    if "xml" in ct and "html" not in ct:
        return extract_xml_links(page_url, body, content_type), []
    if "html" not in ct:
        return [], []
    text = (decode_text(body, content_type, detect=detect_charset)
            if not isinstance(body, str) else body)
    p = _LinkExtractor()
    try:
        p.feed(text)
        p.close()
    except Exception:
        return [], []
    base = p.base if p.base else page_url
    # <base href> may itself be relative → resolve against page URL
    if p.base:
        resolved_base = resolve(page_url, p.base)
        if resolved_base:
            base = resolved_base
    out: list[str] = []
    for href in p.hrefs:
        r = resolve(base, href)
        if r:
            out.append(r)
    images: list[tuple[str, str | None]] = []
    for i, src in enumerate(p.img_srcs):
        r = resolve(base, src)
        if r:
            out.append(r)
            images.append((r, p.captions[i] if i < len(p.captions) else None))
    return out, images
