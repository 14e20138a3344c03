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

from html.parser import HTMLParser

from colly_spark.functions.urlnorm import resolve


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


def extract_xml_links(page_url: str, body: bytes | str) -> list[str]:
    """E2 XML extraction — the ``OnXML("//urlset/url/loc")`` sitemap
    pattern (reference example shopify_sitemap.go.txt:17-24; engine
    colly.go:1150-1180). Parses the document with ElementTree and
    collects, in document order: ``<loc>`` text (sitemap urlset /
    sitemapindex, namespace-agnostic) and ``href``/``src`` attributes
    of any element. Resolved + canonicalized like HTML hrefs."""
    if isinstance(body, (bytes, bytearray, memoryview)):
        try:
            text = bytes(body).decode("utf-8")
        except UnicodeDecodeError:
            text = bytes(body).decode("utf-8", errors="replace")
    else:
        text = body
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


def extract_page(page_url: str, body: bytes | str, content_type: str | None):
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
        return extract_xml_links(page_url, body), []
    if "html" not in ct:
        return [], []
    if isinstance(body, (bytes, bytearray, memoryview)):
        try:
            text = bytes(body).decode("utf-8")
        except UnicodeDecodeError:
            text = bytes(body).decode("utf-8", errors="replace")
    else:
        text = body
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
