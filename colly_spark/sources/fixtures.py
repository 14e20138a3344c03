"""Deterministic synthetic crawl corpus (FIXTURES.md schemas).

Replaces the reference's in-process httptest server
(colly_test.go:46-257) with tables the engine "fetches" by join. Every
route family of the reference server has an analogue here:

- ordinary HTML pages with links (relative / absolute / fragment /
  tab-and-newline-polluted hrefs) — colly_test.go:49-100
- ``<base href>`` pages — colly_test.go /base, /base_relative
- redirect chains incl. an already-visited target — colly_test.go:682-712
- error statuses (404/500) — colly_test.go /500
- robots.txt with Allow/Disallow incl. the wildcard query case
  ``Disallow: /allowed*q=`` — colly_test.go:39-44, 1070-1085
- direct image URLs + ``<img>``/``<figcaption>`` pairs (payload axis)
- lone-percent path ``/100%`` — colly_test.go:985-1016

Zipf-skewed pages-per-domain so 1-2 domains are hot (exercises the
skew/salting path). All generation is `random.Random(seed)`-driven:
same seed ⇒ byte-identical corpus, which is what makes the pytest
oracles and the bench reproducible with no external data.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from colly_spark.functions import images as imgcodec
from colly_spark.functions import urlnorm

_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lumen marble nectar onyx prism quartz reef slate tundra umber vertex "
    "willow xenon yarrow zephyr"
).split()


@dataclass
class CorpusSpec:
    seed: int = 42
    n_domains: int = 6
    base_pages_per_domain: int = 12  # hot domains get zipf-scaled more
    zipf_s: float = 1.3
    n_images: int = 24
    links_per_page: int = 4
    redirect_chains: int = 2
    image_sizes: tuple = (16, 32)
    robots_error_host: bool = True  # one host whose robots fetch fails
    extra_seeds: list = field(default_factory=list)


def _caption(rng: random.Random, i: int) -> str:
    return f"{' '.join(rng.choice(_WORDS) for _ in range(6))} #{i:04d}"


def make_images(spec: CorpusSpec) -> pd.DataFrame:
    """The payload table — exactly BASELINE.json input_hint columns:
    (image_id, bytes, w, h, fmt, caption, phash)."""
    rng = random.Random(spec.seed * 7919 + 1)
    rows = []
    for i in range(spec.n_images):
        w = rng.choice(spec.image_sizes)
        h = rng.choice(spec.image_sizes)
        px_rng = np.random.default_rng(spec.seed * 1_000_003 + i)
        pixels = px_rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = ("png", "jpeg", "webp")[i % 3]
        if fmt == "png":
            data = imgcodec.encode_png(pixels)
        elif fmt == "jpeg":
            data = imgcodec.encode_lossy(pixels)
        else:
            from colly_spark.functions.webp import encode_webp

            data = encode_webp(pixels)
        rows.append(
            dict(
                image_id=f"img{i:08d}",
                bytes=data,
                w=np.int32(w),
                h=np.int32(h),
                fmt=fmt,
                caption=_caption(rng, i),
                phash=imgcodec.phash64(imgcodec.decode_image(data, fmt)),
            )
        )
    return pd.DataFrame(rows)


def _domain(i: int) -> str:
    return f"d{i:02d}.test"


def _page_counts(spec: CorpusSpec) -> list[int]:
    # Zipf-skewed: domain 0 hottest
    return [
        max(3, int(spec.base_pages_per_domain * spec.n_domains / ((i + 1) ** spec.zipf_s)))
        for i in range(spec.n_domains)
    ]


def make_corpus(spec: CorpusSpec | None = None) -> dict[str, pd.DataFrame]:
    """Build all fixture tables. Returns dict of pandas DataFrames:
    images, pages, robots, seeds, limit_rules.

    ``pages.links`` is ground truth (resolved canonical out-links in
    document order) — the engine must re-derive it by parsing ``body``.
    """
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)
    images = make_images(spec)
    counts = _page_counts(spec)

    # --- enumerate page URLs per domain -------------------------------
    page_urls: list[list[str]] = []
    for d in range(spec.n_domains):
        host = _domain(d)
        urls = [f"http://{host}/"]
        urls += [f"http://{host}/page/{i}" for i in range(1, counts[d])]
        page_urls.append(urls)

    pages_rows: list[dict] = []
    img_idx = 0

    def add_page(url, status, ctype, body, redirect_to=None, image_id=None,
                 links=None, depth=0, set_cookie=None, require_cookie=None,
                 cache_max_age=None, retry_after=None, etag=None,
                 last_modified=None):
        pages_rows.append(
            dict(
                url=url,
                status=np.int32(status),
                content_type=ctype,
                body=body if isinstance(body, (bytes, bytearray)) else body.encode("utf-8"),
                redirect_to=redirect_to,
                image_id=image_id,
                links=links or [],
                depth_from_seed=np.int32(depth),
                set_cookie=set_cookie,
                require_cookie=require_cookie,
                # Cache-Control max-age seconds the page's response
                # would carry (response.go:108-149); None = no header
                cache_max_age=cache_max_age,
                # Retry-After seconds a 429/503 response would carry;
                # None = no header (respect_retry_after consumes it)
                retry_after=retry_after,
                # ETag validator the response would carry (RFC 9110
                # §8.8.3); None = no validator → a stale cache entry
                # can never revalidate, it refetches fully
                etag=etag,
                # Last-Modified validator (RFC 9110 §8.8.2) — the
                # weak fallback for servers without ETags; used by
                # revalidation only when no ETag pair applies
                last_modified=last_modified,
            )
        )

    for d in range(spec.n_domains):
        host = _domain(d)
        urls = page_urls[d]
        n = len(urls)
        for pi, url in enumerate(urls):
            hrefs: list[str] = []
            # forward links within the domain (BFS structure: page i links
            # to a deterministic window ahead)
            for k in range(1, spec.links_per_page + 1):
                tgt = pi * spec.links_per_page + k
                if tgt < n:
                    style = rng.randrange(4)
                    if style == 0:
                        hrefs.append(f"/page/{tgt}")  # root-relative
                    elif style == 1:
                        hrefs.append(f"http://{host}/page/{tgt}")  # absolute
                    elif style == 2:
                        # path-relative: from "/" it's "page/N", from
                        # "/page/M" the sibling is just "N"
                        hrefs.append(f"page/{tgt}" if pi == 0 else f"{tgt}")
                    else:  # tab/newline pollution (WHATWG step-3 case):
                        # raw tab+newline in the href; canonicalizes to /page/{tgt}
                        hrefs.append(f"/pag\te/\n{tgt}")
            # occasional cross-domain link (tests domain filters)
            if pi % 5 == 1 and spec.n_domains > 1:
                other = _domain((d + 1) % spec.n_domains)
                hrefs.append(f"http://{other}/")
            # a fragment link (must be skipped) and a disallowed path
            hrefs.append("#frag")
            if pi % 7 == 2:
                hrefs.append("/disallowed")
            if pi % 11 == 3:
                hrefs.append("/allowed?q=1")  # blocked by wildcard robots rule
            if pi % 9 == 4:
                hrefs.append(f"/r/{pi % spec.redirect_chains}")  # into a redirect chain
            if pi == 0:
                hrefs.append("/100%")  # lone-percent page
                hrefs.append("/sitemap.xml")  # E2 XML extraction path
                hrefs.append("/sitemap.xml.gz")  # X2 gzip decode path
                hrefs.append("/latin1")       # X3 charset from Content-Type
                hrefs.append("/latin1meta")   # X3 charset sniffed from <meta>
                hrefs.append("/login")        # cookie jar: Set-Cookie route

            # image embeds
            img_tags = []
            if img_idx < len(images) and pi % 2 == 0:
                iid = images.iloc[img_idx % len(images)]["image_id"]
                cap = images.iloc[img_idx % len(images)]["caption"]
                fmt = images.iloc[img_idx % len(images)]["fmt"]
                img_href = f"/img/{iid}.{fmt}"
                img_tags.append(
                    f'<figure><img src="{img_href}"/><figcaption>{cap}</figcaption></figure>'
                )
                hrefs.append(img_href)
                img_idx += 1

            body = "<html><head><title>{}</title></head><body>{}{}</body></html>".format(
                url,
                "".join(f'<a href="{h}">l</a>' for h in hrefs),
                "".join(img_tags),
            )
            gt_links = [r for r in (urlnorm.resolve(url, h) for h in hrefs) if r]
            # by-header expiry mix (cache_expiry_policy="header" only;
            # inert otherwise): ample max-age / zero max-age (stored
            # but instantly stale) / no header (never replayable)
            cma = 3600 if pi % 2 == 0 else (0 if pi % 3 == 2 else None)
            # validator mix (cache_revalidate only; inert otherwise):
            # pi%3==0 → ETag AND Last-Modified (ETag must win),
            # pi%3==1 → Last-Modified only (the no-ETag-server case),
            # pi%3==2 → ETag only
            etg = None if pi % 3 == 1 else \
                'W/"%08x"' % (zlib.crc32(url.encode("utf-8")) & 0xFFFFFFFF)
            lm = None if pi % 3 == 2 else \
                f"Mon, {(pi % 28) + 1:02d} Jul 2025 00:00:00 GMT"
            add_page(url, 200, "text/html; charset=utf-8", body,
                     links=gt_links, cache_max_age=cma, etag=etg,
                     last_modified=lm)

        # special routes per domain ------------------------------------
        # redirect chains: /r/0 → /r/0/a → /page/1 ; /r/1 → / (already seen)
        for c in range(spec.redirect_chains):
            if c == 0:
                add_page(f"http://{host}/r/0", 301, "text/html", b"", redirect_to=f"http://{host}/r/0/a")
                add_page(f"http://{host}/r/0/a", 302, "text/html", b"", redirect_to=f"http://{host}/page/1" if n > 1 else f"http://{host}/")
            else:
                # AlreadyVisited-on-redirect case (colly_test.go:682-712)
                add_page(f"http://{host}/r/{c}", 301, "text/html", b"", redirect_to=f"http://{host}/")
        # two chains sharing an intermediate (same-batch claim): the
        # lower-seq chain claims /shared at hop 1, the other gets
        # AlreadyVisited — pins the (hop, seq) tie-break. Unreachable
        # from page links; exercised by direct seeds only.
        add_page(f"http://{host}/rx/a", 301, "text/html", b"",
                 redirect_to=f"http://{host}/shared")
        add_page(f"http://{host}/rx/b", 301, "text/html", b"",
                 redirect_to=f"http://{host}/shared")
        add_page(f"http://{host}/shared", 200, "text/html; charset=utf-8",
                 "<html><body>shared target</body></html>")
        # error page + disallowed + wildcard-query page + lone-%
        add_page(f"http://{host}/500", 500, "text/html", b"server error")
        # custom 404 page WITH links (ParseStatusCallback scenario,
        # config.go:189-190: parse_error_response extracts links from
        # error responses only). Unreachable from page links —
        # exercised by direct seeds only, so existing scenarios are
        # untouched.
        add_page(f"http://{host}/404", 404, "text/html; charset=utf-8",
                 '<html><body>not found — try '
                 '<a href="/page/1">page 1</a> or '
                 '<a href="/allowed?q=1">search</a></body></html>',
                 links=[urlnorm.resolve(f"http://{host}/404", "/page/1"),
                        urlnorm.resolve(f"http://{host}/404", "/allowed?q=1")])
        add_page(f"http://{host}/disallowed", 200, "text/html; charset=utf-8", "<html><body>blocked by robots</body></html>")
        add_page(f"http://{host}/allowed?q=1", 200, "text/html; charset=utf-8", "<html><body>q</body></html>")
        add_page(f"http://{host}/100%25", 200, "text/html; charset=utf-8", "<html><body>percent</body></html>")
        # sitemap (E2 / OnXML urlset pattern, shopify_sitemap example)
        sm_urls = urls[: min(3, n)]
        sitemap_body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(f"<url><loc>{u}</loc></url>" for u in sm_urls)
            + "</urlset>"
        )
        add_page(f"http://{host}/sitemap.xml", 200, "application/xml",
                 sitemap_body, links=list(sm_urls))
        # gzipped sitemap (.xml.gz, http_backend.go:229-240): same urls,
        # body gzip-compressed (mtime=0 → deterministic bytes)
        import gzip as _gzip

        add_page(f"http://{host}/sitemap.xml.gz", 200, "application/gzip",
                 _gzip.compress(sitemap_body.encode("utf-8"), mtime=0),
                 links=list(sm_urls))
        # sitemaps-protocol tree (sources/sitemap.py discovery): a
        # <sitemapindex> referencing two rich <urlset> children (one
        # gzipped, one with a namespace prefix on its entry tags) that
        # carry lastmod / changefreq / priority. Unlinked from page
        # bodies — reachable only by protocol discovery, so crawl
        # scenarios are untouched.
        cfreq = ("daily", "weekly", "monthly")
        half = max(1, n // 2)

        def _rich(urls_part, ns=""):
            rows = "".join(
                f"<{ns}url><{ns}loc>{u}</{ns}loc>"
                f"<{ns}lastmod>2025-{(pi2 % 9) + 1:02d}-01</{ns}lastmod>"
                f"<{ns}changefreq>{cfreq[pi2 % 3]}</{ns}changefreq>"
                f"<{ns}priority>{round(1.0 - (pi2 % 10) / 10.0, 1)}"
                f"</{ns}priority></{ns}url>"
                for pi2, u in urls_part)
            return ('<?xml version="1.0" encoding="UTF-8"?>'
                    '<urlset xmlns="http://www.sitemaps.org/schemas/'
                    'sitemap/0.9">' + rows + "</urlset>")

        add_page(f"http://{host}/sitemap_rich_1.xml", 200,
                 "application/xml",
                 _rich(list(enumerate(urls))[:half]))
        add_page(f"http://{host}/sitemap_rich_2.xml.gz", 200,
                 "application/gzip",
                 _gzip.compress(
                     _rich(list(enumerate(urls))[half:], ns="sm:")
                     .encode("utf-8"), mtime=0))
        index_body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
            'sitemap/0.9">'
            f"<sitemap><loc>http://{host}/sitemap_rich_1.xml</loc>"
            "<lastmod>2025-01-15</lastmod></sitemap>"
            f"<sitemap><loc>http://{host}/sitemap_rich_2.xml.gz</loc>"
            "</sitemap>"
            # self-reference: discovery must visit each index once
            f"<sitemap><loc>http://{host}/sitemap_index.xml</loc>"
            "</sitemap>"
            "</sitemapindex>")
        add_page(f"http://{host}/sitemap_index.xml", 200,
                 "application/xml", index_body)
        # non-UTF8 pages (X3): charset declared in Content-Type, and
        # charset only sniffable from a <meta> tag
        latin_html = ('<html><body><a href="/page/1">caf\xe9 enlace</a>'
                      "</body></html>")
        add_page(f"http://{host}/latin1", 200, "text/html; charset=iso-8859-1",
                 latin_html.encode("iso-8859-1"),
                 links=[urlnorm.resolve(f"http://{host}/latin1", "/page/1")])
        meta_html = ('<html><head><meta charset="iso-8859-1"></head>'
                     '<body><a href="/page/2">s\xfcd</a></body></html>')
        add_page(f"http://{host}/latin1meta", 200, "text/html",
                 meta_html.encode("iso-8859-1"),
                 links=[urlnorm.resolve(f"http://{host}/latin1meta", "/page/2")])
        # X3 DetectCharset route: latin-1 bytes with NO declaration
        # anywhere — the href carries a non-ASCII byte, so detection
        # changes the canonical link (é → %C3%A9 vs U+FFFD's
        # %EF%BF%BD). Unreachable from page links — exercised by
        # direct seeds only, so existing scenarios are untouched.
        bare_html = ('<html><body><a href="/caf\xe9">caf\xe9</a>'
                     '<a href="/page/1">uno</a></body></html>')
        add_page(f"http://{host}/latin1bare", 200, "text/html",
                 bare_html.encode("iso-8859-1"),
                 links=[urlnorm.resolve(f"http://{host}/latin1bare", "/caf\xe9"),
                        urlnorm.resolve(f"http://{host}/latin1bare", "/page/1")])
        # X3 statistical chardet routes (reference: saintfish/chardet
        # behind colly.go:104-106): undeclared shift_jis / big5 /
        # koi8-r bodies whose hrefs carry non-ASCII — detection decides
        # the canonical link bytes (UTF-8 percent-encoding of the
        # correctly decoded char vs mojibake). Like /latin1bare these
        # are unreachable from page links (direct seeds only).
        sjis_html = ('<html><body><p>日本語のテキストです。'
                     '検出の対象となる文書です。</p>'
                     '<a href="/日本">日本</a>'
                     '<a href="/page/1">ichi</a></body></html>')
        add_page(f"http://{host}/sjisbare", 200, "text/html",
                 sjis_html.encode("shift_jis"),
                 links=[urlnorm.resolve(f"http://{host}/sjisbare", "/日本"),
                        urlnorm.resolve(f"http://{host}/sjisbare", "/page/1")])
        big5_html = ('<html><body><p>這是一段繁體中文的測試文字，'
                     '用於偵測編碼。</p>'
                     '<a href="/中文">中文</a>'
                     '<a href="/page/1">yi</a></body></html>')
        add_page(f"http://{host}/big5bare", 200, "text/html",
                 big5_html.encode("big5"),
                 links=[urlnorm.resolve(f"http://{host}/big5bare", "/中文"),
                        urlnorm.resolve(f"http://{host}/big5bare", "/page/1")])
        koi8_html = ('<html><body><p>это русский текст для проверки '
                     'кодировки кои восемь</p>'
                     '<a href="/гора">гора</a>'
                     '<a href="/page/1">odin</a></body></html>')
        add_page(f"http://{host}/koi8bare", 200, "text/html",
                 koi8_html.encode("koi8_r"),
                 links=[urlnorm.resolve(f"http://{host}/koi8bare", "/гора"),
                        urlnorm.resolve(f"http://{host}/koi8bare", "/page/1")])
        # cookie jar routes (cookiejar.go:23-60 analogue): /login sets a
        # per-host session cookie and links /account, which requires it.
        # /account is reachable with 200 only after /login's response
        # committed the cookie (a strictly earlier micro-batch).
        add_page(f"http://{host}/login", 200, "text/html; charset=utf-8",
                 '<html><body><a href="/account">account</a></body></html>',
                 links=[urlnorm.resolve(f"http://{host}/login", "/account")],
                 set_cookie=f"sid=tok-{host}")
        add_page(f"http://{host}/account", 200, "text/html; charset=utf-8",
                 "<html><body>welcome back</body></html>",
                 require_cookie=f"sid=tok-{host}")
        # base-tag page (colly_test.go /base)
        base_body = (
            '<html><head><base href="http://xy.test/sub/" /></head>'
            '<body><a href="z">base-rel</a></body></html>'
        )
        add_page(
            f"http://{host}/base", 200, "text/html; charset=utf-8", base_body,
            links=[urlnorm.resolve("http://xy.test/sub/", "z")],
        )

    # direct image URLs (cross-host image CDN not needed; serve per-domain)
    for d in range(spec.n_domains):
        host = _domain(d)
        for _, im in images.iterrows():
            url = f"http://{host}/img/{im['image_id']}.{im['fmt']}"
            ct = {"png": "image/png", "jpeg": "image/jpeg",
                  "webp": "image/webp"}[im["fmt"]]
            # images carry a validator but no Cache-Control — the
            # classic 304 target: under the header expiry policy the
            # entry is stored-but-stale, so a revisit revalidates
            # instead of re-downloading the payload (cache_revalidate)
            add_page(url, 200, ct, bytes(im["bytes"]), image_id=im["image_id"],
                     etag='W/"%08x"' % (zlib.crc32(url.encode("utf-8"))
                                        & 0xFFFFFFFF))

    pages = pd.DataFrame(pages_rows)
    # dedupe in case of URL collisions (keep first)
    pages = pages.drop_duplicates(subset=["url"], keep="first").reset_index(drop=True)
    # mixed int/None upcasts to float64 (and .apply re-infers it) —
    # force int-or-None objects for the IntegerType Spark column
    pages["cache_max_age"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pages["cache_max_age"]],
        dtype=object, index=pages.index)
    pages["retry_after"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pages["retry_after"]],
        dtype=object, index=pages.index)

    # --- robots --------------------------------------------------------
    robots_rows = []
    for d in range(spec.n_domains):
        host = _domain(d)
        if spec.robots_error_host and d == spec.n_domains - 1:
            robots_rows.append(dict(host=host, body=None, fetch_error=True))
        elif d % 3 == 2:
            pass  # no robots row → allow all
        elif d % 3 == 1:
            # F8 named UA group (colly.go:792-827 / temoto FindGroup):
            # the 'colly-spark' token is a prefix of the collector's
            # default UserAgent and REPLACES the * group for it —
            # /disallowed becomes reachable, /page/3 blocked instead
            robots_rows.append(
                dict(
                    host=host,
                    body=(
                        "User-agent: colly-spark\n"
                        "Disallow: /page/3$\n"
                        "\n"
                        "User-agent: *\n"
                        "Allow: /allowed\n"
                        "Disallow: /disallowed\n"
                        "Disallow: /allowed*q=\n"
                    ),
                    fetch_error=False,
                )
            )
        else:
            robots_rows.append(
                dict(
                    host=host,
                    body=(
                        # RFC 9309 §2.3 Sitemap directive — group-
                        # independent; rule parsing ignores unknown
                        # keys, so crawl gate behavior is untouched
                        f"Sitemap: http://{host}/sitemap_index.xml\n"
                        "User-agent: *\n"
                        "Allow: /allowed\n"
                        "Disallow: /disallowed\n"
                        "Disallow: /allowed*q=\n"
                    ),
                    fetch_error=False,
                )
            )
    robots = pd.DataFrame(robots_rows, columns=["host", "body", "fetch_error"])

    # --- seeds (global FIFO submission order) ---------------------------
    seed_urls = [f"http://{_domain(d)}/" for d in range(spec.n_domains)]
    seed_urls += list(spec.extra_seeds)
    seeds = pd.DataFrame(dict(url=seed_urls, seq=np.arange(len(seed_urls), dtype=np.int64)))

    # --- limit rules (first-match-wins priority) ------------------------
    limit_rules = pd.DataFrame(
        [
            dict(priority=np.int32(0), domain_glob="d00*", domain_regexp=None,
                 delay_ms=np.int64(100), random_delay_ms=np.int64(50), parallelism=np.int32(2)),
            dict(priority=np.int32(1), domain_glob="*", domain_regexp=None,
                 delay_ms=np.int64(0), random_delay_ms=np.int64(0), parallelism=np.int32(4)),
        ]
    )
    return dict(images=images, pages=pages, robots=robots, seeds=seeds, limit_rules=limit_rules)


def write_corpus(tables: dict[str, pd.DataFrame], out_dir: str) -> None:
    """Write fixture tables as parquet (stand-in for Iceberg in-sandbox;
    at deployment these are Iceberg tables — see plans/crawler.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{out_dir}/{name}.parquet")
