"""E2E parity of the LIVE fetch path: the engine crawling a real
loopback HTTP server (threads, sockets, headers) vs the pure-Python
oracle simulator reading the same corpus as tables.

The server serves the deterministic fixture corpus: every page row
becomes a route (status, Content-Type, body, Location, Set-Cookie),
robots.txt is served per virtual Host, the robots-fetch-error host
hangs up mid-connection, unknown URLs hang up (the corpus-join-miss /
network-error channel), and cookie-protected routes enforce their
requirement against the Cookie header the engine's jar sent.

What this pins beyond the corpus-join parity suite: the
HttpFetchSource mapInPandas stage (thread pool, redirect refusal,
Location resolution, UA/Cookie headers, error taxonomy), lazy
robots.txt fetching over HTTP, and Set-Cookie flowing back through the
jar commit — i.e. X1 as a real fetch, not a stand-in.
"""

from __future__ import annotations

import math
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from colly_spark.config import CrawlConfig
from colly_spark.oracle.simulator import Simulator
from colly_spark.plans.crawler import Crawler
from colly_spark.sources.live_http import HttpFetchSource

from tests.test_crawler_parity import (_engine_per_domain_order, _engine_seen,
                                       _errors_multiset, _sim_seen_signed)


def _n(v):
    return None if v is None or (isinstance(v, float) and math.isnan(v)) else v


class _CorpusHandler(BaseHTTPRequestHandler):
    # the corpus dicts live on the server object (set in the fixture)

    def log_message(self, *args):  # quiet
        pass

    def _hang_up(self):
        """No HTTP response at all — the network-error channel."""
        try:
            self.connection.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self.close_connection = True

    def _respond(self, status, ctype, body, headers=None, send_body=True):
        self.send_response(int(status))
        if ctype:
            self.send_header("Content-Type", ctype)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if send_body and body:
            self.wfile.write(body)

    def _serve(self, send_body=True):
        host = self.headers.get("Host") or ""
        if self.path == "/robots.txt":
            body, err = self.server.robots.get(host, (None, False))
            if err:
                return self._hang_up()
            if body is None:
                return self._respond(404, "text/plain", b"")
            return self._respond(200, "text/plain", body.encode("utf-8"),
                                 send_body=send_body)
        row = self.server.pages.get(f"http://{host}{self.path}")
        if row is None:
            return self._hang_up()
        if row["require_cookie"] is not None:
            sent = [p.strip() for p in (self.headers.get("Cookie") or "").split(";")]
            if row["require_cookie"] not in sent:
                return self._respond(403, "text/html", b"")
        headers = {}
        if row["redirect_to"] is not None:
            headers["Location"] = row["redirect_to"]
        if row["set_cookie"] is not None:
            headers["Set-Cookie"] = row["set_cookie"]
        if row["cache_max_age"] is not None:
            # the by-header expiry source on the wire (response.go:108-149)
            headers["Cache-Control"] = f"max-age={int(row['cache_max_age'])}"
        etag = row.get("etag")
        lastmod = row.get("last_modified")
        if etag is not None:
            headers["ETag"] = etag
        if lastmod is not None:
            headers["Last-Modified"] = lastmod
        if row["redirect_to"] is None:
            # RFC 9110 §13.2.2 precedence: If-None-Match decides when
            # an ETag comparison is possible; If-Modified-Since only
            # otherwise. A match short-circuits to 304 (updated
            # caching headers, no body).
            inm = self.headers.get("If-None-Match")
            ims = self.headers.get("If-Modified-Since")
            if inm is not None and etag is not None:
                not_modified = inm == etag
            else:
                not_modified = (ims is not None and lastmod is not None
                                and ims == lastmod)
            if not_modified:
                return self._respond(304, None, b"", headers,
                                     send_body=False)
        self._respond(row["status"], row["content_type"], row["body"],
                      headers, send_body=send_body)

    def do_GET(self):
        self._serve()

    def do_HEAD(self):
        self._serve(send_body=False)

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        if n:
            self.rfile.read(n)
        self._serve()


@pytest.fixture(scope="module")
def live_server(corpus_pd):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CorpusHandler)
    srv.daemon_threads = True
    srv.pages = {
        r["url"]: {
            "status": int(r["status"]),
            "content_type": _n(r["content_type"]),
            "body": bytes(r["body"]) if r["body"] is not None else b"",
            "redirect_to": _n(r["redirect_to"]),
            "set_cookie": _n(r["set_cookie"]),
            "require_cookie": _n(r["require_cookie"]),
            "cache_max_age": _n(r["cache_max_age"]),
            "etag": _n(r.get("etag")),
            "last_modified": _n(r.get("last_modified")),
        }
        for r in corpus_pd["pages"].to_dict("records")
    }
    srv.robots = {
        r["host"]: (_n(r["body"]), bool(r["fetch_error"]))
        for r in corpus_pd["robots"].to_dict("records")
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


LIVE_SCENARIOS = {
    # robots over the wire: lazy per-host robots.txt (incl. the named
    # UA group on d01 and the hang-up fetch-error host d03)
    "robots_enforced": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=False),
        seeds=["http://d00.test/", "http://d03.test/"],
    ),
    # cookie jar round-trips through real Set-Cookie / Cookie headers;
    # the server (not the engine) enforces the protected route
    "cookies": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True),
        seeds=["http://d00.test/", "http://d02.test/account"],
    ),
    # redirect hops over real 301s with Location headers; same-batch
    # shared-intermediate (hop, seq) claim
    "redirect_shared_intermediate": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True),
        seeds=["http://d00.test/rx/a", "http://d00.test/rx/b"],
    ),
    # gzip + charset decode of real wire bytes
    "gzip_charset": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        url_filters=(r"/$", r"latin1", r"sitemap\.xml\.gz",
                                     r"/page/",)),
        seeds=["http://d00.test/"],
    ),
    # F9 headers-abort over real wire headers: the Content-Type the
    # loopback server sends (not a corpus column) drives the abort
    "abort_headers": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        abort_header_content_types=(r"^image/",)),
        seeds=["http://d00.test/"],
    ),
    # X4 cacheExpByHeader over real wire headers: the engine's expiry
    # comes from the Cache-Control max-age the server sends, parsed by
    # _max_age_of; the simulator reads the same corpus column —
    # per-batch cache hits must agree
    "cache_by_header": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True, cache_expiry_policy="header"),
        seeds=["http://d00.test/"],
    ),
    # cache_revalidate over real wire validators: the server answers a
    # matching If-None-Match with a genuine 304 (no body) and the
    # engine replays + refreshes the stored entry; per-batch
    # revalidated counts asserted below
    "cache_revalidate": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True, cache_ttl_batches=1,
                        cache_revalidate=True),
        seeds=["http://d00.test/", "http://d02.test/"],
    ),
    # Request.Retry over real sockets: the wire 500 re-submits with
    # checkRevisit=false — 1 fresh + 2 retried fetches traced, no
    # already_visited errors for them
    "retry_500": dict(
        cfg=CrawlConfig(max_depth=1, ignore_robots=True,
                        retry_http_statuses=(500,), max_retries=2),
        seeds=["http://d00.test/500", "http://d00.test/"],
    ),
    # X3 DetectCharset over the wire: the undeclared-latin-1 page's
    # bytes come off a real socket; detection changes the canonical
    # é-link (an ERR_MISSING under %C3%A9, matching the simulator)
    "detect_charset": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        detect_charset=True),
        seeds=["http://d00.test/latin1bare"],
    ),
}


@pytest.mark.parametrize("name", sorted(LIVE_SCENARIOS))
def test_live_parity(name, spark, corpus_pd, live_server, tmp_state):
    sc = LIVE_SCENARIOS[name]
    sim = Simulator(corpus_pd, sc["cfg"]).run(list(sc["seeds"]), max_batches=60)
    src = HttpFetchSource(sc["cfg"], connect_addr=live_server, timeout_s=20.0)
    eng = Crawler(spark, None, sc["cfg"], tmp_state, bloom_threshold_rows=0,
                  fetch_source=src).run(list(sc["seeds"]), max_batches=60)

    assert _engine_seen(eng) == _sim_seen_signed(sim), "URL-seen set mismatch"
    assert _engine_per_domain_order(eng) == sim.per_domain_order(), \
        "per-domain order mismatch"
    assert eng.trace().count() == len(sim.trace)
    sim_errors = _errors_multiset((u, k) for u, k in sim.errors)
    eng_errors = _errors_multiset(
        (r["url"], r["kind"]) for r in eng.errors().collect())
    assert eng_errors == sim_errors, "error multiset mismatch"
    sim_m = [(m["batch"], m["fetched"], m["new_links"], m.get("cache_hits"),
              m.get("revalidated"))
             for m in sim.metrics]
    eng_m = [(m["batch"], m["fetched"], m["new_links"], m.get("cache_hits"),
              m.get("revalidated"))
             for m in eng.metrics]
    assert eng_m == sim_m, "per-batch metrics mismatch"
    if sc["cfg"].cache_revalidate:
        assert sum(m.get("revalidated", 0) for m in sim.metrics) > 0
