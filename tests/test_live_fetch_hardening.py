"""Source-level tests for the hardened live HTTP fetch stage:
keep-alive connection reuse, bounded retry with Cookie-drop
(request.go:191-193), per-request round-robin proxy routing
(proxy/proxy.go:31-46), and HTTPS over a real TLS loopback socket.

These drive ``HttpFetchSource.lookup`` directly over a small frontier
DataFrame — the full-crawl behavior is pinned by test_live_http.py;
here we pin the socket-layer policies the parity corpus can't observe
(connection counts, attempt counts, request-line form, TLS handshake).
"""

from __future__ import annotations

import socket
import ssl
import subprocess
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from colly_spark.config import CrawlConfig
from colly_spark.sources.live_http import HttpFetchSource

_FRONTIER_SCHEMA = ("seq long, url string, cur string, depth int, "
                    "method string, req_hash long, referer string")


def _frontier(spark, urls, parts=1):
    rows = [(i, u, u, 0, "GET", i * 7919, None) for i, u in enumerate(urls)]
    return spark.createDataFrame(rows, _FRONTIER_SCHEMA).repartition(parts)


def _serve(srv):
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return t


class _CountingHandler(BaseHTTPRequestHandler):
    """HTTP/1.1 keep-alive handler that counts TCP connections and
    requests on the server object."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def setup(self):
        super().setup()
        with self.server.lock:
            self.server.n_connections += 1

    def do_GET(self):
        with self.server.lock:
            self.server.n_requests += 1
        body = b"<html>ok</html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def counting_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.n_connections = 0
    srv.n_requests = 0
    _serve(srv)
    yield srv
    srv.shutdown()
    srv.server_close()


def test_keepalive_connection_reuse(spark, counting_server):
    """40 URLs against one host through one task with 4 threads must
    reuse sockets: connections ≤ threads (plus slack ≪ requests)."""
    addr = f"127.0.0.1:{counting_server.server_address[1]}"
    urls = [f"http://kh.test/p{i}" for i in range(40)]
    src = HttpFetchSource(CrawlConfig(), connect_addr=addr, timeout_s=10.0,
                          threads_per_task=4)
    out = src.lookup(_frontier(spark, urls, parts=1)).collect()
    assert len(out) == 40 and all(r["status"] == 200 for r in out)
    assert counting_server.n_requests == 40
    # one socket per pool thread, not one per request
    assert counting_server.n_connections <= 8, counting_server.n_connections


class _FlakyHandler(BaseHTTPRequestHandler):
    """Hangs up on the first attempt for each path, serves after.
    Records the Cookie header per attempt for the retry-drops-cookie
    assertion."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def do_GET(self):
        with self.server.lock:
            n = self.server.attempts.setdefault(self.path, 0) + 1
            self.server.attempts[self.path] = n
            self.server.cookies.setdefault(self.path, []).append(
                self.headers.get("Cookie"))
        if n == 1:
            try:
                self.connection.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            self.close_connection = True
            return
        body = b"second try"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        # close after serving so every path's FIRST attempt is on a
        # fresh socket: a hang-up on a fresh socket is a real network
        # error (policy retry, Cookie dropped), not the keep-alive
        # reuse race (silent same-headers re-attempt)
        self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)
        self.close_connection = True


@pytest.fixture()
def flaky_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.attempts = {}
    srv.cookies = {}
    _serve(srv)
    yield srv
    srv.shutdown()
    srv.server_close()


def test_retry_recovers_and_drops_cookie(spark, flaky_server):
    addr = f"127.0.0.1:{flaky_server.server_address[1]}"
    urls = [f"http://fk.test/r{i}" for i in range(6)]
    jar = spark.createDataFrame([("fk.test", "sid", "abc")],
                                "c_host string, c_name string, c_value string")
    src = HttpFetchSource(CrawlConfig(), connect_addr=addr, timeout_s=10.0,
                          threads_per_task=2, retries=2,
                          retry_backoff_s=0.01)
    out = src.lookup(_frontier(spark, urls), jar=jar).collect()
    assert all(r["status"] == 200 and bytes(r["body"]) == b"second try"
               for r in out)
    for i in range(6):
        path = f"/r{i}"
        assert flaky_server.attempts[path] == 2
        first, second = flaky_server.cookies[path]
        assert first == "sid=abc"      # original request carries the jar
        assert second is None          # Retry() drops the Cookie header


def test_no_retry_surfaces_network_error(spark, flaky_server):
    addr = f"127.0.0.1:{flaky_server.server_address[1]}"
    urls = [f"http://fk.test/z{i}" for i in range(4)]
    src = HttpFetchSource(CrawlConfig(), connect_addr=addr, timeout_s=10.0,
                          threads_per_task=2, retries=0)
    out = src.lookup(_frontier(spark, urls)).collect()
    assert len(out) == 4
    assert all(r["_purl"] is None and r["status"] is None for r in out)


class _ProxyHandler(BaseHTTPRequestHandler):
    """A forward proxy: expects an ABSOLUTE-form request line, records
    the target, serves a body identifying this proxy."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def do_GET(self):
        assert self.path.startswith("http://"), self.path
        with self.server.lock:
            self.server.served.append(self.path)
        body = f"via:{self.server.tag}".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _proxy_server(tag):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ProxyHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.served = []
    srv.tag = tag
    _serve(srv)
    return srv


def test_proxy_round_robin_matches_trace_ctx(spark):
    """cfg.proxies rotates by seq — the same pick the trace's proxy ctx
    column records — and the socket path actually routes through it
    with an absolute-form request line."""
    p0, p1 = _proxy_server("p0"), _proxy_server("p1")
    try:
        addr0 = f"127.0.0.1:{p0.server_address[1]}"
        addr1 = f"127.0.0.1:{p1.server_address[1]}"
        cfg = CrawlConfig(proxies=(addr0, addr1))
        urls = [f"http://px.test/q{i}" for i in range(10)]
        src = HttpFetchSource(cfg, timeout_s=10.0, threads_per_task=4)
        out = src.lookup(_frontier(spark, urls)).collect()
        by_seq = {r["seq"]: bytes(r["body"]).decode() for r in out}
        for i in range(10):
            assert by_seq[i] == ("via:p0" if i % 2 == 0 else "via:p1")
        assert sorted(p0.served) == [f"http://px.test/q{i}"
                                     for i in range(0, 10, 2)]
        assert sorted(p1.served) == [f"http://px.test/q{i}"
                                     for i in range(1, 10, 2)]
    finally:
        for s in (p0, p1):
            s.shutdown()
            s.server_close()


@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    r = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", cert, "-days", "2", "-nodes", "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"openssl cert generation unavailable: {r.stderr[:200]}")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.n_connections = 0
    srv.n_requests = 0
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    _serve(srv)
    yield srv, cert
    srv.shutdown()
    srv.server_close()


def test_https_verified_fetch(spark, tls_server):
    """Real TLS handshake with certificate verification against the
    loopback CA (SAN IP:127.0.0.1 — full hostname check, not insecure
    mode)."""
    srv, cert = tls_server
    port = srv.server_address[1]
    urls = [f"https://127.0.0.1:{port}/s{i}" for i in range(5)]
    src = HttpFetchSource(CrawlConfig(), timeout_s=10.0, threads_per_task=2,
                          ssl_cafile=cert)
    out = src.lookup(_frontier(spark, urls)).collect()
    assert len(out) == 5
    assert all(r["status"] == 200 and bytes(r["body"]) == b"<html>ok</html>"
               for r in out)


def test_https_untrusted_cert_is_network_error(spark, tls_server):
    """Without the CA, verification fails → the missing channel (no
    silent insecure fallback)."""
    srv, _ = tls_server
    port = srv.server_address[1]
    src = HttpFetchSource(CrawlConfig(), timeout_s=10.0, threads_per_task=2)
    out = src.lookup(
        _frontier(spark, [f"https://127.0.0.1:{port}/x"])).collect()
    assert out[0]["_purl"] is None and out[0]["status"] is None


class _EchoPostHandler(BaseHTTPRequestHandler):
    """Records every POST body per path; serves a link-free page."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def _page(self):
        body = b"<html><body>done</body></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._page()

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        with self.server.lock:
            self.server.posted.setdefault(self.path, []).append(
                self.rfile.read(n) if n else b"")
        self._page()


def test_live_post_bodies_reach_the_wire(spark, tmp_state):
    """S3/S4 seed bodies are transmitted by the live fetch stage —
    including a quota-DEFERRED POST fetched in a later batch (the body
    survives past the narrow admission checkpoint via the broadcast
    side table)."""
    from colly_spark.config import LimitRule
    from colly_spark.plans.crawler import Crawler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _EchoPostHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.posted = {}
    _serve(srv)
    try:
        addr = f"127.0.0.1:{srv.server_address[1]}"
        cfg = CrawlConfig(
            max_depth=2, ignore_robots=True,
            limit_rules=(LimitRule(domain_glob="*", delay_ms=1000,
                                   parallelism=1),))
        src = HttpFetchSource(cfg, connect_addr=addr, timeout_s=20.0)
        seeds = [("http://ep.test/a", "POST", b"payload-alpha"),
                 ("http://ep.test/b", "POST", b"payload-beta")]
        h = Crawler(spark, None, cfg, tmp_state, fetch_source=src) \
            .run(seeds, max_batches=6)
        fetched = sum(m["fetched"] for m in h.metrics)
        assert fetched == 2
        # quota of 1/host/batch: the two POSTs land in different batches
        assert [m["fetched"] for m in h.metrics][:2] == [1, 1]
        assert srv.posted["/a"] == [b"payload-alpha"]
        assert srv.posted["/b"] == [b"payload-beta"]
    finally:
        srv.shutdown()
        srv.server_close()


class _HeaderRecordingHandler(BaseHTTPRequestHandler):
    """Records every request's header list per path on the server."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def do_GET(self):
        with self.server.lock:
            self.server.seen.setdefault(self.path, []).append(
                [(k, v) for k, v in self.headers.items()])
        body = b"<html>ok</html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def header_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _HeaderRecordingHandler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.seen = {}
    _serve(srv)
    yield srv
    srv.shutdown()
    srv.server_close()


def test_custom_headers_on_the_wire(spark, header_server):
    """SetCustomHeaders (config.go:282-292): common headers reach the
    socket on every request, and the default UA is still added."""
    addr = f"127.0.0.1:{header_server.server_address[1]}"
    cfg = CrawlConfig(user_agent="cfg-ua",
                      custom_headers=(("X-Api-Key", "k1"),
                                      ("Accept-Language", "en")))
    src = HttpFetchSource(cfg, connect_addr=addr, timeout_s=10.0)
    out = src.lookup(_frontier(spark, ["http://hh.test/p"])).collect()
    assert out[0]["status"] == 200
    hdrs = dict(header_server.seen["/p"][0])
    assert hdrs["X-Api-Key"] == "k1"
    assert hdrs["Accept-Language"] == "en"
    assert hdrs["User-Agent"] == "cfg-ua"


def test_custom_user_agent_header_wins(spark, header_server):
    """A User-Agent entry in custom headers suppresses the per-request
    UA pick — colly.go:608-610 sets UA only when absent."""
    addr = f"127.0.0.1:{header_server.server_address[1]}"
    cfg = CrawlConfig(user_agent="cfg-ua", user_agents=("pool-a", "pool-b"),
                      custom_headers=(("User-Agent", "pinned-ua"),))
    src = HttpFetchSource(cfg, connect_addr=addr, timeout_s=10.0)
    out = src.lookup(_frontier(spark, ["http://hh.test/q"])).collect()
    assert out[0]["status"] == 200
    sent = header_server.seen["/q"][0]
    uas = [v for k, v in sent if k.lower() == "user-agent"]
    assert uas == ["pinned-ua"]


class _ConnectProxy:
    """Minimal CONNECT-capable forward proxy: records tunnel targets,
    rejects (and records) any plaintext absolute-form request so the
    no-leak property is directly observable."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.port = self.sock.getsockname()[1]
        self.lock = threading.Lock()
        self.targets = []
        self.plain_requests = []
        self._stop = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        while not self._stop:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(c,),
                             daemon=True).start()

    def _handle(self, c):
        up = None
        try:
            data = b""
            while b"\r\n\r\n" not in data:
                chunk = c.recv(4096)
                if not chunk:
                    return
                data += chunk
            head, rest = data.split(b"\r\n\r\n", 1)
            line = head.split(b"\r\n", 1)[0].decode("latin-1")
            method, target = line.split(" ", 2)[:2]
            if method != "CONNECT":
                with self.lock:
                    self.plain_requests.append(line)
                c.sendall(b"HTTP/1.1 400 Bad Request\r\n"
                          b"Content-Length: 0\r\nConnection: close\r\n\r\n")
                return
            with self.lock:
                self.targets.append(target)
            host, port = target.rsplit(":", 1)
            up = socket.create_connection((host, int(port)), timeout=10)
            c.sendall(b"HTTP/1.1 200 Connection established\r\n\r\n")
            if rest:
                up.sendall(rest)

            def pipe(a, b):
                try:
                    while True:
                        d = a.recv(65536)
                        if not d:
                            break
                        b.sendall(d)
                except OSError:
                    pass
                finally:
                    try:
                        b.shutdown(socket.SHUT_WR)
                    except OSError:
                        pass

            t = threading.Thread(target=pipe, args=(up, c), daemon=True)
            t.start()
            pipe(c, up)
            t.join(timeout=10)
        except Exception:
            pass
        finally:
            for s in (c, up):
                if s is not None:
                    try:
                        s.close()
                    except OSError:
                        pass

    def close(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass


def test_https_proxy_uses_connect_tunnel(spark, tls_server):
    """HTTPS through a forward proxy must CONNECT-tunnel (TLS inside):
    the proxy sees only the host:port, never a plaintext request line
    with URL/headers/cookies."""
    srv, cert = tls_server
    port = srv.server_address[1]
    proxy = _ConnectProxy()
    try:
        cfg = CrawlConfig(proxies=(f"127.0.0.1:{proxy.port}",))
        src = HttpFetchSource(cfg, timeout_s=10.0, threads_per_task=2,
                              ssl_cafile=cert)
        urls = [f"https://127.0.0.1:{port}/t{i}" for i in range(3)]
        out = src.lookup(_frontier(spark, urls)).collect()
        assert len(out) == 3
        assert all(r["status"] == 200 and
                   bytes(r["body"]) == b"<html>ok</html>" for r in out)
        assert proxy.plain_requests == [], "plaintext leaked on proxy hop"
        assert set(proxy.targets) == {f"127.0.0.1:{port}"}
    finally:
        proxy.close()


class _RedirRobotsHandler(BaseHTTPRequestHandler):
    """robots.txt behaviors per virtual host: rr.test redirects to the
    real rules; loop.test redirects to itself forever."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def _redir(self, loc):
        self.send_response(301)
        self.send_header("Location", loc)
        self.send_header("Content-Length", "9")
        self.end_headers()
        self.wfile.write(b"<a>moved\n")

    def do_GET(self):
        host = self.headers.get("Host") or ""
        if self.path == "/robots.txt":
            if host.startswith("loop."):
                return self._redir("/robots.txt")
            return self._redir("/real-robots")
        if self.path == "/real-robots":
            body = b"User-agent: *\nDisallow: /private\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(404)
        self.send_header("Content-Length", "0")
        self.end_headers()


def test_robots_redirect_followed_and_loop_blocks(spark):
    """A redirecting robots.txt is followed to the rules (the reference
    client follows before parsing); a redirect loop classifies as a
    fetch error (host blocked) rather than silently allowing all."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RedirRobotsHandler)
    srv.daemon_threads = True
    _serve(srv)
    try:
        addr = f"127.0.0.1:{srv.server_address[1]}"
        src = HttpFetchSource(CrawlConfig(), connect_addr=addr,
                              timeout_s=10.0, threads_per_task=2)
        hosts = spark.createDataFrame([("rr.test",), ("loop.test",)],
                                      "host string")
        rows = {r["host"]: r for r in src.fetch_robots(hosts).collect()}
        assert rows["rr.test"]["fetch_error"] is False
        assert "Disallow: /private" in rows["rr.test"]["body"]
        assert rows["loop.test"]["fetch_error"] is True
        assert rows["loop.test"]["body"] is None
    finally:
        srv.shutdown()
        srv.server_close()
