"""Live HTTP fetch source — the deployment fetch stage (X1).

The sandbox engine "fetches" by joining the frontier against a corpus
table (plans/crawler.py). This module provides the REAL fetch behind
the same contract: an ``mapInPandas`` stage whose per-task thread pool
drives ``http.client`` sockets (reference: http_backend.go Do/Cache,
colly.go fetch) so the crawler needs no code change beyond picking the
source. One Python call per Arrow batch; inside it, ``threads_per_task``
concurrent sockets — total concurrency = tasks × threads, bounded above
by the politeness quota that sized the batch in the first place.

Semantics mirrored from the reference HTTP backend:

- redirects are NOT auto-followed: a 3xx returns (status, Location)
  and the crawler's hop loop re-runs filters/robots/dedup on the
  target (colly.go:1306-1354). Relative ``Location`` is resolved
  against the request URL. ``http.client`` never follows redirects, so
  refusal is structural, not a handler override.
- per-request UserAgent = the same deterministic pool pick recorded in
  the trace ctx (extensions/random_user_agent.go analogue).
- per-request proxy = the same deterministic round-robin pick the
  trace records (proxy/proxy.go:31-46 rotates an atomic counter per
  request; here the rotation key is the stable ``seq``, which is the
  batch engine's request counter). The socket connects to the proxy
  and sends an absolute-form request line — standard HTTP/1.1 forward
  proxying.
- retries: ``Request.Retry()`` (request.go:191-193) resubmits the same
  request with the ``Cookie`` header dropped and no revisit check. The
  batch analogue is a bounded per-request retry policy on NETWORK
  errors (refused/timeout/hangup): up to ``retries`` re-attempts with
  deterministic exponential backoff, Cookie header dropped on the
  re-attempts. HTTP status errors are responses, not retried — they
  flow to the caller exactly like the reference (OnError decides).
- cookie jar: the committed (host, name, value) jar rows become a
  ``Cookie`` header (cookiejar.go:23-60); ``Set-Cookie`` response
  headers flow back out for the next batch's commit.
- network errors (refused/timeout/DNS) surface as ``_purl = NULL`` —
  the same "missing" channel the corpus join uses — and become
  ERR_MISSING fetch errors.
- robots.txt: 2xx → body; 4xx → no rules (allow-all); 5xx or network
  error → fetch_error (blocks the host) — temoto/robotstxt semantics
  as used by colly.go:792-827.

Connections are KEPT ALIVE and reused: each worker thread owns a
``(scheme, connect-netloc) → HTTPConnection`` cache (thread-local, so
no locks) that lives for the whole ``mapInPandas`` task — i.e. across
every Arrow batch and every URL the task fetches. A stale keep-alive
connection (server closed between requests) is detected and retried
once on a fresh socket without consuming the retry budget — the
standard HTTP/1.1 reuse race. HTTPS uses ``HTTPSConnection`` with a
context built inside the worker from ``ssl_cafile`` /
``ssl_insecure`` (an ``ssl.SSLContext`` cannot be pickled into the
Python workers, so the source ships the ingredients, not the object).

``connect_addr`` routes every TCP connection to one address while
preserving the request's virtual host via an explicit ``Host`` header
(origin-form request line). That is how the pytest harness serves the
deterministic fixture corpus over a real loopback HTTP server — and it
doubles as a forward-proxy seam in deployment.

Scale shape: no driver involvement, no shuffle — the fetch stage is
map-side on whatever partitioning admission produced (hash(url_hash),
so a hot domain's URLs are spread across tasks; per-domain politeness
was already enforced by the quota window).
"""

from __future__ import annotations

import pandas as pd

_RESPONSE_FIELDS = (
    ("_purl", "string"),
    ("status", "int"),
    ("content_type", "string"),
    ("body", "binary"),
    ("redirect_to", "string"),
    ("image_id", "string"),
    ("set_cookie", "string"),
    ("require_cookie", "string"),
    ("cache_max_age", "int"),
    ("retry_after", "int"),
    ("etag", "string"),
    ("last_modified", "string"),
)


class _ConnCache:
    """Per-thread keep-alive connection cache.

    Keyed by (scheme, netloc-actually-connected-to). One entry per key
    per thread; the thread pool's threads live for the task lifetime,
    so a hot host's connection is reused across Arrow batches. No
    locks: ``threading.local`` isolation."""

    def __init__(self, timeout_s: float, ssl_cafile=None, ssl_insecure=False):
        import threading

        self._tls = threading.local()
        self.timeout_s = timeout_s
        self.ssl_cafile = ssl_cafile
        self.ssl_insecure = ssl_insecure
        self._ssl_ctx = None

    def _table(self):
        t = getattr(self._tls, "conns", None)
        if t is None:
            t = self._tls.conns = {}
        return t

    def get(self, scheme: str, netloc: str):
        """Return (conn, reused) — ``reused`` tells the caller whether a
        stale-connection error is retryable on a fresh socket."""
        key = (scheme, netloc)
        conns = self._table()
        conn = conns.get(key)
        if conn is not None:
            return conn, True
        conn = self._open(scheme, netloc)
        conns[key] = conn
        return conn, False

    def _open(self, scheme: str, netloc: str):
        import http.client
        import ssl

        if scheme == "https+connect":
            # CONNECT tunnel through a forward proxy: plaintext TCP to
            # the proxy, CONNECT target, then TLS to the target inside
            # the tunnel (RFC 7231 §4.3.6). netloc = "proxy|target".
            proxy_netloc, target_netloc = netloc.split("|", 1)
            if self._ssl_ctx is None:
                ctx = ssl.create_default_context(cafile=self.ssl_cafile)
                if self.ssl_insecure:
                    ctx.check_hostname = False
                    ctx.verify_mode = ssl.CERT_NONE
                self._ssl_ctx = ctx
            conn = http.client.HTTPSConnection(
                proxy_netloc, timeout=self.timeout_s, context=self._ssl_ctx)
            conn.set_tunnel(target_netloc)
            return conn
        if scheme == "https":
            if self._ssl_ctx is None:
                ctx = ssl.create_default_context(cafile=self.ssl_cafile)
                if self.ssl_insecure:
                    ctx.check_hostname = False
                    ctx.verify_mode = ssl.CERT_NONE
                self._ssl_ctx = ctx
            return http.client.HTTPSConnection(
                netloc, timeout=self.timeout_s, context=self._ssl_ctx)
        return http.client.HTTPConnection(netloc, timeout=self.timeout_s)

    def fresh(self, scheme: str, netloc: str):
        """Drop any cached connection for the key and open a new one."""
        self.discard(scheme, netloc)
        conns = self._table()
        conn = self._open(scheme, netloc)
        conns[(scheme, netloc)] = conn
        return conn

    def discard(self, scheme: str, netloc: str):
        conn = self._table().pop((scheme, netloc), None)
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass


def _request_once(conns: _ConnCache, url, method, body_req, headers,
                  proxy, connect_addr, max_read):
    """One wire round-trip (no retry logic). Returns the response dict.
    Raises on network error so the caller can apply the retry policy."""
    import http.client
    import urllib.parse

    p = urllib.parse.urlsplit(url)
    scheme = p.scheme or "http"
    hdrs = dict(headers)
    if proxy:
        pp = urllib.parse.urlsplit(
            proxy if "://" in proxy else f"http://{proxy}")
        if scheme == "https":
            # https through a proxy MUST tunnel (CONNECT + TLS inside):
            # absolute-form plaintext would leak URL/headers/cookies on
            # the proxy hop and real proxies reject it anyway
            conn_scheme = "https+connect"
            conn_netloc = f"{pp.netloc}|{p.netloc}"
            target = urllib.parse.urlunsplit(
                ("", "", p.path or "/", p.query, ""))
        else:
            # plain-http forward proxy: absolute-form request line
            # (RFC 7230 §5.3.2) — the proxy routes on the URL itself
            conn_scheme, conn_netloc = (pp.scheme or "http"), pp.netloc
            target = urllib.parse.urlunsplit((scheme, p.netloc,
                                              p.path or "/", p.query, ""))
    elif connect_addr:
        # loopback/test routing: connect elsewhere, origin-form path,
        # explicit Host header carries the virtual host
        conn_scheme, conn_netloc = scheme, connect_addr
        target = urllib.parse.urlunsplit(("", "", p.path or "/", p.query, ""))
        hdrs["Host"] = p.netloc
    else:
        conn_scheme, conn_netloc = scheme, p.netloc
        target = urllib.parse.urlunsplit(("", "", p.path or "/", p.query, ""))

    conn, reused = conns.get(conn_scheme, conn_netloc)
    for attempt in (0, 1):
        try:
            conn.request(method, target, body=body_req, headers=hdrs)
            resp = conn.getresponse()
            break
        except (http.client.RemoteDisconnected, http.client.BadStatusLine,
                ConnectionResetError, BrokenPipeError):
            conns.discard(conn_scheme, conn_netloc)
            if not (reused and attempt == 0):
                raise  # a FRESH connection failing is a real error
            # keep-alive reuse race: server closed between requests —
            # one silent re-attempt on a new socket, not a retry
            conn, reused = conns.fresh(conn_scheme, conn_netloc), False
        except Exception:
            conns.discard(conn_scheme, conn_netloc)
            raise

    try:
        if method == "HEAD":
            body = b""
            resp.read()  # drain (empty) so the connection stays clean
        else:
            body = resp.read(max_read)
            if len(body) >= max_read and resp.read(1):
                # truncated mid-stream: the socket is now unusable for
                # keep-alive — drop it rather than drain the remainder
                conns.discard(conn_scheme, conn_netloc)
        if resp.will_close:
            conns.discard(conn_scheme, conn_netloc)
    except Exception:
        conns.discard(conn_scheme, conn_netloc)
        raise

    loc = resp.headers.get("Location")
    import urllib.parse as up
    return dict(
        _purl=url,
        status=int(resp.status),
        content_type=resp.headers.get("Content-Type"),
        body=body,
        redirect_to=up.urljoin(url, loc) if loc else None,
        image_id=None,
        set_cookie=resp.headers.get("Set-Cookie"),
        require_cookie=None,
        cache_max_age=_max_age_of(resp.headers),
        retry_after=_retry_after_of(resp.headers),
        etag=resp.headers.get("ETag"),
        last_modified=resp.headers.get("Last-Modified"),
    )


def _max_age_of(headers):
    """Effective freshness seconds from response headers — the v3 TTL
    extraction (response.go:108-149): s-maxage beats max-age, the Age
    already consumed is subtracted; no header → None (under the
    by-header expiry policy such responses are not cacheable)."""
    import re as _re

    cc = headers.get("Cache-Control") or ""
    m = (_re.search(r"s-maxage\s*=\s*(\d+)", cc)
         or _re.search(r"max-age\s*=\s*(\d+)", cc))
    if not m:
        return None
    age = 0
    try:
        age = int(headers.get("Age") or 0)
    except ValueError:
        pass
    return max(0, int(m.group(1)) - age)


def _retry_after_of(headers):
    """Retry-After seconds from response headers (RFC 9110 §10.2.3):
    delta-seconds form verbatim; HTTP-date form as whole seconds from
    now, clamped ≥0; absent/garbage → None. Consumed by the engine's
    respect_retry_after host back-pressure."""
    v = headers.get("Retry-After")
    if not v:
        return None
    v = v.strip()
    if v.isdigit():
        return int(v)
    try:
        import time
        from email.utils import parsedate_to_datetime
        dt = parsedate_to_datetime(v)
        return max(0, int(dt.timestamp() - time.time()))
    except (TypeError, ValueError):
        return None


def _fetch_one(conns: _ConnCache, url, method, body_req, ua, cookie,
               proxy, connect_addr, max_read, retries, backoff_s,
               base_headers=None, inm=None, ims=None):
    """One request → dict of _RESPONSE_FIELDS values, applying the
    retry policy (network errors only; the jar Cookie is dropped on
    re-attempts, request.go:191-193 — custom headers persist).

    ``base_headers`` are the config's common headers (SetCustomHeaders
    config.go:282-292); User-Agent is added only when they don't carry
    one (colly.go:608-610), and the jar cookie overrides any custom
    Cookie for the first attempt (http.Client jar semantics)."""
    import time

    base = dict(base_headers or {})
    for attempt in range(retries + 1):
        headers = dict(base)
        if not any(k.lower() == "user-agent" for k in headers):
            headers["User-Agent"] = ua or ""
        if cookie and attempt == 0:
            headers["Cookie"] = cookie
        if inm:
            # cache_revalidate: conditional GET (RFC 9111 §4.3.1) —
            # the server answers 304 Not Modified when the entity is
            # unchanged and the engine replays the stored entry
            headers["If-None-Match"] = inm
        if ims:
            headers["If-Modified-Since"] = ims
        try:
            return _request_once(conns, url, method, body_req, headers,
                                 proxy, connect_addr, max_read)
        except Exception:
            if attempt >= retries:
                break
            time.sleep(backoff_s * (2 ** attempt))
    # refused / timeout / DNS / protocol garbage → the "missing"
    # channel (ERR_MISSING), exactly like a corpus-join miss
    return dict(_purl=None, status=None, content_type=None, body=None,
                redirect_to=None, image_id=None, set_cookie=None,
                require_cookie=None, cache_max_age=None, retry_after=None,
                etag=None, last_modified=None)


class HttpFetchSource:
    """Pluggable live fetch stage for :class:`~colly_spark.plans.crawler.
    Crawler` (pass as ``fetch_source=``). Output contract = the corpus
    join's: input columns + ``(_purl, status, content_type, body,
    redirect_to, image_id, set_cookie, require_cookie)``.

    ``retries``/``retry_backoff_s``: bounded re-attempts on network
    errors (deterministic exponential backoff; Cookie header dropped on
    re-attempts — request.go:191-193). ``ssl_cafile``/``ssl_insecure``:
    HTTPS trust config, turned into an ``ssl.SSLContext`` inside each
    worker (contexts don't pickle). Per-request proxies are
    taken from ``cfg.proxies``, rotated by ``seq`` exactly like the
    trace's proxy ctx column (proxy/proxy.go:31-46)."""

    def __init__(self, cfg, connect_addr: str | None = None,
                 timeout_s: float = 10.0, threads_per_task: int = 16,
                 max_read_bytes: int = 10 << 20, retries: int = 0,
                 retry_backoff_s: float = 0.05, ssl_cafile: str | None = None,
                 ssl_insecure: bool = False, use_proxies: bool = True):
        self.cfg = cfg
        self.connect_addr = connect_addr
        self.timeout_s = timeout_s
        self.threads_per_task = threads_per_task
        self.max_read_bytes = max_read_bytes
        self.retries = retries
        self.retry_backoff_s = retry_backoff_s
        self.ssl_cafile = ssl_cafile
        self.ssl_insecure = ssl_insecure
        self.use_proxies = use_proxies

    # -- per-request UA: same pool pick the trace records ---------------
    def _ua_col(self, hash_col):
        from pyspark.sql import functions as F

        pool = self.cfg.user_agents
        if not pool:
            return F.lit(self.cfg.user_agent)
        arr = F.array(*[F.lit(u) for u in pool])
        idx = F.pmod(hash_col + F.lit(self.cfg.seed), F.lit(len(pool)))
        return F.element_at(arr, (idx + 1).cast("int"))

    # -- per-request proxy: same round-robin the trace ctx records -------
    def _proxy_col(self):
        from pyspark.sql import functions as F

        pool = self.cfg.proxies if self.use_proxies else None
        if not pool:
            return F.lit(None).cast("string")
        arr = F.array(*[F.lit(p) for p in pool])
        return F.element_at(
            arr, (F.pmod(F.col("seq"), F.lit(len(pool))) + 1).cast("int"))

    def lookup(self, remaining, jar=None):
        """remaining: (seq, url, cur, depth, method, req_hash, referer
        [, body_req]). Returns remaining + response columns, one row per
        input row (network errors keep the row with _purl NULL)."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                                       StructField, StructType)

        df = remaining
        if "body_req" not in df.columns:
            df = df.withColumn("body_req", F.lit(None).cast("binary"))
        df = df.withColumn("_ua", self._ua_col(F.col("req_hash")))
        df = df.withColumn("_proxy", self._proxy_col())
        if jar is not None:
            host = F.regexp_extract(F.col("cur"), "^[a-z]+://([^/]+)", 1)
            # deterministic Cookie header: name-sorted "n1=v1; n2=v2"
            hdr = (jar.groupBy("c_host")
                      .agg(F.array_join(
                          F.array_sort(F.collect_list(
                              F.concat_ws("=", "c_name", "c_value"))),
                          "; ").alias("_cookie")))
            df = df.join(F.broadcast(hdr), host == hdr["c_host"], "left") \
                   .drop("c_host")
        else:
            df = df.withColumn("_cookie", F.lit(None).cast("string"))

        passthrough = [f for f in remaining.schema.fields]
        type_map = {"string": StringType(), "int": IntegerType(),
                    "binary": BinaryType()}
        out_schema = StructType(
            passthrough
            + [StructField(n, type_map[t]) for n, t in _RESPONSE_FIELDS])
        pass_cols = [f.name for f in passthrough]
        connect_addr, timeout_s = self.connect_addr, self.timeout_s
        threads, max_read = self.threads_per_task, self.max_read_bytes
        retries, backoff_s = self.retries, self.retry_backoff_s
        ssl_cafile, ssl_insecure = self.ssl_cafile, self.ssl_insecure
        custom_headers = dict(getattr(self.cfg, "custom_headers", ()) or ())

        def _fetch_batch(iterator):
            import concurrent.futures

            conns = _ConnCache(timeout_s, ssl_cafile, ssl_insecure)
            with concurrent.futures.ThreadPoolExecutor(threads) as pool:
                for pdf in iterator:
                    if len(pdf) == 0:
                        continue
                    inms = (pdf["_inm"] if "_inm" in pdf.columns
                            else [None] * len(pdf))
                    imss = (pdf["_ims"] if "_ims" in pdf.columns
                            else [None] * len(pdf))
                    futs = [
                        pool.submit(
                            _fetch_one, conns, cur, method,
                            bytes(body_req) if body_req is not None else None,
                            ua, cookie if isinstance(cookie, str) else None,
                            proxy if isinstance(proxy, str) else None,
                            connect_addr, max_read, retries, backoff_s,
                            custom_headers,
                            inm if isinstance(inm, str) else None,
                            ims if isinstance(ims, str) else None)
                        for cur, method, body_req, ua, cookie, proxy, inm,
                        ims in zip(
                            pdf["cur"], pdf["method"], pdf["body_req"],
                            pdf["_ua"], pdf["_cookie"], pdf["_proxy"], inms,
                            imss)]
                    resp = pd.DataFrame([f.result() for f in futs])
                    out = pdf[pass_cols].reset_index(drop=True)
                    for name, _ in _RESPONSE_FIELDS:
                        out[name] = resp[name]
                    yield out

        return df.mapInPandas(_fetch_batch, schema=out_schema)

    def fetch_robots(self, hosts_df):
        """hosts_df: (host). Live-fetch http://host/robots.txt for each,
        returning (host, body, fetch_error) — the robots table schema.
        2xx → rules; 4xx → allow-all; 5xx/network → fetch_error."""
        from pyspark.sql.types import (BooleanType, StringType, StructField,
                                       StructType)

        schema = StructType([
            StructField("host", StringType()),
            StructField("body", StringType()),
            StructField("fetch_error", BooleanType()),
        ])
        connect_addr, timeout_s = self.connect_addr, self.timeout_s
        threads, max_read = self.threads_per_task, self.max_read_bytes
        retries, backoff_s = self.retries, self.retry_backoff_s
        ssl_cafile, ssl_insecure = self.ssl_cafile, self.ssl_insecure
        ua = self.cfg.user_agent

        def _fetch_batch(iterator):
            import concurrent.futures

            conns = _ConnCache(timeout_s, ssl_cafile, ssl_insecure)

            def one(host):
                # follow redirects (bounded) like the reference's plain
                # client Get does before parsing (colly.go:792-827) —
                # parsing a 3xx body as rules would silently allow-all
                url = f"http://{host}/robots.txt"
                for _hop in range(5):
                    r = _fetch_one(conns, url, "GET", None, ua, None, None,
                                   connect_addr, max_read, retries, backoff_s)
                    if r["_purl"] is None or r["status"] >= 500:
                        return dict(host=host, body=None, fetch_error=True)
                    if 300 <= r["status"] < 400 and r["redirect_to"]:
                        url = r["redirect_to"]
                        continue
                    break
                else:
                    # redirect loop / too many hops → treat as a fetch
                    # error so the host is blocked, never silently open
                    return dict(host=host, body=None, fetch_error=True)
                if r["status"] >= 400:
                    return dict(host=host, body=None, fetch_error=False)
                if r["status"] >= 300:
                    # terminal 3xx without Location: unfetchable
                    return dict(host=host, body=None, fetch_error=True)
                return dict(host=host,
                            body=(r["body"] or b"").decode("utf-8", "replace"),
                            fetch_error=False)

            with concurrent.futures.ThreadPoolExecutor(threads) as pool:
                for pdf in iterator:
                    if len(pdf) == 0:
                        continue
                    futs = [pool.submit(one, h) for h in pdf["host"]]
                    yield pd.DataFrame([f.result() for f in futs])

        return hosts_df.select("host").mapInPandas(_fetch_batch, schema=schema)
