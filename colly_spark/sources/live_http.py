"""Live HTTP fetch source — the deployment fetch stage (X1).

The sandbox engine "fetches" by joining the frontier against a corpus
table (plans/crawler.py). This module provides the REAL fetch behind
the same contract: an ``mapInPandas`` stage whose per-task thread pool
drives stdlib ``urllib`` (reference: http_backend.go Do/Cache,
colly.go fetch) so the crawler needs no code change beyond picking the
source. One Python call per Arrow batch; inside it, ``threads_per_task``
concurrent sockets — total concurrency = tasks × threads, bounded above
by the politeness quota that sized the batch in the first place.

Semantics mirrored from the reference HTTP backend:

- redirects are NOT auto-followed: a 3xx returns (status, Location)
  and the crawler's hop loop re-runs filters/robots/dedup on the
  target (colly.go:1306-1354). Relative ``Location`` is resolved
  against the request URL.
- per-request UserAgent = the same deterministic pool pick recorded in
  the trace ctx (extensions/random_user_agent.go analogue).
- cookie jar: the committed (host, name, value) jar rows become a
  ``Cookie`` header (cookiejar.go:23-60); ``Set-Cookie`` response
  headers flow back out for the next batch's commit.
- network errors (refused/timeout/DNS) surface as ``_purl = NULL`` —
  the same "missing" channel the corpus join uses — and become
  ERR_MISSING fetch errors.
- robots.txt: 2xx → body; 4xx → no rules (allow-all); 5xx or network
  error → fetch_error (blocks the host) — temoto/robotstxt semantics
  as used by colly.go:792-827.

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
)


class _NoRedirect:
    """urllib redirect handler that refuses to follow — the 3xx
    surfaces as HTTPError carrying status + Location."""

    def __init__(self):
        import urllib.request

        class H(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        self.handler = H()


def _fetch_one(opener, url, method, body_req, ua, cookie, connect_addr,
               timeout_s, max_read):
    """One request → dict of _RESPONSE_FIELDS values."""
    import urllib.error
    import urllib.parse
    import urllib.request

    target = url
    host_hdr = None
    if connect_addr:
        p = urllib.parse.urlsplit(url)
        target = urllib.parse.urlunsplit(
            (p.scheme, connect_addr, p.path, p.query, ""))
        host_hdr = p.netloc
    req = urllib.request.Request(target, data=body_req, method=method)
    req.add_unredirected_header("User-Agent", ua or "")
    if cookie:
        req.add_unredirected_header("Cookie", cookie)
    if host_hdr:
        # explicit Host suppresses http.client's connect-address Host:
        # the server sees the virtual host, the socket goes elsewhere
        req.add_unredirected_header("Host", host_hdr)
    try:
        try:
            resp = opener.open(req, timeout=timeout_s)
            status = resp.status
        except urllib.error.HTTPError as e:  # non-2xx incl. refused 3xx
            resp = e
            status = e.code
        with resp:
            body = resp.read(max_read) if method != "HEAD" else b""
            headers = resp.headers
        loc = headers.get("Location")
        return dict(
            _purl=url,
            status=int(status),
            content_type=headers.get("Content-Type"),
            body=body,
            redirect_to=urllib.parse.urljoin(url, loc) if loc else None,
            image_id=None,
            set_cookie=headers.get("Set-Cookie"),
            require_cookie=None,
        )
    except Exception:
        # refused / timeout / DNS / protocol garbage → the "missing"
        # channel (ERR_MISSING), exactly like a corpus-join miss
        return dict(_purl=None, status=None, content_type=None, body=None,
                    redirect_to=None, image_id=None, set_cookie=None,
                    require_cookie=None)


class HttpFetchSource:
    """Pluggable live fetch stage for :class:`~colly_spark.plans.crawler.
    Crawler` (pass as ``fetch_source=``). Output contract = the corpus
    join's: input columns + ``(_purl, status, content_type, body,
    redirect_to, image_id, set_cookie, require_cookie)``."""

    def __init__(self, cfg, connect_addr: str | None = None,
                 timeout_s: float = 10.0, threads_per_task: int = 16,
                 max_read_bytes: int = 10 << 20):
        self.cfg = cfg
        self.connect_addr = connect_addr
        self.timeout_s = timeout_s
        self.threads_per_task = threads_per_task
        self.max_read_bytes = max_read_bytes

    # -- per-request UA: same pool pick the trace records ---------------
    def _ua_col(self, hash_col):
        from pyspark.sql import functions as F

        pool = self.cfg.user_agents
        if not pool:
            return F.lit(self.cfg.user_agent)
        arr = F.array(*[F.lit(u) for u in pool])
        idx = F.pmod(hash_col + F.lit(self.cfg.seed), F.lit(len(pool)))
        return F.element_at(arr, (idx + 1).cast("int"))

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

        def _fetch_batch(iterator):
            import concurrent.futures
            import urllib.request

            opener = urllib.request.build_opener(_NoRedirect().handler)
            with concurrent.futures.ThreadPoolExecutor(threads) as pool:
                for pdf in iterator:
                    if len(pdf) == 0:
                        continue
                    futs = [
                        pool.submit(
                            _fetch_one, opener, cur, method,
                            bytes(body_req) if body_req is not None else None,
                            ua, cookie if isinstance(cookie, str) else None,
                            connect_addr, timeout_s, max_read)
                        for cur, method, body_req, ua, cookie in zip(
                            pdf["cur"], pdf["method"], pdf["body_req"],
                            pdf["_ua"], pdf["_cookie"])]
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
        ua = self.cfg.user_agent

        def _fetch_batch(iterator):
            import concurrent.futures
            import urllib.request

            opener = urllib.request.build_opener(_NoRedirect().handler)

            def one(host):
                r = _fetch_one(opener, f"http://{host}/robots.txt", "GET",
                               None, ua, None, connect_addr, timeout_s,
                               max_read)
                if r["_purl"] is None or r["status"] >= 500:
                    return dict(host=host, body=None, fetch_error=True)
                if r["status"] >= 400:
                    return dict(host=host, body=None, fetch_error=False)
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
