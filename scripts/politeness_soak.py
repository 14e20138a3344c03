#!/usr/bin/env python
"""Live-HTTP politeness long-soak: ≥10k REAL socket requests through
the wall-clock-paced streaming drain with the circuit breaker,
Retry-After back-pressure, and robots Crawl-delay ALL active, with the
SERVER (not the engine) recording a monotonic timestamp per request —
the ground truth the politeness claims are checked against.

What it asserts (see soak() docstring for the exact floors):

1. per-host per-batch burst ≤ the configured quota — the LimitRule
   rate, checked against the server's own log joined to the trace;
2. the per-host request-interval floor in WALL CLOCK: consecutive
   requests to a host that land in batches b1 < b2 are at least
   (b2 - b1) * window - slack apart, where slack = one trigger window
   (the documented jitter bound of processingTime pacing — a tick
   that starts late compresses at most one window);
3. the Crawl-delay host's consecutive fetches are ≥ delay - window
   apart (super-window delays block the host for
   ceil(delay/window) - 1 ticks — config.py respect_crawl_delay);
4. after every 429-with-Retry-After the server hands out, the next
   request to that host arrives ≥ ceil(retry_after/window) batches
   AND ≥ retry_after - window wall seconds later;
5. the breaker host (hangs up every connection) is probed in
   budget-bounded bursts: between consecutive probe batches the gap
   is either 1 (inside the error budget) or ≥ 1 + cooldown batches.

Within-batch requests to one host are a burst of ≤ quota by design —
the engine's politeness is a per-window RATE (the LimitRule
parallelism/Delay model maps to window quotas, operators/politeness
.py), not per-request spacing; the floors above are exactly what that
model guarantees in wall-clock terms under trigger pacing.

Usage: python scripts/politeness_soak.py
Env:  SOAK_HOSTS (48) normal hosts, SOAK_PAGES_PER_HOST (260),
      SOAK_BATCHES (50), SOAK_WINDOW_MS (1500), SOAK_MIN_REQUESTS
      (10000), SPARK_GRAFT_CPUS (bench default).
Prints one JSON line; nonzero exit on any floor violation.
"""

from __future__ import annotations

import json
import math
import os
import socket
import sys
import tempfile
import threading
import time
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = int(os.environ.get("SOAK_HOSTS", "48"))
PAGES_PER_HOST = int(os.environ.get("SOAK_PAGES_PER_HOST", "260"))
MAX_BATCHES = int(os.environ.get("SOAK_BATCHES", "50"))
WINDOW_MS = int(os.environ.get("SOAK_WINDOW_MS", "1500"))
MIN_REQUESTS = int(os.environ.get("SOAK_MIN_REQUESTS", "10000"))

DELAY_HOST = "slow.test"          # robots Crawl-delay: 3 (super-window)
CRAWL_DELAY_S = 3
RETRY_HOST = "flaky.test"         # every 10th page 429s, Retry-After: 2
RETRY_AFTER_S = 2
DEAD_HOST = "dead.test"           # hangs up every connection (breaker)
ERROR_BUDGET = 2
COOLDOWN_BATCHES = 3


def _normal_host(i: int) -> str:
    return f"h{i:03d}.test"


def build_pages(n_hosts: int = N_HOSTS,
                pages_per_host: int = PAGES_PER_HOST) -> dict:
    """url -> (status, body, retry_after). Each page links to the next
    EIGHT on its host — the frontier must gain ≥ quota (6) new URLs
    per fetching batch to stay backlogged (fetching a quota-burst of
    consecutive pages discovers only the window past the last one, so
    a fanout at or below the quota starves the frontier to the fanout
    rate)."""
    pages = {}

    def chain(host, n, flaky_every=0):
        for i in range(n):
            links = "".join(
                f'<a href="/p{j}">n</a>'
                for j in range(i + 1, min(i + 9, n)))
            body = f"<html><body>{links}</body></html>"
            if flaky_every and i and i % flaky_every == 0:
                pages[f"http://{host}/p{i}"] = (429, body, RETRY_AFTER_S)
            else:
                pages[f"http://{host}/p{i}"] = (200, body, None)

    for h in range(n_hosts):
        chain(_normal_host(h), pages_per_host)
    chain(DELAY_HOST, 40)
    chain(RETRY_HOST, 200, flaky_every=10)
    # DEAD_HOST has no pages: every connection is shut down unread
    return pages


class _SoakHandler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_GET(self):
        host = self.headers.get("Host") or ""
        # ground-truth log: (monotonic ts, host, path) at arrival
        self.server.log.append((time.monotonic(), host, self.path))
        if host == DEAD_HOST and self.path != "/robots.txt":
            # robots answers (404 → allow-all) so page fetches reach
            # the transport-error channel and trip the BREAKER; a
            # robots fetch-error would block the host at the gate
            # instead (the pinned F8 policy) and starve the breaker
            try:
                self.connection.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            self.close_connection = True
            return
        if self.path == "/robots.txt":
            if host == DELAY_HOST:
                body = f"User-agent: *\nCrawl-delay: {CRAWL_DELAY_S}\n"
                return self._reply(200, body.encode())
            return self._reply(404, b"")
        row = self.server.pages.get(f"http://{host}{self.path}")
        if row is None:
            return self._reply(404, b"")
        status, body, retry_after = row
        hdrs = {"Retry-After": str(retry_after)} if retry_after else {}
        self._reply(status, body.encode(), hdrs)

    def _reply(self, status, body, headers=None):
        self.send_response(status)
        self.send_header("Content-Type", "text/html")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)


def soak(spark, max_batches: int = MAX_BATCHES,
         window_ms: int = WINDOW_MS, min_requests: int = MIN_REQUESTS,
         ignore_robots: bool = False, n_hosts: int = N_HOSTS,
         pages_per_host: int = PAGES_PER_HOST):
    """Run the soak; returns (report dict, violations list). Floors
    checked server-side; `violations` empty means every floor held.
    ``ignore_robots=True`` exercises the documented seam where the
    allow/deny gate is off but Crawl-delay must STILL be honored (the
    lazy robots fetch is forced on by respect_crawl_delay —
    plans/crawler.py _lazy_robots)."""
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.sources.live_http import HttpFetchSource
    from colly_spark.streaming.drain import run_streaming_drain

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SoakHandler)
    srv.daemon_threads = True
    srv.pages = build_pages(n_hosts, pages_per_host)
    srv.log = []  # list.append is atomic under the GIL
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = f"127.0.0.1:{srv.server_address[1]}"

    cfg = CrawlConfig(
        max_depth=0,
        ignore_robots=ignore_robots,
        batch_window_ms=window_ms,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=230,
                               parallelism=1),),
        respect_crawl_delay=True,
        respect_retry_after=True,
        host_error_budget=ERROR_BUDGET,
        host_cooldown_batches=COOLDOWN_BATCHES,
    )
    quota = cfg.domain_quota(_normal_host(0))
    seeds = ([f"http://{_normal_host(h)}/p0" for h in range(n_hosts)]
             + [f"http://{DELAY_HOST}/p0", f"http://{RETRY_HOST}/p0"]
             + [f"http://{DEAD_HOST}/p{i}" for i in range(30)])
    state = tempfile.mkdtemp(prefix="colly_soak_")
    src = HttpFetchSource(cfg, connect_addr=addr, timeout_s=20.0)
    t0 = time.monotonic()
    handles = run_streaming_drain(
        spark, None, cfg, state, seeds=seeds, max_batches=max_batches,
        fetch_source=src, bloom_threshold_rows=0)
    wall = time.monotonic() - t0
    srv.shutdown()
    srv.server_close()

    # url -> batch map from the engine's own record (trace + errors)
    url_batch = {}
    for r in handles.trace().select("url", "batch").collect():
        url_batch[r["url"]] = r["batch"]
    for r in handles.errors().select("url", "batch").collect():
        url_batch.setdefault(r["url"], r["batch"])

    w = window_ms / 1000.0
    slack = w  # one trigger window of jitter — the documented bound
    by_host = defaultdict(list)  # host -> [(ts, path, batch)]
    n_requests = 0
    for ts, host, path in sorted(srv.log):
        if path == "/robots.txt":
            continue
        n_requests += 1
        by_host[host].append((ts, path, url_batch.get(f"http://{host}{path}")))

    violations = []

    def viol(kind, **kw):
        violations.append(dict(kind=kind, **kw))

    batch_counts = defaultdict(int)
    for host, rows in by_host.items():
        # 1. burst bound: per-batch count ≤ quota for that host
        per_batch = defaultdict(int)
        for ts, path, b in rows:
            if b is not None:
                per_batch[b] += 1
        cap = cfg.domain_quota(host)
        for b, n in per_batch.items():
            batch_counts[b] += n
            if n > cap:
                viol("burst", host=host, batch=b, n=n, quota=cap)
        # 2. cross-batch wall floor: (Δbatch)·window − slack
        for (t1, p1, b1), (t2, p2, b2) in zip(rows, rows[1:]):
            if b1 is None or b2 is None or b2 <= b1:
                continue
            floor = (b2 - b1) * w - slack
            if t2 - t1 < floor:
                viol("interval", host=host, gap=round(t2 - t1, 3),
                     floor=round(floor, 3), b1=b1, b2=b2)
        # 3. crawl-delay host: consecutive fetches ≥ delay − window
        if host == DELAY_HOST:
            for (t1, _p1, _b1), (t2, _p2, _b2) in zip(rows, rows[1:]):
                if t2 - t1 < CRAWL_DELAY_S - w:
                    viol("crawl_delay", gap=round(t2 - t1, 3),
                         floor=round(CRAWL_DELAY_S - w, 3))
        # 4. Retry-After: next request ≥ ceil(r/w) batches and
        #    ≥ r − window wall seconds after each served 429
        if host == RETRY_HOST:
            block = math.ceil(RETRY_AFTER_S / w)
            for i, (t1, p1, b1) in enumerate(rows[:-1]):
                status = srv.pages.get(f"http://{host}{p1}",
                                       (200, "", None))[0]
                if status != 429 or b1 is None:
                    continue
                # the block applies from the NEXT batch on — requests
                # already in flight in the 429's own window are the
                # quota burst, not a violation
                nxt = next(((t2, b2) for t2, _p2, b2 in rows[i + 1:]
                            if b2 is not None and b2 > b1), None)
                if nxt is None:
                    continue
                t2, b2 = nxt
                if b2 - b1 < 1 + block:
                    viol("retry_after_batches", b1=b1, b2=b2,
                         min_gap=1 + block)
                if t2 - t1 < RETRY_AFTER_S - w:
                    viol("retry_after_wall", gap=round(t2 - t1, 3),
                         floor=round(RETRY_AFTER_S - w, 3))
        # 5. breaker host: probe-batch gaps are 1 (inside budget) or
        #    ≥ 1 + cooldown
        if host == DEAD_HOST:
            probe_batches = sorted({b for _t, _p, b in rows
                                    if b is not None})
            for b1, b2 in zip(probe_batches, probe_batches[1:]):
                gap = b2 - b1
                if gap != 1 and gap < 1 + COOLDOWN_BATCHES:
                    viol("breaker_gap", b1=b1, b2=b2, gap=gap,
                         expected=f"1 or >={1 + COOLDOWN_BATCHES}")

    report = dict(
        requests=n_requests,
        hosts=len(by_host),
        batches=len(handles.metrics),
        wall_s=round(wall, 1),
        req_per_sec=round(n_requests / wall, 1),
        window_ms=window_ms,
        quota_per_host=quota,
        dead_host_probes=len(by_host.get(DEAD_HOST, [])),
        delay_host_fetches=len(by_host.get(DELAY_HOST, [])),
        retry_host_fetches=len(by_host.get(RETRY_HOST, [])),
        n_429_served=sum(
            1 for _t, h, p in srv.log
            if h == RETRY_HOST
            and srv.pages.get(f"http://{h}{p}", (0, "", None))[0] == 429),
        violations=len(violations),
        min_requests_met=n_requests >= min_requests,
    )
    return report, violations


def main():
    import bench
    import __spark_entry__ as entry_mod

    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._ensure_pkg(spark)  # executor imports from any cwd
    report, violations = soak(spark)
    report["violation_detail"] = violations[:20]
    print(json.dumps(report), flush=True)
    spark.stop()
    if violations or not report["min_requests_met"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
