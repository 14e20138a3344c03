#!/usr/bin/env python
"""Lap-level profile of the LIVE politeness-bounded crawl path — the
pinned A/B lever for the per-batch fixed-overhead work (the
politeness-bounded regime's bottleneck: a wall-clock window only
paces honestly when the batch cost fits inside it).

Runs the soak corpus (scripts/politeness_soak.py's server + config:
breaker + Retry-After + Crawl-delay all active) through the plain
driver-loop drain and prints each batch's t_* laps plus the
steady-state medians. Round-5 baseline on this box (48 hosts, ~290
admitted/batch, local[32]): total ≈ 11.9 s median after the
crawl-delay-table cache (was 16.4 s), split t_sinks ≈ 4.3 s /
t_fetch ≈ 3.4 s / t_admit ≈ 2.7 s / t_commit ≈ 0.8 s.

Usage: python scripts/live_profile.py
Env:  LP_HOSTS (48), LP_PAGES_PER_HOST (150), LP_BATCHES (10),
      SPARK_GRAFT_CPUS (bench default).
Prints one JSON line with per-batch laps + steady-state medians.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import tempfile
import threading
from http.server import ThreadingHTTPServer

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

N_HOSTS = int(os.environ.get("LP_HOSTS", "48"))
PAGES = int(os.environ.get("LP_PAGES_PER_HOST", "150"))
BATCHES = int(os.environ.get("LP_BATCHES", "10"))


def main():
    spec = importlib.util.spec_from_file_location(
        "politeness_soak", os.path.join(_HERE, "politeness_soak.py"))
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)

    import bench
    import __spark_entry__ as entry_mod
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.plans.crawler import Crawler
    from colly_spark.sources.live_http import HttpFetchSource

    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._ensure_pkg(spark)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), sm._SoakHandler)
    srv.daemon_threads = True
    srv.pages = sm.build_pages(N_HOSTS, PAGES)
    srv.log = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = f"127.0.0.1:{srv.server_address[1]}"

    cfg = CrawlConfig(
        max_depth=0, ignore_robots=False, batch_window_ms=1500,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=230,
                               parallelism=1),),
        respect_crawl_delay=True, respect_retry_after=True,
        host_error_budget=sm.ERROR_BUDGET,
        host_cooldown_batches=sm.COOLDOWN_BATCHES)
    seeds = ([f"http://{sm._normal_host(h)}/p0" for h in range(N_HOSTS)]
             + [f"http://{sm.DELAY_HOST}/p0", f"http://{sm.RETRY_HOST}/p0"]
             + [f"http://{sm.DEAD_HOST}/p{i}" for i in range(30)])
    src = HttpFetchSource(cfg, connect_addr=addr, timeout_s=20.0)
    state = tempfile.mkdtemp(prefix="colly_liveprof_")
    handles = Crawler(spark, None, cfg, state, bloom_threshold_rows=0,
                      fetch_source=src).run(seeds, max_batches=BATCHES)
    srv.shutdown()
    srv.server_close()

    per_batch = []
    for m in handles.metrics:
        laps = {k: round(v, 2) for k, v in m.items() if k.startswith("t_")}
        sinks = {k: round(v, 2) for k, v in m.items()
                 if k.startswith("sink_s_")}
        per_batch.append(dict(batch=m["batch"], admitted=m.get("admitted"),
                              total=round(sum(laps.values()), 2),
                              **laps, **sinks))
    steady = per_batch[2:] or per_batch  # skip warm ramp
    lap_keys = sorted({k for b in steady for k in b if k.startswith("t_")})
    medians = {k: round(statistics.median(b.get(k, 0.0) for b in steady), 2)
               for k in ("total", *lap_keys)}
    print(json.dumps(dict(hosts=N_HOSTS, batches=len(per_batch),
                          steady_medians=medians, per_batch=per_batch)),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
