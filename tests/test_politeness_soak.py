"""Live-HTTP politeness long-soak (slow, ~4-6 min): ≥10k real socket
requests through the wall-clock-paced streaming drain with the circuit
breaker, Retry-After back-pressure, and robots Crawl-delay ALL active;
the SERVER's own request log is the ground truth the floors are
checked against (scripts/politeness_soak.py documents each floor).

Plus the regression pin for the live-mode seam fixed alongside: with
ignore_robots=True (the colly-matching default) the engine must STILL
lazily fetch robots.txt when respect_crawl_delay is on — Crawl-delay
lives in robots.txt, so before the fix an ignore-robots live crawl
silently dropped every advertised delay (plans/crawler.py
_lazy_robots)."""

import importlib.util
import os
import sys

_SOAK = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "politeness_soak.py")
_spec = importlib.util.spec_from_file_location("politeness_soak", _SOAK)
soak_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("politeness_soak", soak_mod)
_spec.loader.exec_module(soak_mod)


def test_soak_10k_requests_no_floor_violation(spark):
    """The headline soak: ≥10k live requests, every politeness floor
    holds, every machinery arm demonstrably exercised (429s served,
    breaker probed in budget bursts, Crawl-delay host throttled)."""
    report, violations = soak_mod.soak(
        spark, max_batches=24, window_ms=1500, min_requests=10_000,
        n_hosts=96, pages_per_host=150)
    assert violations == [], violations[:10]
    assert report["min_requests_met"], report
    assert report["requests"] >= 10_000
    # each arm really fired
    assert report["n_429_served"] >= 1
    assert report["dead_host_probes"] >= soak_mod.ERROR_BUDGET * 2
    assert report["delay_host_fetches"] >= 2
    # crawl-delay host: at most one fetch per ceil(3s/1.5s)=2 batches
    # (+1 for the fencepost)
    assert report["delay_host_fetches"] <= report["batches"] // 2 + 1


def test_crawl_delay_survives_ignore_robots(spark):
    """The fixed seam, end-to-end: ignore_robots=True + respect_crawl
    _delay=True still fetches robots lazily and throttles the
    Crawl-delay host — before the fix this ran at full quota."""
    report, violations = soak_mod.soak(
        spark, max_batches=10, window_ms=1500, min_requests=50,
        ignore_robots=True, n_hosts=4, pages_per_host=40)
    assert violations == [], violations[:10]
    assert report["delay_host_fetches"] >= 2
    assert report["delay_host_fetches"] <= report["batches"] // 2 + 1
