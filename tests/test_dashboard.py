"""Web debugger (plans/dashboard.py) — the batch analogue of the
reference's WebUI (logger.go:160-177 / webLoggerPage / statusHandler).
Pins: the /status JSON reflects the committed sinks exactly (counts
equal the Spark-side reads), the static snapshot embeds the same data,
the live server answers / and /status over a real socket, and the
feeds honor the newest-first limit."""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from colly_spark.config import CrawlConfig
from colly_spark.plans.crawler import Crawler
from colly_spark.plans.dashboard import (render_dashboard, serve_dashboard,
                                         status_payload)

SEEDS = ["http://d00.test/", "http://d01.test/", "http://nosuch.test/x"]


@pytest.fixture(scope="module")
def handles(spark, corpus_spark):
    import tempfile

    state = tempfile.mkdtemp(prefix="colly_dash_")
    return Crawler(spark, corpus_spark,
                   CrawlConfig(max_depth=2, ignore_robots=True),
                   state).run(SEEDS)


def test_status_payload_matches_sinks(handles):
    p = status_payload(handles, limit=10_000)
    assert p["summary"] == handles.summary()
    assert p["request_count"] == handles.trace().count() > 0
    assert p["error_count"] == handles.errors().count() > 0
    assert len(p["metrics"]) == len(handles.metrics)
    spark_urls = {(r["batch"], r["seq"], r["url"], r["status"])
                  for r in handles.trace().collect()}
    feed_urls = {(r["batch"], None, r["url"], r["status"])
                 for r in p["request_log"]}
    # seq isn't in the feed — compare on the rest
    assert {(b, u, s) for b, _, u, s in feed_urls} \
        == {(b, u, s) for b, _, u, s in spark_urls}
    kinds = {r["kind"] for r in p["errors"]}
    assert kinds <= {r["kind"] for r in handles.errors().collect()} and kinds


def test_feed_limit_newest_first(handles):
    full = status_payload(handles, limit=10_000)
    lim = status_payload(handles, limit=3)
    assert len(lim["request_log"]) == 3
    # counts are unaffected by the feed limit
    assert lim["request_count"] == full["request_count"]
    # newest-first: limited feed comes from the highest batches
    max_b = max(r["batch"] for r in full["request_log"])
    assert all(r["batch"] >= max_b - 1 for r in lim["request_log"])


def test_static_snapshot_embeds_data(handles):
    page = render_dashboard(handles)
    assert "colly-spark WebDebugger" in page
    assert handles.summary().split("|")[0].strip() in page
    some_url = status_payload(handles, limit=1)["request_log"][0]["url"]
    assert some_url in page
    assert "fetchStatus" not in page  # static: no poll script


def test_post_hoc_open_without_spark(handles):
    """CrawlHandles.open reads a state dir written by another engine —
    no SparkSession — and the dashboard over it equals the live one
    (committed metrics history + pyarrow sink reads only)."""
    from colly_spark.plans.crawler import CrawlHandles

    state_dir = os.path.dirname(handles.out_dir)
    reopened = CrawlHandles.open(state_dir)  # spark=None
    assert reopened.spark is None
    assert reopened.summary() == handles.summary()
    assert [m["batch"] for m in reopened.metrics] \
        == [m["batch"] for m in handles.metrics]
    assert [m["fetched"] for m in reopened.metrics] \
        == [m["fetched"] for m in handles.metrics]
    assert status_payload(reopened, limit=50) == status_payload(handles, limit=50)


def test_cli_dashboard_snapshot(handles, tmp_path):
    """`python -m colly_spark dashboard --html` writes the snapshot
    from a fresh process with no Spark session."""
    import subprocess
    import sys as _sys

    state_dir = os.path.dirname(handles.out_dir)
    out_html = str(tmp_path / "dash.html")
    r = subprocess.run(
        [_sys.executable, "-m", "colly_spark", "dashboard",
         "--state-dir", state_dir, "--html", out_html],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["summary"] == handles.summary()
    page = open(out_html).read()
    assert "colly-spark WebDebugger" in page


def test_live_server_roundtrip(handles):
    srv = serve_dashboard(handles, address="127.0.0.1:0")
    try:
        host, port = srv.server_address[:2]
        with urllib.request.urlopen(f"http://{host}:{port}/status") as r:
            data = json.loads(r.read())
        assert data["summary"] == handles.summary()
        assert data["request_count"] == handles.trace().count()
        with urllib.request.urlopen(f"http://{host}:{port}/") as r:
            page = r.read().decode()
        assert "fetchStatus" in page and "colly-spark WebDebugger" in page
    finally:
        srv.shutdown()
