"""Web debugger over a crawl's committed state — the batch-engine
analogue of the reference's live WebUI (logger.go:160-177 NewWebLogger
serves webLoggerPage at 127.0.0.1:7676 with a /status JSON feed,
logger.go:70-127, 230-237).

The reference's debugger tails an in-process event buffer because its
crawl lives in one process. Here the crawl's ground truth is the
committed sink directories (the Iceberg-snapshot model), so the
dashboard is a READER: every /status poll reflects exactly the
committed state — it can watch a crawl driven by a different process,
and it works after the fact on any state dir. The polls are
driver-side pyarrow scans of the newest delta files (the same
no-Spark-job discipline as CrawlHandles.has_visited/cookies), so
polling never competes with the crawl for executors.

``render_dashboard`` produces a self-contained static HTML snapshot
(no CDN assets — the sandbox and most cluster edge nodes are offline;
the reference page pulls jQuery/semantic-ui from CDNs);
``serve_dashboard`` starts the reference-shaped live server: ``/``
returns the page whose script polls ``/status`` once a second
(webLoggerPage's fetchStatus loop), ``/status`` returns the JSON
feed."""

from __future__ import annotations

import glob
import html as _html
import json
import os
import threading

_PAGE = """<!DOCTYPE html>
<html>
<head>
<title>colly-spark WebDebugger</title>
<style>
 body {{ font-family: sans-serif; margin: 1.5em; background: #fafafa; }}
 h1 {{ font-size: 1.2em; }} h2 {{ font-size: 1em; margin-bottom: .3em; }}
 .cols {{ display: flex; gap: 2em; align-items: flex-start; }}
 .col {{ flex: 1; min-width: 0; }}
 table {{ border-collapse: collapse; font-size: .85em; width: 100%; }}
 th, td {{ border: 1px solid #ddd; padding: 2px 6px; text-align: right;
           white-space: nowrap; overflow: hidden; text-overflow: ellipsis;
           max-width: 28em; }}
 td.u {{ text-align: left; }}
 .warn {{ color: #a00; }}
 #summary {{ background: #222; color: #eee; padding: .5em 1em; }}
</style>
</head>
<body>
<div id="summary">{summary}</div>
<h1>colly-spark WebDebugger</h1>
<div class="cols">
 <div class="col">
  <h2>Batches <span id="batch_count">({n_batches})</span></h2>
  <table id="batches"><thead><tr>
   <th>batch</th><th>submitted</th><th>admitted</th><th>fetched</th>
   <th>deferred</th><th>errors</th><th>new links</th>
  </tr></thead><tbody>{batch_rows}</tbody></table>
 </div>
 <div class="col">
  <h2>Finished Requests <span id="request_log_count">({n_requests})</span></h2>
  <table id="request_log"><thead><tr>
   <th>url</th><th>status</th><th>ms</th><th>batch</th>
  </tr></thead><tbody>{request_rows}</tbody></table>
  <h2>Errors <span id="error_count">({n_errors})</span></h2>
  <table id="errors"><thead><tr>
   <th>url</th><th>kind</th><th>batch</th>
  </tr></thead><tbody>{error_rows}</tbody></table>
 </div>
</div>
{script}
</body>
</html>
"""

# the live page's poll loop — webLoggerPage's fetchStatus
# (logger.go:104-120), 1 s cadence, rendered without jQuery
_SCRIPT = """<script>
function row(cells, cls) {
  return '<tr>' + cells.map(function (c, i) {
    return '<td class="' + (i ? '' : 'u') + (cls || '') + '">' + c + '</td>';
  }).join('') + '</tr>';
}
function esc(s) {
  var d = document.createElement('i'); d.textContent = String(s);
  return d.innerHTML;
}
function fetchStatus() {
  fetch('/status').then(function (r) { return r.json(); }).then(function (d) {
    document.getElementById('summary').textContent = d.summary;
    document.getElementById('batch_count').textContent = '(' + d.metrics.length + ')';
    document.getElementById('request_log_count').textContent = '(' + d.request_count + ')';
    document.getElementById('error_count').textContent = '(' + d.error_count + ')';
    document.querySelector('#batches tbody').innerHTML = d.metrics.map(function (m) {
      return row([m.batch, m.submitted, m.admitted, m.fetched,
                  m.deferred, m.errors, m.new_links]);
    }).join('');
    document.querySelector('#request_log tbody').innerHTML =
      d.request_log.map(function (r) {
        return row([esc(r.url), r.status, r.ms, r.batch]);
      }).join('');
    document.querySelector('#errors tbody').innerHTML =
      d.errors.map(function (r) {
        return row([esc(r.url), esc(r.kind), r.batch], ' warn');
      }).join('');
    setTimeout(fetchStatus, 1000);
  });
}
fetchStatus();
</script>"""


def _tail_parquet(out_dir: str, name: str, columns: list, limit: int) -> list:
    """Last ``limit`` rows of a sink, newest delta dirs first — a
    driver-side pyarrow scan, no Spark job."""
    import pyarrow.parquet as pq

    rows: list = []
    dirs = sorted(glob.glob(os.path.join(out_dir, name, "batch_*")),
                  reverse=True)
    for d in dirs:
        if len(rows) >= limit:
            break
        chunk: list = []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            chunk.extend(pq.read_table(f, columns=columns).to_pylist())
        # within a batch, newest-last on disk; feed shows newest first
        chunk.sort(key=lambda r: r.get("seq") or 0, reverse=True)
        rows.extend(chunk)
    return rows[:limit]


def _count_rows(out_dir: str, name: str) -> int:
    import pyarrow.parquet as pq

    n = 0
    for d in glob.glob(os.path.join(out_dir, name, "batch_*")):
        for f in glob.glob(os.path.join(d, "*.parquet")):
            n += pq.ParquetFile(f).metadata.num_rows
    return n


def status_payload(handles, limit: int = 100) -> dict:
    """The /status JSON (statusHandler logger.go:230-237): summary
    line, per-batch metrics, newest-first request log and error feed.
    Pure driver-side reads of the committed sinks."""
    trace = _tail_parquet(
        handles.out_dir, "trace",
        ["batch", "seq", "url", "status", "connect_ms", "ttfb_ms"], limit)
    errors = _tail_parquet(
        handles.out_dir, "errors", ["batch", "seq", "url", "kind"], limit)
    return dict(
        summary=handles.summary(),
        metrics=[{k: m.get(k) for k in
                  ("batch", "submitted", "admitted", "fetched",
                   "deferred", "errors", "new_links")}
                 for m in handles.metrics],
        request_count=_count_rows(handles.out_dir, "trace"),
        error_count=_count_rows(handles.out_dir, "errors"),
        request_log=[dict(url=r["url"], status=r["status"],
                          ms=round((r["connect_ms"] or 0)
                                   + (r["ttfb_ms"] or 0), 1),
                          batch=r["batch"]) for r in trace],
        errors=[dict(url=r["url"], kind=r["kind"], batch=r["batch"])
                for r in errors],
    )


def _render(payload: dict, live: bool) -> str:
    e = _html.escape
    batch_rows = "".join(
        "<tr>" + "".join(f"<td>{m[k]}</td>" for k in
                         ("batch", "submitted", "admitted", "fetched",
                          "deferred", "errors", "new_links")) + "</tr>"
        for m in payload["metrics"])
    request_rows = "".join(
        f'<tr><td class="u">{e(str(r["url"]))}</td><td>{r["status"]}</td>'
        f'<td>{r["ms"]}</td><td>{r["batch"]}</td></tr>'
        for r in payload["request_log"])
    error_rows = "".join(
        f'<tr><td class="u warn">{e(str(r["url"]))}</td>'
        f'<td class="warn">{e(str(r["kind"]))}</td><td>{r["batch"]}</td></tr>'
        for r in payload["errors"])
    return _PAGE.format(
        summary=e(payload["summary"]), n_batches=len(payload["metrics"]),
        n_requests=payload["request_count"], n_errors=payload["error_count"],
        batch_rows=batch_rows, request_rows=request_rows,
        error_rows=error_rows, script=_SCRIPT if live else "")


def render_dashboard(handles, limit: int = 100) -> str:
    """Self-contained static HTML snapshot of the crawl (no JS poll,
    no external assets) — write it next to the state dir or into a CI
    artifact."""
    return _render(status_payload(handles, limit), live=False)


def serve_dashboard(handles, address: str = "127.0.0.1:7676",
                    limit: int = 100):
    """Start the live debugger (NewWebLogger logger.go:160-177): ``/``
    serves the page, ``/status`` the JSON feed, polled by the page
    every second. Runs a stdlib ThreadingHTTPServer on a daemon
    thread; returns the server (``.server_address`` for the bound
    port — pass port 0 to let the OS pick, ``.shutdown()`` to stop).
    Reads committed state only, so it can watch a crawl in progress
    from outside the driver process."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    host, port = address.rsplit(":", 1)

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.split("?")[0] == "/status":
                body = json.dumps(status_payload(handles, limit)).encode()
                ctype = "application/json"
            else:
                body = _render(status_payload(handles, limit),
                               live=True).encode()
                ctype = "text/html; charset=utf-8"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet — the crawl owns stdout
            pass

    srv = ThreadingHTTPServer((host, int(port)), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
