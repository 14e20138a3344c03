"""CLI surface (cmd/colly/colly.go re-expressed): scaffold generation
and the end-to-end crawl subcommand (which is also the spark-submit
--py-files entry path — the subprocess runs from a foreign cwd, so the
executor-side package shipping is exercised too)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_new_scaffold_compiles(tmp_path):
    from colly_spark.__main__ import main

    out = tmp_path / "scraper.py"
    rc = main(["new", str(out), "--callbacks", "html,request,response,error",
               "--hosts", "a.test,b*.test"])
    assert rc == 0
    text = out.read_text()
    compile(text, str(out), "exec")  # must be valid Python
    assert "allowed_domain_globs=('a.test', 'b*.test',)" in text
    assert "OnHTML" in text and "OnError" in text


def test_new_scaffold_stdout(capsys):
    from colly_spark.__main__ import main

    assert main(["new"]) == 0
    text = capsys.readouterr().out
    compile(text, "<scaffold>", "exec")


def test_crawl_subcommand_end_to_end(tmp_path):
    """Fixture crawl from a foreign cwd: summary JSON printed, sinks
    written, and the trace re-readable with the expected columns."""
    env = dict(os.environ, PYTHONPATH=_REPO)
    out = subprocess.run(
        [sys.executable, "-m", "colly_spark", "crawl", "http://d00.test/",
         "--fixture-corpus", "--state-dir", str(tmp_path / "state"),
         "--out", str(tmp_path / "out"), "--max-depth", "2",
         "--cpus", "4", "--shuffle-partitions", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 0 and summary["batches"] >= 2
    import pyarrow.parquet as pq
    import glob as _glob
    files = _glob.glob(str(tmp_path / "out" / "trace" / "*.parquet"))
    assert files
    cols = set(pq.read_table(files[0]).column_names)
    assert {"batch", "seq", "url", "status", "method"} <= cols


def test_crawl_requests_jsonl(tmp_path):
    """--requests: serialized-request JSONL (queue wire format) seeds
    the frontier with method/body/depth preserved."""
    from colly_spark.functions.requests import marshal_request

    reqfile = tmp_path / "reqs.jsonl"
    reqfile.write_bytes(
        marshal_request("http://d00.test/", depth=2) + b"\n"
        + marshal_request("http://d01.test/submit", "POST", b"q=1") + b"\n")
    env = dict(os.environ, PYTHONPATH=_REPO)
    out = subprocess.run(
        [sys.executable, "-m", "colly_spark", "crawl",
         "--requests", str(reqfile),
         "--fixture-corpus", "--state-dir", str(tmp_path / "state"),
         "--out", str(tmp_path / "out"), "--max-depth", "2",
         "--cpus", "4", "--shuffle-partitions", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    import pyarrow.parquet as pq
    import glob as _glob
    files = _glob.glob(str(tmp_path / "out" / "trace" / "*.parquet"))
    assert files
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    # the depth-2 GET seed crawls exactly itself (its links exceed
    # max_depth); the POST seed appears with its method
    d00 = tbl[tbl.url.str.startswith("http://d00.test")]
    assert (d00.depth == 2).all() and len(d00) == 1
    assert (tbl[tbl.url.str.contains("d01.test")].method == "POST").all()


def test_crawl_forget_campaign_cli(tmp_path):
    """--seen-filter cuckoo crawl, then a --forget revisit campaign
    over the same state dir: the due URL refetches (fetched ≥ 1),
    already-marked seeds stay deduped."""
    env = dict(os.environ, PYTHONPATH=_REPO)
    state = str(tmp_path / "state")
    base = [sys.executable, "-m", "colly_spark", "crawl",
            "--fixture-corpus", "--state-dir", state,
            "--max-depth", "2", "--cpus", "4",
            "--shuffle-partitions", "8", "--seen-filter", "cuckoo"]
    out = subprocess.run(base + ["http://d00.test/"],
                         capture_output=True, text=True,
                         cwd=str(tmp_path), env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    first = json.loads(out.stdout.strip().splitlines()[-1])
    due = str(tmp_path / "due.txt")
    with open(due, "w") as f:
        f.write("http://d00.test/\n")
    out2 = subprocess.run(base + ["http://d00.test/", "--forget", due],
                          capture_output=True, text=True,
                          cwd=str(tmp_path), env=env, timeout=600)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "forgot 1 visited marks" in out2.stderr
    second = json.loads(out2.stdout.strip().splitlines()[-1])
    # the metrics history restores across resume, so the campaign's
    # summary is the first crawl plus EXACTLY the one forgotten URL —
    # its links are still marked and stay deduped
    assert first["fetched"] > 1
    assert second["fetched"] == first["fetched"] + 1


def test_crawl_sitemap_seeds_and_revalidate_flags(tmp_path):
    """--sitemap-seeds expands the protocol tree into seeds (with
    priorities driving the frontier), --cache-revalidate turns the
    conditional-refresh machinery on (implies --cache), and
    --respect-crawl-delay parses cleanly — a depth-1 crawl fetches
    exactly the discovered leaf set."""
    env = dict(os.environ, PYTHONPATH=_REPO)
    out = subprocess.run(
        [sys.executable, "-m", "colly_spark", "crawl",
         "--fixture-corpus", "--state-dir", str(tmp_path / "state"),
         "--out", str(tmp_path / "out"), "--max-depth", "1",
         "--sitemap-seeds", "http://d00.test/sitemap_index.xml",
         "--cache-revalidate", "--respect-crawl-delay",
         "--cpus", "4", "--shuffle-partitions", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "sitemap discovery:" in out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 0
    import glob as _glob

    import pyarrow.parquet as pq
    files = _glob.glob(str(tmp_path / "out" / "trace" / "*.parquet"))
    urls = set()
    for f in files:
        urls.update(pq.read_table(f, columns=["url"])
                    .column("url").to_pylist())
    # depth-1 = the seeds only; every fetched URL came from the sitemap
    assert urls and all(u.startswith("http://d00.test/") for u in urls)
