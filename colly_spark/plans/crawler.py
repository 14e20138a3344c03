"""The distributed crawl engine — micro-batched frontier drain.

This is the PySpark-native equivalent of the reference's whole crawl
core (scrape pipeline colly.go:589-713, requestCheck colly.go:715-756,
queue drain queue/queue.go:113-208, LimitRule http_backend.go:53-211),
re-expressed as the SURVEY.md §3.3 lifecycle:

    seed frontier ──▶ per-micro-batch DAG:
      canonicalize (Arrow UDF, map-side)
      → filter chain F1-F5 (pure Catalyst)
      → robots gate (broadcast join + Arrow UDF)
      → URL-seen check-and-mark D1 (within-batch window claim
        → co-partitioned Bloom probe → exact anti-join backstop
        → mark BEFORE fetch: visited append + Bloom update)
      → politeness quota window P1-P2 (partitionBy(host) FIFO)
      → "fetch" = join against the corpus table (sandbox stand-in for
        the async-HTTP applyInPandas stage; no network here)
      → redirect-hop loop D2-D3 (bounded iterative join; every hop
        re-runs filters + check-and-mark on the target)
      → round-robin repartition (kills hot-domain skew) → extraction
        E1 (Arrow UDF) → posexplode links
      → dense discovery-seq assignment (scalable two-phase rank)
      → new links union into next frontier; images validated E5
      → sinks: trace / errors / images / metrics (+ state snapshots)
    … repeat until frontier ∧ pending empty (P5 termination).

Crawl ordering contract (parity with the pure-Python oracle
simulator, oracle/simulator.py): per-domain FIFO by discovery ``seq``;
batch boundaries = politeness windows; discovered links get dense seqs
in (parent_seq, link_index) order. Redirect-target claims between two
chains in the same batch are resolved by (hop, seq) — chains that do
not intersect (the corpus/test case) are order-independent.

State & resume (north_rule): every batch commits
  visited deltas (parquet, bucketed by pmod(url_hash, P)),
  Bloom segment files, frontier/pending snapshots, sink partitions,
then a MANIFEST (last committed batch, next_seq) — written last, so a
kill at any point resumes from the previous manifest and recomputes
the half-written batch *deterministically*, overwriting its partitions
idempotently → byte-identical continuation. Bloom segments are rebuilt
from the exact visited table on resume (in deployment they'd live in
an Iceberg blob table with snapshot isolation; the rebuild is the
sandbox equivalent). Parquet dirs stand in for Iceberg tables —
the layout (bucket-by-hash, append-only deltas, manifest commit point)
is the Iceberg design shape.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from functools import reduce

import pandas as pd

from colly_spark import config as cfgmod
from colly_spark.config import CrawlConfig
from colly_spark.functions.udfs import canon_host_hash_udf, hostname_udf
from colly_spark.operators import cuckoo, politeness, seen
from colly_spark.operators.robots import robots_allowed_udf
from colly_spark.plans.util import dense_seq

REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job."""
    import glob as _glob

    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in _glob.glob(os.path.join(path, "*.parquet")))


def _dir_lineage(path: str) -> dict:
    """Per-partition lineage of one committed state dir: each parquet
    part file (one file = one write partition) with its footer row
    count, plus the batch that produced the dir (second field of the
    ``batch_NNNNNN_tag`` / ``compact_NNNNNN_LN`` naming scheme).
    Driver-side pyarrow footer reads — no Spark job."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = {os.path.basename(f): pq.ParquetFile(f).metadata.num_rows
             for f in sorted(_glob.glob(os.path.join(path, "*.parquet")))}
    return {"batch": int(os.path.basename(path).split("_")[1]),
            "rows": sum(files.values()), "files": files}


def _schemas():
    from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, DoubleType,
                                   IntegerType, LongType, StringType, StructField,
                                   StructType)

    frontier = StructType([
        StructField("seq", LongType()),
        StructField("url", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
        StructField("body_req", BinaryType()),
        StructField("referer", StringType()),
        # generic per-request Context (context.go:22-88) as
        # deterministic JSON; children inherit it verbatim
        StructField("ctx", StringType()),
        # Request.Retry rows (request.go:190-198): bypass
        # check-and-mark (checkRevisit=false) + attempt counter
        StructField("no_revisit", BooleanType()),
        StructField("tries", IntegerType()),
    ])
    pending = StructType([
        StructField("seq", LongType()),
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
        StructField("body_req", BinaryType()),
        StructField("url_hash", LongType()),
        StructField("referer", StringType()),
        StructField("ctx", StringType()),
        StructField("tries", IntegerType()),
    ])
    visited = StructType([StructField("url_hash", LongType())])
    error = StructType([
        StructField("batch", IntegerType()),
        StructField("seq", LongType()),
        StructField("url", StringType()),
        StructField("kind", StringType()),
    ])
    trace = StructType([
        StructField("batch", IntegerType()),
        StructField("seq", LongType()),
        StructField("url", StringType()),
        StructField("final_url", StringType()),
        StructField("depth", IntegerType()),
        StructField("host", StringType()),
        StructField("status", IntegerType()),
        StructField("method", StringType()),
        StructField("referer", StringType()),
        StructField("connect_ms", DoubleType()),
        StructField("ttfb_ms", DoubleType()),
        StructField("ua", StringType()),
        StructField("proxy", StringType()),
        StructField("ctx", StringType()),
    ])
    images = StructType([
        StructField("batch", IntegerType()),
        StructField("page_url", StringType()),
        StructField("image_url", StringType()),
        StructField("image_id", StringType()),
        StructField("caption", StringType()),
        StructField("ok", BooleanType()),
        StructField("psnr_db", DoubleType()),
    ])
    done = StructType([
        StructField("seq", LongType()),
        StructField("url", StringType()),
        StructField("final_url", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("image_id", StringType()),
        StructField("links", ArrayType(StringType())),
        StructField("imgs", ArrayType(StructType([
            StructField("url", StringType()),
            StructField("caption", StringType()),
        ]))),
        StructField("img_body", BinaryType()),
        StructField("req_hash", LongType()),
        StructField("from_cache", BooleanType()),
        StructField("referer", StringType()),
        StructField("set_cookie", StringType()),
        StructField("cache_max_age", IntegerType()),
        StructField("retry_after", IntegerType()),
        # response validators (cache_revalidate stores them so a
        # stale entry can go out conditional next time; ETag wins,
        # Last-Modified is the no-ETag-server fallback)
        StructField("etag", StringType()),
        StructField("last_modified", StringType()),
        StructField("ctx", StringType()),
        # request body + attempt counter ride through to done so a
        # retry can be re-submitted with the same parameters
        StructField("body_req", BinaryType()),
        StructField("tries", IntegerType()),
    ])
    hosthealth = StructType([
        StructField("host", StringType()),
        StructField("consec", IntegerType()),
        StructField("blocked_until", IntegerType()),
    ])
    return dict(done=done, frontier=frontier, pending=pending, visited=visited,
                error=error, trace=trace, images=images,
                hosthealth=hosthealth)


def _count_nonhttp_errors(errors_dir: str) -> int:
    """Driver-side count over the written error files (one thin column
    via pyarrow — replaces a whole Spark count job re-executing the
    fetch-error plan)."""
    import glob as _glob

    import pyarrow.parquet as pq

    n = 0
    for f in _glob.glob(os.path.join(errors_dir, "*.parquet")):
        kind = pq.read_table(f, columns=["kind"]).column("kind").to_pylist()
        n += sum(1 for k in kind if k is not None and not k.startswith("http_"))
    return n


def _read_metrics(out_dir: str, as_of=None) -> list:
    """Committed per-batch metrics dicts (out/metrics_N.json, one per
    batch), sorted by batch. ``as_of`` bounds the batch index the same
    way the sink readers do."""
    import glob as _glob

    out = []
    for p in sorted(_glob.glob(os.path.join(out_dir, "metrics_*.json"))):
        b = int(os.path.basename(p).split("_")[1].split(".")[0])
        if as_of is not None and b > as_of:
            continue
        with open(p) as f:
            out.extend(json.load(f))
    return out


@dataclass
class CrawlHandles:
    """Lazy readers over the crawl's sink directories.

    Every reader takes an optional ``as_of`` batch index — the
    time-travel read of the Iceberg-snapshot model: each micro-batch
    appends immutable ``batch_N[_tag]`` delta directories and the
    MANIFEST commit point advances last, so "the crawl as of batch b"
    is exactly the union of deltas with N ≤ b. ``snapshots()`` lists
    the readable batch indices (Iceberg's snapshot log analogue), and
    ``since`` on the readers is the incremental scan between two
    snapshots — the shape of "export only what was fetched since the
    last training snapshot" without re-reading history."""
    spark: object
    out_dir: str
    metrics: list = field(default_factory=list)

    @classmethod
    def open(cls, state_dir: str, spark=None) -> "CrawlHandles":
        """Open the committed state of ANY state dir — including one
        written by a different (or dead) process: post-hoc analysis,
        the dashboard CLI, a monitor watching a live crawl. Metrics
        come from the committed out/metrics_N.json files, bounded by
        the manifest commit point. ``spark`` may stay None for the
        driver-side readers (summary, metrics, has_visited, cookies,
        plans.dashboard); the DataFrame readers need a session."""
        as_of = None
        man = os.path.join(state_dir, "MANIFEST.json")
        if os.path.exists(man):
            with open(man) as f:
                as_of = json.load(f)["batch"]
        out_dir = os.path.join(state_dir, "out")
        return cls(spark, out_dir, metrics=_read_metrics(out_dir, as_of))

    @staticmethod
    def _batch_of(path: str) -> int:
        # delta dirs are batch_N (sinks) or batch_N_<tag> (visited/
        # cache/cookie marks, one per admission/redirect-hop phase);
        # compacted state bases are compact_N_L<level> where N is the
        # highest batch folded in (so as_of ≥ N covers them exactly)
        return int(os.path.basename(path).split("_")[1])

    def _paths(self, name, as_of=None, since=None):
        import glob as _glob
        paths = sorted(
            _glob.glob(os.path.join(self.out_dir, name, "batch_*"))
            + _glob.glob(os.path.join(self.out_dir, name, "compact_*")))
        if as_of is not None:
            paths = [p for p in paths if self._batch_of(p) <= as_of]
        if since is not None:
            # incremental scan (Iceberg's incremental-append read):
            # exactly the deltas committed AFTER snapshot `since`.
            # Only exact over append-only history — a compaction base
            # whose fold point is inside the range mixes rows from
            # both sides of `since` (sinks are never compacted, so
            # this only bites state stores like visited)
            folded = [p for p in paths
                      if os.path.basename(p).startswith("compact_")
                      and self._batch_of(p) > since]
            if folded:
                raise ValueError(
                    f"incremental read since batch {since} expired: "
                    f"compaction folded the range into "
                    f"{[os.path.basename(p) for p in folded]}")
            paths = [p for p in paths if self._batch_of(p) > since]
        return paths

    def _read(self, name, schema_key, as_of=None, since=None):
        paths = self._paths(name, as_of, since)
        if not paths:
            return self.spark.createDataFrame([], _schemas()[schema_key])
        return self.spark.read.parquet(*paths)

    def snapshots(self) -> list:
        return sorted({self._batch_of(p) for p in self._paths("trace")})

    def trace(self, as_of=None, since=None):
        return self._read("trace", "trace", as_of, since)

    def errors(self, as_of=None, since=None):
        return self._read("errors", "error", as_of, since)

    def images(self, as_of=None, since=None):
        return self._read("images", "images", as_of, since)

    def visited(self, as_of=None, since=None):
        return self._read("visited", "visited", as_of, since)

    def has_visited(self, url: str, body: bytes | None = None,
                    as_of=None) -> bool:
        """HasVisited / HasPosted (colly.go:501-509, checkHasVisited
        colly.go:1370-1373): membership of canonicalize(url)‖body's
        FNV-64a hash in the visited store. A driver-side parquet-footer
        column scan — no Spark job (the visited delta files are the
        store)."""
        import glob as _glob

        import pyarrow.parquet as pq

        from colly_spark.functions.urlnorm import canonicalize, request_hash

        h = request_hash(canonicalize(url), body)
        if h >= 1 << 63:
            h -= 1 << 64
        for p in self._paths("visited", as_of):
            for f in _glob.glob(os.path.join(p, "*.parquet")):
                if h in pq.read_table(
                        f, columns=["url_hash"]).column("url_hash").to_pylist():
                    return True
        return False

    def has_posted(self, url: str, body: bytes, as_of=None) -> bool:
        """HasPosted (colly.go:505-509) — the body participates in the
        dedup key, so a POST with a different body is unvisited."""
        return self.has_visited(url, body, as_of)

    def cookies(self, url_or_host: str) -> dict:
        """Cookies(URL) (colly.go:1256-1268): the jar's current
        name→value map for the URL's host — latest committed delta per
        (host, name) wins. Driver-side pyarrow scan over the small
        cookie deltas; no Spark job."""
        import glob as _glob

        import pyarrow.parquet as pq

        host = url_or_host.split("://", 1)[-1].split("/", 1)[0]
        latest: dict[str, tuple[int, str]] = {}
        for p in self._paths("cookies"):
            for f in _glob.glob(os.path.join(p, "*.parquet")):
                t = pq.read_table(f).to_pylist()
                for r in t:
                    if r["c_host"] != host:
                        continue
                    cur = latest.get(r["c_name"])
                    if cur is None or r["c_batch"] >= cur[0]:
                        latest[r["c_name"]] = (r["c_batch"], r["c_value"])
        return {k: v for k, (_, v) in latest.items()}

    def lineage(self) -> dict:
        """Per-partition lineage of the committed state stores from the
        manifest: {relative dir: {"batch", "rows", "files": {part_file:
        rows}}} — which batch produced every live part file and what it
        must contain. Driver-side JSON read; {} for a pre-lineage
        state dir."""
        man = os.path.join(os.path.dirname(self.out_dir), "MANIFEST.json")
        if not os.path.exists(man):
            return {}
        with open(man) as f:
            return json.load(f).get("lineage", {})

    def summary(self) -> str:
        """Collector.String() (colly.go:831-841) from the committed
        per-batch metrics."""
        reqs = sum(m.get("fetched", 0) for m in self.metrics)
        errs = sum(m.get("errors", 0) for m in self.metrics)
        return (f"Requests made: {reqs} ({reqs} responses) | "
                f"Batches: {len(self.metrics)} | Errors: {errs}")

    # logging levels — logger.go:60-66 (LOG_DEBUG..LOG_FATAL)
    LOG_DEBUG, LOG_INFO, LOG_WARN, LOG_ERR, LOG_FATAL = 0, 1, 2, 3, 4

    def events(self, as_of=None, min_level: int = 0):
        """The v3 logger-event stream (collector.go:102-412 logEvent
        sites; LoggerEvent logger.go:27-32), derived DECLARATIVELY from
        the committed sinks — the crawl hot path pays nothing; the
        event log is a view, recomputable for any ``as_of`` snapshot.

        One row per event: (batch, seq, level, event_type, url, values)
        with the reference's per-request emission order —

          request(INFO, {url})                         collector.go:102
          response_hdr(INFO; WARN if status ≥ 300,
                       {url, status_code})             collector.go:143
          response(INFO, error-gate-passing only)      collector.go:177
          html(INFO per extracted element,
               {selector, url})                        collector.go:286
          error(WARN, {url, kind})                     collector.go:225
          scraped(INFO, error-gate-passing only)       collector.go:408

        ``response``/``scraped`` fire for every request that clears the
        error gate (colly.go:685-710 returns before handleOnResponse on
        error; status < 203 default, method NOT checked — HEAD included),
        matching handleOnError's success condition (collector.go:218).
        ``event_ord`` inside values is not needed — order within a seq
        is total by (seq, level-site ordinal) via the ``ord`` column."""
        from pyspark.sql import functions as F

        t = self.trace(as_of)
        parse_gate = F.col("status") < 203
        m_url = F.create_map(F.lit("url"), F.col("url"))
        m_status = F.create_map(
            F.lit("url"), F.col("url"),
            F.lit("status_code"), F.col("status").cast("string"))

        def _ev(df, ord_, level, typ, values):
            return df.select(
                F.col("batch"), F.col("seq"), F.lit(ord_).alias("ord"),
                level.alias("level") if hasattr(level, "alias")
                else F.lit(level).alias("level"),
                F.lit(typ).alias("event_type"),
                F.col("url"), values.alias("values"))

        hdr_level = (F.when(F.col("status") >= 300, F.lit(self.LOG_WARN))
                     .otherwise(F.lit(self.LOG_INFO)))
        events = _ev(t, 0, self.LOG_INFO, "request", m_url) \
            .unionByName(_ev(t, 1, hdr_level, "response_hdr", m_status)) \
            .unionByName(_ev(t.filter(parse_gate), 2, self.LOG_INFO,
                             "response", m_status))
        imgs = self.images(as_of).select(
            F.col("batch"), F.lit(None).cast("long").alias("seq"),
            F.lit(3).alias("ord"), F.lit(self.LOG_INFO).alias("level"),
            F.lit("html").alias("event_type"),
            F.col("page_url").alias("url"),
            F.create_map(F.lit("selector"), F.lit("img[src]"),
                         F.lit("url"), F.col("page_url")).alias("values"))
        errs = self.errors(as_of).select(
            F.col("batch"), F.col("seq"), F.lit(4).alias("ord"),
            F.lit(self.LOG_WARN).alias("level"),
            F.lit("error").alias("event_type"), F.col("url"),
            F.create_map(F.lit("url"), F.col("url"),
                         F.lit("kind"), F.col("kind")).alias("values"))
        events = (events.unionByName(imgs).unionByName(errs)
                  .unionByName(_ev(t.filter(parse_gate), 5, self.LOG_INFO,
                                   "scraped", m_url)))
        return (events.filter(F.col("level") >= min_level)
                .orderBy("batch", "seq", "ord")
                .drop("ord"))


def snapshot_log(state_dir: str) -> list:
    """The commit history (SNAPSHOTS.jsonl) — one dict per committed
    manifest, in commit order. The last entry per batch index is the
    authoritative one (a batch recomputed after a crash or rollback
    re-appends). Empty list for a pre-snapshot-log state dir."""
    path = os.path.join(state_dir, "SNAPSHOTS.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def rollback(state_dir: str, to_batch: int) -> dict:
    """Roll the crawl state back to the commit point of ``to_batch``
    (the Iceberg rollback-to-snapshot analogue), so a subsequent
    ``Crawler(..., state_dir).run(resume=True)`` continues from batch
    ``to_batch + 1`` exactly as if the later batches never ran — and,
    because every batch is a deterministic function of committed
    state, re-draining reproduces the original continuation unless
    the inputs (corpus/config/priorities) changed, which is the point
    of rolling back.

    Driver-side filesystem surgery only — no Spark session:

    1. the target manifest comes from the snapshot log (last entry
       with that batch index);
    2. validity = every store path it references still exists (state
       compaction expires older snapshots, exactly like Iceberg's
       expire_snapshots) and the batch's frontier/pending snap dirs
       survive — otherwise ValueError, state untouched;
    3. MANIFEST.json is atomically replaced, THEN newer artifacts are
       deleted (sink/state deltas, compaction bases, metrics files,
       snap dirs with batch > to_batch). A crash mid-delete leaves
       garbage that the next resume's manifest-driven GC removes —
       the same crash contract as compaction.

    Returns the restored manifest dict."""
    import glob as _glob

    target = None
    for entry in snapshot_log(state_dir):
        if entry["batch"] == to_batch:
            target = entry
    if target is None:
        have = sorted({e["batch"] for e in snapshot_log(state_dir)})
        raise ValueError(
            f"no snapshot for batch {to_batch} in {state_dir} "
            f"(snapshot log has {have})")
    man = {k: v for k, v in target.items() if k != "committed_at"}
    missing = [p for paths in man["stores"].values() for p in paths
               if not os.path.isdir(os.path.join(state_dir, p))]
    for snap in (f"frontier_{to_batch:06d}", f"pending_{to_batch:06d}"):
        if not os.path.isdir(os.path.join(state_dir, "snap", snap)):
            missing.append(os.path.join("snap", snap))
    if missing:
        raise ValueError(
            f"snapshot {to_batch} expired (state compaction or GC "
            f"removed {missing[:4]}{'...' if len(missing) > 4 else ''}); "
            "roll back to a later snapshot")

    tmp = os.path.join(state_dir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(state_dir, "MANIFEST.json"))

    def _tag(path: str) -> int:
        try:
            return int(os.path.basename(path).split("_")[1])
        except (IndexError, ValueError):
            return -1

    live = {os.path.abspath(os.path.join(state_dir, p))
            for paths in man["stores"].values() for p in paths}
    for d in _glob.glob(os.path.join(state_dir, "out", "*", "*")):
        if not os.path.isdir(d) or os.path.abspath(d) in live:
            continue
        base = os.path.basename(d)
        if (base.startswith(("batch_", "compact_"))
                and _tag(d) > to_batch):
            shutil.rmtree(d, ignore_errors=True)
    for f_ in _glob.glob(os.path.join(state_dir, "out", "metrics_*.json")):
        try:
            n = int(os.path.basename(f_)[len("metrics_"):-len(".json")])
        except ValueError:
            continue
        if n > to_batch:
            os.remove(f_)
    for d in _glob.glob(os.path.join(state_dir, "snap", "*")):
        if _tag(d) > to_batch:
            shutil.rmtree(d, ignore_errors=True)
    return man


class Crawler:
    def __init__(self, spark, corpus: dict | None, cfg: CrawlConfig,
                 state_dir: str,
                 bloom_partitions: int = seen.DEFAULT_PARTITIONS,
                 bloom_bits: int = seen.DEFAULT_BITS,
                 bloom_threshold_rows: int = 20_000_000,
                 fetch_source=None,
                 compact_every: int = 16,
                 compact_major_bases: int = 8,
                 priority_df=None,
                 seen_filter: str = "bloom",
                 cuckoo_buckets: int = cuckoo.DEFAULT_BUCKETS,
                 politeness_salt: int = 0):
        """corpus: dict of Spark DataFrames (pages, robots, images) —
        see plans/util.to_spark_corpus.

        ``fetch_source``: a live fetch stage (sources/live_http.
        HttpFetchSource) replacing the corpus join — real sockets via
        mapInPandas, same output contract. With a corpus dict, robots
        and reference images still come from the corpus tables; with
        ``corpus=None`` the crawl is fully live: robots.txt is fetched
        lazily per new host and there are no reference images to
        pixel-validate. Live POST bodies are transmitted on the wire:
        bodies enter only via bootstrap seed tuples, so the admission
        checkpoint stays narrow (the body is hashed into the dedup key
        there) and the fetch stage re-attaches the body by seq from a
        small broadcast side table (``_live_bodies``).

        ``bloom_threshold_rows``: below this visited-set size the Bloom
        layer is bypassed — a plain anti-join against a small visited
        table is cheaper (AQE broadcasts it) than two extra
        co-partitioned stages per batch. At the crossing the segments
        are built once from the exact table and used from then on (the
        10^10-scale path). 0 ⇒ always-on (parity tests force this so
        both paths stay covered).

        ``compact_every`` / ``compact_major_bases``: leveled file
        compaction of the append-only state stores (visited / cache /
        cookies / robots — the Iceberg rewrite_data_files analogue).
        Without it a long crawl appends 1+ delta dirs per batch and
        every batch's anti-join/probe re-opens all of them — at a
        10^4-batch crawl that is 10^4+ small files per read. When a
        store accumulates ``compact_every`` delta dirs they are merged
        into one key-bucketed base dir (minor); when
        ``compact_major_bases`` bases accumulate, the bases merge into
        one (major) — amortized O(n log n) rewrite volume, so per-batch
        wall time stays flat over arbitrarily long crawls. Compaction
        is resume-safe: the new base is written BEFORE the manifest
        commit (the manifest's store path list is the commit point) and
        the replaced delta dirs are deleted only AFTER it; a crash in
        between leaves unreferenced dirs that resume garbage-collects.
        Compaction rewrites rows verbatim (no reduction): revisit
        counts, cache-expiry generations, and cookie history all live
        in the rows themselves. ≤0 disables. Note: like Iceberg's
        expire_snapshots, compaction expires pre-compaction time-travel
        reads of the STATE stores (as_of older than a base's fold
        point); the sink stores (trace/errors/images) are never
        compacted and keep full history.

        ``priority_df``: optional frontier prioritization — a
        (url_hash, priority) DataFrame (e.g. PageRank scores,
        operators/graph.py); each domain's politeness quota then
        admits its highest-priority pending URLs first (NULLs last,
        FIFO tie-break) instead of strict FIFO. Opt-in: the default
        preserves the reference's FIFO queue semantics exactly
        (queue/queue.go), which is what the parity suite pins. The
        join is broadcast below the auto-broadcast threshold and a
        hash join on url_hash above it (score tables pre-partition by
        the same key at 10^10-frontier scale).

        ``seen_filter``: which probabilistic layer fronts the exact
        visited anti-join — "bloom" (operators/seen.py, default) or
        "cuckoo" (operators/cuckoo.py). Same partitioning, same probe
        contract, same exactness (the anti-join backstop absorbs false
        positives either way); cuckoo additionally supports O(k)
        deletion, which is what makes ``forget_visited`` — revisit
        re-admission — cheap at 10^10 keys (Bloom must rebuild its
        segments from the exact table)."""
        self.spark = spark
        self.cfg = cfg
        self.state = state_dir
        self.compact_every = compact_every
        self.compact_major_bases = max(2, compact_major_bases)
        self._gc_dirs: list = []
        self._tmpl_ready: set = set()
        # per-partition lineage cache: abs state-store dir →
        # {"batch", "rows", "files": {part_file: rows}} — computed once
        # per new delta/base at its committing batch, carried in the
        # manifest, verified against footers on resume
        self._lineage: dict = {}
        os.makedirs(state_dir, exist_ok=True)
        self.sch = _schemas()
        self.live = fetch_source
        self.priority = priority_df
        # two-phase salted quota admission (hot-domain skew kill;
        # operators/politeness.with_fetch_now_flag skew_salt) — exact
        # same admitted set, opt-in because the second shuffle only
        # pays off when a domain's backlog dwarfs its quota
        self.politeness_salt = politeness_salt
        # circuit-breaker state (cfg.host_error_budget); loaded on
        # resume from snap/hosthealth_N, None until the first batch
        self._host_health = None
        # crawl-delay table cache: (robots-table identity, materialized
        # host-cardinality table) — see _crawl_delay_table
        self._cd_cache = None
        self._n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        from pyspark.sql import functions as F
        if self.live is None:
            # pre-hash-partition the corpus on the join key ONCE: the
            # cached InMemoryRelation then reports HashPartitioning(url),
            # so every batch's fetch join shuffles only the (much
            # smaller) frontier side instead of re-shuffling the whole
            # corpus (Iceberg bucketing / storage-partitioned join at
            # deployment)
            n_shuffle = self._n_shuffle
            self.pages = corpus["pages"].repartition(n_shuffle, F.col("url")).persist()
            self.pages.count()  # materialize at construction, not mid-drain
        else:
            self.pages = None
        if corpus is not None:
            self.robots = corpus["robots"].persist()
            self.images = corpus["images"].persist()
            self._has_images = not corpus["images"].isEmpty()
        else:
            self.robots = spark.createDataFrame(
                [], "host string, body string, fetch_error boolean")
            self.images = None
            self._has_images = False
        # fully-live mode: robots.txt fetched on first sight of a host,
        # committed as per-batch deltas (tiny, per-host, broadcastable).
        # respect_crawl_delay also needs the robots table even when the
        # allow/deny rules are ignored — Crawl-delay lives in
        # robots.txt, so without this an ignore_robots=True live crawl
        # would silently drop the advertised delays (the robots GATE
        # stays short-circuited by ignore_robots either way)
        self._lazy_robots = (self.live is not None and corpus is None
                             and (not cfg.ignore_robots
                                  or cfg.respect_crawl_delay))
        self._robots_paths: list = []
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be bloom|cuckoo, got {seen_filter!r}")
        self.seen_filter = seen_filter
        if seen_filter == "cuckoo":
            self.bloom = cuckoo.CuckooSegments(
                os.path.join(state_dir, "cuckoo"), bloom_partitions,
                cuckoo_buckets)
        else:
            self.bloom = seen.BloomSegments(
                os.path.join(state_dir, "bloom"), bloom_partitions, bloom_bits)
        # exact visited set = the union of per-batch parquet deltas; kept
        # as a path list and scanned lazily (no driver-side state, no
        # checkpoint job per batch; at deployment this is one bucketed
        # Iceberg table and the scan prunes to the probe's buckets)
        self._visited_paths: list = []
        self._cache_paths: list = []
        # cookie jar (cookiejar.go:23-60 analogue): per-host cookie
        # deltas committed per batch; a cookie set in batch N is
        # visible to fetches from batch N+1 on (concurrent requests in
        # one politeness window don't see each other's Set-Cookie)
        self._cookie_paths: list = []
        # server side: the corpus carries cookie routes (set_cookie /
        # require_cookie columns) — enforced regardless of the client
        # jar, exactly like a real server
        self._corpus_cookie_routes = (
            self.live is None and "set_cookie" in corpus["pages"].columns)
        # client side: the jar. DisableCookies (colly.go:981-985) wins
        # over everything; seeded entries (SetCookies) force it on
        self._has_cookies = (not cfg.disable_cookies) and (
            bool(cfg.initial_cookies)
            or self.live is not None or self._corpus_cookie_routes)
        self._visited_rows = 0
        self._cache_rows = 0
        # live POST bodies: bodies enter the frontier only at bootstrap
        # (S3/S4 seed tuples); the admission checkpoint stays NARROW
        # (url_hash already folds the body in), and the live fetch
        # stage re-attaches the body by seq from this small broadcast
        # side table (bounded by the driver-provided seed list)
        self._live_bodies = None
        self._bloom_threshold = bloom_threshold_rows
        self._bloom_active = bloom_threshold_rows <= 0
        self._filters = self._compile_filters()
        self._batch_persists: list = []
        self._fused = canon_host_hash_udf()

    # ---- filter chain (F1-F5) as one Catalyst when-chain ---------------
    def _compile_filters(self):
        from colly_spark.operators.filters import admission_error_expr

        cfg = self.cfg

        def err_expr(url_col, host_col, depth_col):
            return admission_error_expr(cfg, url_col, host_col, depth_col)

        return err_expr

    def _ua_expr(self):
        """Per-request UserAgent column (RandomUserAgent analogue):
        pool[pmod(url_hash + seed, n)] — JVM-side, deterministic, and
        reproduced exactly by CrawlConfig.pick_user_agent."""
        from pyspark.sql import functions as F

        pool = self.cfg.user_agents
        if not pool:
            return F.lit(self.cfg.user_agent)
        arr = F.array(*[F.lit(u) for u in pool])
        idx = F.pmod(F.col("url_hash") + F.lit(self.cfg.seed), F.lit(len(pool)))
        return F.element_at(arr, (idx + 1).cast("int"))

    def _ensure_robots(self, df_with_host, batch: int) -> None:
        """Fully-live mode: fetch robots.txt for hosts the robots table
        hasn't seen (distributed mapInPandas — the driver never touches
        robots bodies), commit them as a parquet delta, and refresh the
        broadcastable robots view. Host count ≪ URL count, so the table
        stays tiny even at frontier scale."""
        if not self._lazy_robots:
            return
        new_hosts = (df_with_host.select("host").distinct()
                     .join(self.robots.select("host"), "host", "left_anti"))
        # checkpoint so the emptiness probe and the delta write both
        # reuse ONE live fetch (robots.txt must not be fetched twice)
        fetched = self.live.fetch_robots(new_hosts).localCheckpoint(eager=True)
        if fetched.isEmpty():
            return
        delta = os.path.join(self.state, "out", "robots",
                             f"batch_{batch:06d}_{len(self._robots_paths):03d}")
        fetched.write.mode("overwrite").parquet(delta)
        self._robots_paths.append(delta)
        self.robots = self.spark.read.parquet(*self._robots_paths)

    def _robots_gate(self, df, url_col="canon_url"):
        """Append robots_ok:boolean. Broadcast join (robots table is
        per-host — tiny) + vectorized matcher UDF keyed by the
        per-request UA. HEAD skips robots (colly.go:723);
        IgnoreRobotsTxt short-circuits entirely."""
        from pyspark.sql import functions as F

        if self.cfg.ignore_robots:
            return df.withColumn("robots_ok", F.lit(True))
        r = F.broadcast(self.robots.select(
            F.col("host").alias("_rhost"), F.col("body").alias("_rbody"),
            F.col("fetch_error").alias("_rerr")))
        df = df.join(r, df["host"] == r["_rhost"], "left")
        ok = robots_allowed_udf()(
            F.col(url_col), F.col("_rbody"), F.col("_rerr"), self._ua_expr())
        return (df.withColumn("robots_ok", (F.col("method") == "HEAD") | ok)
                  .drop("_rhost", "_rbody", "_rerr"))

    # ---- seen-filter dispatch (Bloom | cuckoo segments) ------------------
    def _seen_probe(self, df, claim: bool = False):
        if self.seen_filter == "cuckoo":
            return cuckoo.cuckoo_probe(df, self.bloom, claim=claim)
        return seen.bloom_probe(df, self.bloom, claim=claim)

    def _seen_update(self, hashes_df) -> list:
        if self.seen_filter == "cuckoo":
            if self.cfg.max_revisits > 0 or self.cfg.allow_url_revisit:
                # revisit-counting / revisit-allowed modes mark the SAME
                # hash repeatedly; Bloom's OR is idempotent but a cuckoo
                # insert adds a fingerprint copy per mark until the
                # segment overflows — and the probe path never consults
                # the segments in these modes anyway (the exact count
                # join is the gate), so skip the fold entirely
                return []
            return cuckoo.cuckoo_update(self.spark, self.bloom, hashes_df)
        return seen.bloom_update(self.spark, self.bloom, hashes_df)

    # ---- check-and-mark (D1) -------------------------------------------
    def _check_and_mark(self, df, batch: int, delta_tag: str):
        """df: candidate rows with url_hash, seq, needs_mark. Returns
        (accepted_df, already_df). Marks accepted hashes into
        visited + Bloom BEFORE returning (mark-before-fetch,
        colly.go:745-753).

        Shape at scale: the window claim shuffles by url_hash (same key
        as the Bloom pid partitioning — one exchange reused); Bloom
        probe is co-partitioned per-segment; only Bloom-positives reach
        the exact anti-join.
        """
        from pyspark.sql import Window, functions as F

        if self.cfg.allow_url_revisit:
            return df, df.limit(0)
        bypass = df.filter(~F.col("needs_mark"))
        cand = df.filter(F.col("needs_mark"))
        vis = self._visited_df()
        if self._bloom_active and self.cfg.max_revisits == 0:
            # ONE exchange: the within-batch claim (lowest seq per hash
            # wins) is computed inside the co-partitioned probe task —
            # pid is a function of url_hash, so duplicates co-locate.
            # Definitely-new rows skip the exact join entirely.
            probed = self._seen_probe(cand, claim=True).persist()
            self._batch_persists.append(probed)
            dup_in_batch = probed.filter(F.col("_claim") > 1) \
                                 .drop("_claim", "maybe_seen", "pid")
            first = probed.filter(F.col("_claim") == 1) \
                          .drop("_claim", "maybe_seen", "pid")
            maybe_first = probed.filter((F.col("_claim") == 1)
                                        & F.col("maybe_seen")) \
                                .drop("_claim", "maybe_seen", "pid")
            fresh = probed.filter((F.col("_claim") == 1)
                                  & ~F.col("maybe_seen")) \
                          .drop("_claim", "maybe_seen", "pid")
            already_exact = maybe_first.join(vis, "url_hash", "left_semi")
            confirmed_new = maybe_first.join(vis, "url_hash", "left_anti")
            accepted = fresh.unionByName(confirmed_new)
            already = dup_in_batch.unionByName(already_exact)
            return accepted.unionByName(bypass), already
        # within-batch claim: lowest seq per hash wins
        w = Window.partitionBy("url_hash").orderBy("seq")
        ranked = cand.withColumn("_claim", F.row_number().over(w))
        if self.cfg.max_revisits > 0:
            # F7 visit-count mode (filters/revisit.go): a URL may be
            # visited 1+max_revisits times. The Bloom layer is
            # membership-only → exact count join instead; every visit
            # appends its own mark row, so counts live in the visited
            # deltas themselves.
            prior = vis.groupBy("url_hash").agg(F.count("*").alias("_prior"))
            j = ranked.join(prior, "url_hash", "left").na.fill({"_prior": 0})
            ok_cond = (F.col("_prior") + F.col("_claim") - 1) <= self.cfg.max_revisits
            accepted = j.filter(ok_cond).drop("_claim", "_prior")
            already = j.filter(~ok_cond).drop("_claim", "_prior")
            return accepted.unionByName(bypass), already
        dup_in_batch = ranked.filter(F.col("_claim") > 1).drop("_claim")
        first = ranked.filter(F.col("_claim") == 1).drop("_claim")
        # small-visited regime: one anti-join (AQE broadcasts vis)
        already_exact = first.join(vis, "url_hash", "left_semi")
        accepted = first.join(vis, "url_hash", "left_anti")
        already = dup_in_batch.unionByName(already_exact)
        return accepted.unionByName(bypass), already

    def _join_marks(self) -> None:
        """Wait for an in-flight async marks commit (and surface its
        exception). MUST be called before anything reads the visited
        store or Bloom segments — _visited_df, _maybe_compact and
        _commit do, so every consumer path is covered."""
        fut, self._marks_fut = getattr(self, "_marks_fut", None), None
        if fut is not None:
            fut.result()

    def _commit_marks_async(self, accepted_df, batch: int, delta_tag: str):
        """Run _commit_marks on a single worker thread so the marks
        delta write + Bloom fold overlap the fetch join / parse phase
        (they are independent: within-batch dedup was already claimed
        inside the admission probe, and the delta's first consumer is
        the redirect-hop admission — which joins via _visited_df — or
        the next batch). Mark-before-fetch (colly.go:745-753) is a
        crash-ordering rule, and the manifest commit point — which is
        what a resume reads — still happens strictly after the join in
        _commit, so resume semantics are byte-identical.
        COLLY_ASYNC_MARKS=0 forces the synchronous path (A/B lever)."""
        if os.environ.get("COLLY_ASYNC_MARKS", "1") == "0":
            self._commit_marks(accepted_df, batch, delta_tag)
            return
        from concurrent.futures import ThreadPoolExecutor

        self._join_marks()  # serialize deltas: one in flight at a time
        if getattr(self, "_marks_exec", None) is None:
            self._marks_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="marks_commit")
        self._marks_fut = self._marks_exec.submit(
            self._commit_marks, accepted_df, batch, delta_tag)

    def _commit_marks(self, accepted_df, batch: int, delta_tag: str):
        """Append the accepted needs_mark hashes to the visited deltas +
        fold into the Bloom segments. MUST run after the accepted rows
        are materialized (checkpointed) and BEFORE the fetch stage /
        any later check (mark-before-fetch, colly.go:745-753); the
        caller's checkpoint makes this a cheap scan, not a DAG re-run.

        The delta stays a NARROW url_hash-only file on purpose: the
        visited table is the hottest scan in the engine (every batch's
        anti-join at 10^10 keys) — a wide checkpoint file doubling as
        the delta was tried and regressed both that scan (deferred rows
        rewritten every batch) and the downstream checkpoint reads."""
        from pyspark.sql import functions as F

        marks = accepted_df.filter(F.col("needs_mark")).select("url_hash")
        delta_dir = os.path.join(self.state, "out", "visited",
                                 f"batch_{batch:06d}_{delta_tag}")
        marks.write.mode("overwrite").parquet(delta_dir)
        self._visited_paths.append(delta_dir)
        self._visited_rows += _parquet_rows(delta_dir)
        if self._bloom_active:
            self._seen_update(self.spark.read.parquet(delta_dir))
        elif self._visited_rows >= self._bloom_threshold:
            # threshold crossed: build the segments once from the exact
            # table; from now on every batch probes/updates them
            self._seen_update(self._visited_df())
            self._bloom_active = True

    def _visited_df(self):
        self._join_marks()
        if not self._visited_paths:
            return self.spark.createDataFrame([], self.sch["visited"])
        return self.spark.read.parquet(*self._visited_paths)

    def forget_visited(self, hashes) -> int:
        """Revisit re-admission: remove URL hashes from the seen state
        so their next sighting crawls again — the write half of
        freshness-driven recrawl (operators/politeness.recrawl_schedule
        decides WHICH hashes are due; this makes them crawlable).

        ``hashes``: iterable of int64 url_hash values or a DataFrame
        with a ``url_hash`` column. Returns the number of visited rows
        actually removed (hashes never crawled are ignored).

        Shape at scale (the Iceberg MERGE-DELETE analogue): ONE
        anti-join pass rewrites the exact visited store into a bucketed
        base — the same cost a compaction cycle already pays — ordered
        write → manifest commit → GC, so a crash at any point resumes
        consistently. The probabilistic layer is where the filters
        differ: cuckoo segments delete exactly the k due fingerprints
        in their own co-partitioned tasks (O(k)); Bloom cannot delete,
        so its segments rebuild from the rewritten exact table (O(n) —
        the reason ``seen_filter="cuckoo"`` exists).

        Membership mode only: with ``max_revisits`` counting or
        ``allow_url_revisit`` the visited rows ARE the counters and
        removal would change unrelated semantics."""
        from pyspark.sql import functions as F

        if self.cfg.allow_url_revisit or self.cfg.max_revisits > 0:
            raise ValueError(
                "forget_visited requires membership dedup mode "
                "(allow_url_revisit=False, max_revisits=0)")
        self._join_marks()
        if not self._visited_paths:
            return 0
        if isinstance(hashes, (list, tuple, set)):
            due = self.spark.createDataFrame(
                [(int(h),) for h in hashes], self.sch["visited"])
        else:
            due = hashes.select("url_hash")
        # deletion soundness (operators/cuckoo.py): only hashes that
        # were actually inserted may be deleted from the filter
        due = (due.distinct()
                  .join(self._visited_df(), "url_hash", "left_semi")
                  .persist())
        n_due = due.count()
        if n_due == 0:
            due.unpersist()
            return 0
        # 1) rewrite the exact store minus the due set into one
        #    key-bucketed base (named compact_* so the compactor treats
        #    it as a base; resume prunes it only if uncommitted)
        man_batch, man_seq = 0, getattr(self, "_next_seq", 0)
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                man = json.load(f)
            man_batch, man_seq = man["batch"], man["next_seq"]
        # pick an unused dir name: a previous process's forget at the
        # same committed batch may have left compact_B_F1 as the live
        # base — overwriting a path Spark is reading from fails
        k = getattr(self, "_forget_count", 0)
        while True:
            k += 1
            out_dir = os.path.join(self.state, "out", "visited",
                                   f"compact_{man_batch:06d}_F{k}")
            if not os.path.exists(out_dir):
                break
        self._forget_count = k
        rows = self._visited_rows
        n_buckets = max(1, min(self._n_shuffle, rows // 2_000_000 + 1))
        (self._visited_df().join(due, "url_hash", "left_anti")
             .repartition(n_buckets, F.col("url_hash"))
             .write.mode("overwrite").parquet(out_dir))
        replaced = list(self._visited_paths)
        self._visited_paths = [out_dir]
        self._visited_rows = _parquet_rows(out_dir)
        removed = rows - self._visited_rows
        # 1b) purge the due set from the response cache too — a
        #     re-admitted URL must be re-FETCHED, not replayed from its
        #     stale cached body (the freshness signal the recrawl
        #     exists to observe; cache key c_hash = fnv64(url‖body) =
        #     the same url_hash being forgotten)
        if self._cache_paths:
            j = 0
            while True:
                j += 1
                cache_dir = os.path.join(self.state, "out", "cache",
                                         f"compact_{man_batch:06d}_F{j}")
                if not os.path.exists(cache_dir):
                    break
            n_cbuckets = max(1, min(
                self._n_shuffle, self._cache_rows // 2_000_000 + 1))
            (self.spark.read.parquet(*self._cache_paths)
                 .join(due.select(F.col("url_hash").alias("c_hash")),
                       "c_hash", "left_anti")
                 .repartition(n_cbuckets, F.col("c_hash"))
                 .write.mode("overwrite").parquet(cache_dir))
            replaced += self._cache_paths
            self._cache_paths = [cache_dir]
            self._cache_rows = _parquet_rows(cache_dir)
        # 2) probabilistic layer
        if self._bloom_active:
            if self.seen_filter == "cuckoo":
                cuckoo.cuckoo_delete(self.spark, self.bloom, due)
            else:
                shutil.rmtree(self.bloom.dir, ignore_errors=True)
                os.makedirs(self.bloom.dir, exist_ok=True)
                if self._visited_rows:
                    self._seen_update(self._visited_df())
        # 3) commit point, then GC the replaced dirs
        self._gc_dirs.extend(replaced)
        self._commit(man_batch, man_seq)
        self._gc_replaced()
        due.unpersist()
        return removed

    def _cache_latest(self, batch: int):
        """X4 response-cache probe table: latest valid entry per request
        hash (GET-only; TTL in batch-index logical time — the v3
        expiry-by-duration policy, cache.go:153-211)."""
        return self._cache_probe_tables(batch)[0]

    def _cache_probe_tables(self, batch: int):
        """(valid, stale_with_validator) latest-entry-per-hash tables.

        ``valid`` replays without a fetch (the existing X4 probe).
        ``stale_with_validator`` (cache_revalidate only, else None) is
        the RFC 9111 §4.3 set: entries expired under the configured
        policy whose response carried an ETag — their requests go out
        CONDITIONAL (If-None-Match) and a 304 replays + refreshes the
        entry instead of re-downloading the body. One parquet read
        feeds both tables; validity is a column predicate over the
        same latest-per-hash window."""
        from pyspark.sql import Window, functions as F

        if not self.cfg.cache_enabled or not self._cache_paths:
            return None, None
        policy = getattr(self.cfg, "cache_expiry_policy", "duration")
        date_cut = (policy == "date" and self.cfg.cache_expire_at_batch > 0
                    and batch >= self.cfg.cache_expire_at_batch)
        reval = getattr(self.cfg, "cache_revalidate", False)
        if date_cut and not reval:
            # cacheExpByDate (cache.go:185-199): every entry is invalid
            # once the logical clock passes the fixed cutoff
            return None, None
        self._cache_rows = sum(_parquet_rows(p) for p in self._cache_paths)
        df = self.spark.read.parquet(*self._cache_paths)
        w = Window.partitionBy("c_hash").orderBy(F.col("c_created").desc())
        latest = (df.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1).drop("_rn"))
        ttl = self.cfg.cache_ttl_batches
        if date_cut:
            valid_expr = F.lit(False)
        elif policy == "duration" and ttl > 0:
            valid_expr = F.col("c_created") + ttl > batch
        elif policy == "header":
            # cacheExpByHeader (cache.go:155-162): valid only while the
            # response-provided expiry lies ahead; entries without a
            # max-age header carry NULL c_expiry = already expired
            valid_expr = (F.col("c_expiry").isNotNull()
                          & (F.col("c_expiry") > batch))
        else:
            valid_expr = F.lit(True)
        valid = latest.filter(valid_expr)
        stale = None
        if reval:
            for vc in ("c_etag", "c_lastmod"):
                if vc not in latest.columns:
                    latest = latest.withColumn(
                        vc, F.lit(None).cast("string"))
            stale = latest.filter(
                ~valid_expr & (F.col("c_etag").isNotNull()
                               | F.col("c_lastmod").isNotNull()))
        return valid, stale

    def _cookie_jar(self):
        """Latest (c_host, c_name) → c_value from the committed cookie
        deltas (strictly earlier batches). None when no cookies exist."""
        from pyspark.sql import Window, functions as F

        if not self._cookie_paths:
            return None
        df = self.spark.read.parquet(*self._cookie_paths)
        w = Window.partitionBy("c_host", "c_name").orderBy(F.col("c_batch").desc())
        return (df.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn", "c_batch"))

    def _apply_cookie_gate(self, hit, jar):
        """Rows whose page requires a cookie the jar doesn't hold become
        terminal 403s (no body, no redirect, no Set-Cookie)."""
        from pyspark.sql import functions as F

        host = F.regexp_extract(F.col("cur"), "^[a-z]+://([^/]+)", 1)
        req_name = F.substring_index(F.col("require_cookie"), "=", 1)
        req_val = F.expr(
            "substring(require_cookie, instr(require_cookie, '=') + 1)")
        if jar is not None:
            j = F.broadcast(jar)
            hit = hit.join(
                j, (host == j["c_host"]) & (req_name == j["c_name"]), "left")
            ok = F.col("require_cookie").isNull() | (F.col("c_value") == req_val)
            hit = hit.withColumn("_cookie_ok", ok).drop("c_host", "c_name", "c_value")
        else:
            hit = hit.withColumn("_cookie_ok", F.col("require_cookie").isNull())
        ok = F.col("_cookie_ok")
        return (hit
                .withColumn("status", F.when(ok, F.col("status")).otherwise(F.lit(403)))
                .withColumn("body", F.when(ok, F.col("body")))
                # the blocked 403 is a terminal synthetic response —
                # it carries no Content-Type header (keeps the
                # headers-abort gate off it, like the simulator)
                .withColumn("content_type", F.when(ok, F.col("content_type")))
                .withColumn("redirect_to", F.when(ok, F.col("redirect_to")))
                .withColumn("set_cookie", F.when(ok, F.col("set_cookie")))
                .drop("_cookie_ok"))

    # ---- admission + quota (phase 1+2, one checkpoint) -----------------
    def _admit(self, frontier_df, pending_df, batch: int):
        """requestCheck over new frontier rows, FUSED with the
        politeness quota window over pending ∪ newly-admitted. Returns
        (fetch_now, deferred, errors, counts) — ALL derived from a
        SINGLE eagerly-checkpointed DataFrame, so the whole phase
        (fused canonicalize/host/hash UDF → Catalyst filter chain →
        robots gate → window claim → Bloom probe → exact anti-join →
        per-domain quota window) executes exactly once per batch and
        the quota costs no extra job/persist/count."""
        from pyspark.sql import functions as F

        # a small frontier snapshot coalesces into few read partitions —
        # spread it across cores BEFORE the per-row UDF work or
        # admission runs near-single-threaded (the shuffle moves only
        # compact frontier rows and replaces a per-batch .rdd plan
        # conversion that inspected the scan's split count).
        # (Round-3 measured-and-rejected: SKIPPING this exchange for
        # small frontiers left _admit medians unchanged — 1.07 s vs
        # 1.04 s on a 6k-row frontier — the barrier pipelines into the
        # claim exchange; see ROADMAP. Re-sizing it was already
        # rejected in round 2.)
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        frontier_df = frontier_df.repartition(n)
        # ONE pass computes every pre-dedup decision as columns (fused
        # UDF + filter chain + robots gate); the base is cached so the
        # error/accept branch scans below don't re-run the UDFs
        base = frontier_df.withColumn(
            "_k", self._fused(F.col("url"), F.col("body_req")))
        base = base.select(
            "seq", "url", "depth", "method", "body_req", "referer", "ctx",
            "no_revisit", "tries",
            F.col("_k.canon_url").alias("canon_url"),
            F.col("_k.host").alias("host"),
            F.col("_k.url_hash").alias("url_hash"))
        self._ensure_robots(base, batch)
        base = self._robots_gate(base)
        kind_pre = (
            F.when(F.col("canon_url") == "", F.lit(cfgmod.ERR_MISSING))
            .otherwise(F.coalesce(
                self._filters(F.col("canon_url"), F.col("host"), F.col("depth")),
                F.when(~F.col("robots_ok"), F.lit(cfgmod.ERR_ROBOTS))))
        )
        base = base.withColumn("_kind_pre", kind_pre).persist()
        self._batch_persists.append(base)
        errors = [base.filter(F.col("_kind_pre").isNotNull()).select(
            F.lit(batch).alias("batch"), "seq",
            F.when(F.col("_kind_pre") == cfgmod.ERR_MISSING, F.col("url"))
             .otherwise(F.col("canon_url")).alias("url"),
            F.col("_kind_pre").alias("kind"))]
        ok = base.filter(F.col("_kind_pre").isNull()).drop("_kind_pre", "robots_ok")
        # HEAD / bodyless non-GET skip check-and-mark entirely
        # (colly.go:728-734); AllowURLRevisit skips the check AND the
        # mark (colly.go:736-753 guards both behind !AllowURLRevisit)
        # retry rows (no_revisit, request.go:190-198 scrape with
        # checkRevisit=false) skip check AND mark like HEAD does
        ok = ok.withColumn(
            "needs_mark",
            F.lit(False) if self.cfg.allow_url_revisit
            else (((F.col("method") == "GET") | F.col("body_req").isNotNull())
                  & ~F.coalesce(F.col("no_revisit"), F.lit(False))))
        accepted, already = self._check_and_mark(ok, batch, "admit")
        errors.append(already.select(
            F.lit(batch).alias("batch"), "seq", F.col("canon_url").alias("url"),
            F.lit(cfgmod.ERR_ALREADY_VISITED).alias("kind")))
        err_df = reduce(lambda a, b: a.unionByName(b), errors)
        # pool = prior pending ∪ newly admitted; quota flag computed
        # BEFORE the checkpoint (P1-P2 window — the reference skips the
        # semaphore entirely for nil rules, http_backend.go:134)
        pool = accepted.select(
            "seq", "canon_url", "host", "depth", "method", "body_req",
            "url_hash", "needs_mark", "referer", "ctx", "tries",
            F.lit(True).alias("_new"),
        ).unionByName(pending_df.select(
            "seq", "canon_url", "host", "depth", "method", "body_req",
            "url_hash", F.lit(False).alias("needs_mark"), "referer", "ctx",
            "tries", F.lit(False).alias("_new")))
        cd_col = None
        if self.cfg.respect_crawl_delay:
            # robots Crawl-delay politeness: per-host delay (ms,
            # capped) joined onto the pool; the quota window divides
            # by it, the hosthealth block spaces super-window delays
            cds = self._crawl_delay_table()
            if cds is not None:
                pool = pool.join(F.broadcast(cds), "host", "left")
                cd_col = "_cd_ms"
        if self.cfg.limit_rules or cd_col:
            if self.priority is not None:
                # opt-in priority scheduling: quota admits highest
                # scores first (NULL = unscored = after scored, FIFO
                # tie-break); the score column never enters the
                # checkpoint schema
                pool = pool.join(
                    self.priority.select("url_hash",
                                         F.col("priority").alias("_prio")),
                    "url_hash", "left")
                pool = politeness.with_fetch_now_flag(
                    pool, self.cfg, priority_col="_prio",
                    skew_salt=self.politeness_salt,
                    crawl_delay_col=cd_col).drop("_prio")
            else:
                pool = politeness.with_fetch_now_flag(
                    pool, self.cfg, skew_salt=self.politeness_salt,
                    crawl_delay_col=cd_col)
        else:
            pool = pool.withColumn("_fetch_now", F.lit(True))
        if cd_col:
            pool = pool.drop("_cd_ms")
        if ((self.cfg.host_error_budget > 0 or self.cfg.respect_retry_after
                or self.cfg.respect_crawl_delay)
                and self._host_health is not None):
            # circuit breaker: a tripped host's rows defer wholesale —
            # exactly like quota-deferred rows (already marked, kept
            # pending) — until its cooldown expires. Health table is
            # active-hosts-only (tiny); AQE broadcasts the join.
            blocked = (self._host_health
                       .filter(F.col("blocked_until") > batch)
                       .select("host", F.lit(True).alias("_hblocked")))
            pool = (pool.join(blocked, "host", "left")
                    .withColumn("_fetch_now",
                                F.col("_fetch_now")
                                & F.col("_hblocked").isNull())
                    .drop("_hblocked"))
        # one checkpoint for every output: union on a widened schema,
        # split after materialization; mark delta, fetch/deferred split
        # and the admission counts are all cheap scans of it
        combined = pool.select(
            "seq", "canon_url", "host", "depth", "method", "body_req",
            "url_hash", "needs_mark", "referer", "ctx", "tries",
            "_new", "_fetch_now",
            F.lit(None).cast("string").alias("kind"),
            F.lit(None).cast("string").alias("err_url"),
        ).unionByName(err_df.select(
            "seq", F.lit(None).cast("string").alias("canon_url"),
            F.lit(None).cast("string").alias("host"),
            F.lit(None).cast("int").alias("depth"),
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast("binary").alias("body_req"),
            F.lit(None).cast("long").alias("url_hash"),
            F.lit(False).alias("needs_mark"),
            F.lit(None).cast("string").alias("referer"),
            F.lit(None).cast("string").alias("ctx"),
            F.lit(None).cast("int").alias("tries"),
            F.lit(False).alias("_new"), F.lit(False).alias("_fetch_now"),
            "kind", F.col("url").alias("err_url"),
        ))
        # the admitted/deferred metrics ride the checkpoint job itself
        # (Observation) — no separate count job
        from pyspark.sql import Observation
        obs = Observation(f"admit_{batch}")
        combined = combined.observe(
            obs,
            F.sum(F.when(F.col("_new"), 1).otherwise(0)).alias("admitted"),
            F.sum(F.when(F.col("kind").isNull() & ~F.col("_fetch_now"), 1)
                  .otherwise(0)).alias("deferred"),
            F.sum(F.when(F.col("needs_mark"), 1).otherwise(0)).alias("marks"),
            F.sum(F.when(F.col("kind").isNull() & F.col("_fetch_now"), 1)
                  .otherwise(0)).alias("fetch_now"),
            F.sum(F.when(F.col("kind").isNotNull(), 1)
                  .otherwise(0)).alias("errs"),
        ).localCheckpoint(eager=True)
        counts = obs.get
        ok_rows = combined.filter(F.col("kind").isNull())
        if int(counts["marks"] or 0) > 0:
            self._commit_marks_async(ok_rows, batch, "admit")
        pend_cols = ["seq", "canon_url", "host", "depth", "method",
                     "body_req", "url_hash", "referer", "ctx", "tries"]
        fetch_now = ok_rows.filter(F.col("_fetch_now")).select(pend_cols)
        deferred = ok_rows.filter(~F.col("_fetch_now")).select(pend_cols)
        err_out = combined.filter(F.col("kind").isNotNull()).select(
            F.lit(batch).alias("batch"), "seq",
            F.col("err_url").alias("url"), "kind")
        return fetch_now, deferred, err_out, dict(
            admitted=int(counts["admitted"] or 0),
            deferred=int(counts["deferred"] or 0),
            fetch_now=int(counts["fetch_now"] or 0),
            errs=int(counts["errs"] or 0))

    # ---- fetch + redirect-hop loop (phase 3) ---------------------------
    def _fetch(self, fetch_now, batch: int, tag: str = ""):
        """Returns (done_df, errors_df). done_df is the COMPACT parsed
        output (_parse_batch schema): bodies stream through the
        extraction UDF inside each hop's finals branch and are never
        cached — the join itself is a cheap shuffled-hash join against
        the pre-partitioned corpus cache, so the metadata branches
        (missing / redirect detection) simply recompute it with the
        body column pruned by the columnar cache."""
        from pyspark.sql import functions as F

        if self.live is None:
            page_cols = [
                F.col("url").alias("_purl"), F.col("status"), F.col("content_type"),
                F.col("body"), F.col("redirect_to"), F.col("image_id")]
            if self._corpus_cookie_routes:
                page_cols += [F.col("set_cookie"), F.col("require_cookie")]
            else:
                page_cols += [F.lit(None).cast("string").alias("set_cookie"),
                              F.lit(None).cast("string").alias("require_cookie")]
            # by-header cache expiry source (response.go:108-149): the
            # max-age the page's response carries, when the corpus
            # models one
            if "cache_max_age" in self.pages.columns:
                page_cols.append(F.col("cache_max_age"))
            else:
                page_cols.append(
                    F.lit(None).cast("int").alias("cache_max_age"))
            # Retry-After seconds a 429/503 response carries
            # (respect_retry_after back-pressure source)
            if "retry_after" in self.pages.columns:
                page_cols.append(F.col("retry_after"))
            else:
                page_cols.append(
                    F.lit(None).cast("int").alias("retry_after"))
            # validators the response carries (cache_revalidate)
            for vc in ("etag", "last_modified"):
                if vc in self.pages.columns:
                    page_cols.append(F.col(vc))
                else:
                    page_cols.append(F.lit(None).cast("string").alias(vc))
            pages = self.pages.select(*page_cols)
        else:
            pages = None
        jar = self._cookie_jar() if self._has_cookies else None
        # conditional-request validators attached by the revalidation
        # probe (cache_revalidate): If-None-Match / If-Modified-Since;
        # NULL everywhere otherwise. RFC-style, the conditional
        # headers follow redirects to the final resource.
        inm_col = (F.col("_inm") if "_inm" in fetch_now.columns
                   else F.lit(None).cast("string")).alias("_inm")
        ims_col = (F.col("_ims") if "_ims" in fetch_now.columns
                   else F.lit(None).cast("string")).alias("_ims")
        remaining = fetch_now.select(
            "seq", F.col("canon_url").alias("url"), F.col("canon_url").alias("cur"),
            "depth", "method", "body_req",
            F.col("url_hash").alias("req_hash"), "referer", "ctx", "tries",
            inm_col, ims_col)
        done_parts, err_parts = [], []

        def err_rows(df, kind_col):
            return df.select(F.lit(batch).alias("batch"), "seq",
                             F.col("url"), kind_col.alias("kind"))

        for hop in range(self.cfg.max_redirects + 2):
            if self.live is not None:
                # real sockets: map-side mapInPandas fetch, same output
                # contract; network failures surface as _purl NULL.
                # persist so the downstream branches (redirect probe,
                # parse, error channels) never re-execute the network
                # fetch — caching is per-partition, so every URL hits
                # the wire exactly once per hop
                from pyspark import StorageLevel
                to_fetch = remaining
                if (self._live_bodies is not None
                        and "body_req" not in remaining.columns):
                    # re-attach S3/S4 POST bodies by seq (stable across
                    # redirect hops); broadcast — the side is bounded
                    # by the seed list. Skipped when the pool already
                    # carries body_req natively (the retry-capable path)
                    to_fetch = remaining.join(
                        F.broadcast(self._live_bodies), "seq", "left")
                joined = self.live.lookup(to_fetch, jar=jar).persist(
                    StorageLevel.MEMORY_AND_DISK)
                self._batch_persists.append(joined)
            else:
                # shuffle-hash hint: the corpus side is pre-hash-
                # partitioned and cached; a sort-merge join would
                # re-SORT it every batch. Hash join builds on the
                # (small) frontier side and streams the corpus
                # partitions untouched. The build side is per-
                # partition IN-MEMORY though — beyond a rows-per-
                # partition cap the hash map outgrows task execution
                # memory (observed: SparkOutOfMemoryError at a 10x
                # stress corpus) — so huge frontiers fall back to
                # sort-merge, which spills; the cap is the honest
                # memory/sort trade, not a correctness knob.
                per_part = self._n_frontier / max(self._n_shuffle, 1)
                shj_cap = int(os.environ.get(
                    "COLLY_SHJ_ROWS_PER_PART", "100000"))
                lhs = (remaining if per_part > shj_cap
                       else remaining.hint("shuffle_hash"))
                joined = lhs.join(
                    pages, remaining["cur"] == pages["_purl"], "left")
            missing = joined.filter(F.col("_purl").isNull())
            err_parts.append(err_rows(missing, F.lit(cfgmod.ERR_MISSING)))
            hit = joined.filter(F.col("_purl").isNotNull()).drop("_purl")
            if self._corpus_cookie_routes:
                # the corpus server enforces its cookie requirements
                # whether or not the client jar is on (DisableCookies
                # turns off the jar, not the server); live servers
                # enforce their own — the jar was SENT above
                hit = self._apply_cookie_gate(hit, jar)
            # D3 FollowRedirects=false: the 3xx IS the final response —
            # its target is never filtered, marked, or fetched
            # (config.go:47, colly.go:252-258)
            if self.cfg.follow_redirects:
                is_redirect = (F.col("status").isin(*REDIRECT_STATUSES)
                               & F.col("redirect_to").isNotNull())
            else:
                is_redirect = F.lit(False)
            finals = hit.filter(~is_redirect)
            # cache_revalidate: a conditional GET whose validator still
            # matches the resource's current ETag is a 304 Not Modified
            # — no body crosses the wire (the corpus join models the
            # server's validator check; live servers answer 304
            # natively and the swap is a no-op on them). The stored
            # entry replays after the fetch (drain-side join).
            if self.cfg.cache_revalidate:
                # RFC 9110 §13.2.2 precedence: when an If-None-Match /
                # ETag pair exists it DECIDES; If-Modified-Since is
                # evaluated only when no ETag comparison applies
                inm_applies = (F.col("_inm").isNotNull()
                               & F.col("etag").isNotNull())
                ims_match = (F.col("_ims").isNotNull()
                             & F.col("last_modified").isNotNull()
                             & (F.col("last_modified") == F.col("_ims")))
                is_304 = ((F.col("method") == "GET")
                          & F.when(inm_applies,
                                   F.col("etag") == F.col("_inm"))
                             .otherwise(ims_match))
                finals = (finals
                          .withColumn("status",
                                      F.when(is_304, F.lit(304))
                                      .otherwise(F.col("status")))
                          .withColumn("body",
                                      F.when(is_304, F.lit(None).cast("binary"))
                                      .otherwise(F.col("body"))))
            # F9 headers-abort (checkHeadersFunc colly.go:673-680,
            # http_backend.go:223-227): a final response whose
            # Content-Type matches aborts the body download —
            # ErrAbortedAfterHeaders on the error channel, no parse,
            # and (since Do errored) nothing reaches the cache store
            if self.cfg.abort_header_content_types:
                hdr_abort = reduce(
                    lambda a, b: a | b,
                    (F.col("content_type").rlike(p)
                     for p in self.cfg.abort_header_content_types))
                hdr_abort = F.coalesce(hdr_abort, F.lit(False))
                err_parts.append(err_rows(
                    finals.filter(hdr_abort),
                    F.lit(cfgmod.ERR_ABORTED_AFTER_HEADERS)))
                finals = finals.filter(~hdr_abort)
            done_parts.append(self._parse_batch(finals.select(
                "seq", "url", "depth", "method", F.col("cur").alias("final_url"),
                "status", "content_type", "body", "image_id", "req_hash", "referer",
                "set_cookie", "cache_max_age", "retry_after", "etag",
                "last_modified", "ctx", "body_req", "tries")))
            if not self.cfg.follow_redirects:
                break
            # NOTE: a probe-less variant (Observation on the redirect
            # rows riding the hop checkpoint) was tried and regressed:
            # it pays the full window/anti-join/checkpoint plan on hops
            # with no redirects, where this isEmpty exits for one cheap
            # job. Keep the probe.
            redir = hit.filter(is_redirect).persist()
            if redir.isEmpty():
                redir.unpersist()
                break
            if hop >= self.cfg.max_redirects:
                err_parts.append(err_rows(redir, F.lit(cfgmod.ERR_TOO_MANY_REDIRECTS)))
                redir.unpersist()
                break
            # resolve target; re-run filters + robots + check-and-mark on
            # the target (every hop, colly.go:1306-1354)
            t = redir.select(
                "seq", "url", "depth", "method", "body_req", "req_hash",
                "referer", "ctx", "tries", "_inm", "_ims",
                self._fused(F.col("redirect_to"), F.lit(None).cast("binary")).alias("_k"))
            t = t.select(
                "seq", "url", "depth", "method", "body_req", "req_hash",
                "referer", "ctx", "tries", "_inm", "_ims",
                F.col("_k.canon_url").alias("canon_url"),
                F.col("_k.host").alias("host"),
                F.col("_k.url_hash").alias("url_hash"))
            badt = t.filter(F.col("canon_url") == "")
            err_parts.append(err_rows(badt, F.lit(cfgmod.ERR_MISSING)))
            t = t.filter(F.col("canon_url") != "")
            t = t.withColumn("_err", self._filters(F.col("canon_url"), F.col("host"), F.col("depth")))
            err_parts.append(err_rows(t.filter(F.col("_err").isNotNull()), F.col("_err")))
            t = t.filter(F.col("_err").isNull()).drop("_err")
            self._ensure_robots(t, batch)
            t = self._robots_gate(t)
            err_parts.append(err_rows(t.filter(~F.col("robots_ok")), F.lit(cfgmod.ERR_ROBOTS)))
            t = t.filter(F.col("robots_ok")).drop("robots_ok")
            t = t.withColumn(
                "needs_mark",
                F.lit(False) if self.cfg.allow_url_revisit
                else F.col("method") == "GET")
            accepted, already = self._check_and_mark(t, batch, f"{tag}hop{hop}")
            err_parts.append(err_rows(already, F.lit(cfgmod.ERR_ALREADY_VISITED)))
            # truncate the per-hop plan chain (few rows; without this
            # the logical plan compounds multiplicatively per hop); the
            # marks count rides the checkpoint job (Observation), so an
            # all-dup hop skips the marks write
            from pyspark.sql import Observation
            mobs = Observation(f"marks_{batch}_{tag}{hop}")
            accepted = accepted.observe(
                mobs, F.sum(F.col("needs_mark").cast("int")).alias("marks"),
            ).localCheckpoint(eager=True)
            if int(mobs.get["marks"] or 0) > 0:
                self._commit_marks_async(accepted, batch, f"{tag}hop{hop}")
            remaining = accepted.select(
                "seq", "url", F.col("canon_url").alias("cur"), "depth", "method",
                "body_req", "req_hash", "referer", "ctx", "tries", "_inm",
                "_ims")
            redir.unpersist()
        done = reduce(lambda a, b: a.unionByName(b), done_parts)
        errs = reduce(lambda a, b: a.unionByName(b), err_parts)
        return done, errs

    # ---- fused parse (phase 4) -----------------------------------------
    def _parse_batch(self, done_raw):
        """ONE Arrow pass over the fetch output: page bodies stream
        through the extraction UDF exactly once and are dropped —
        downstream (trace, link explode, image pairs) sees only compact
        metadata + link/image arrays, so nothing body-sized is ever
        persisted or checkpointed (page bodies cached across actions
        were the engine's memory-pressure hot spot).

        Parse gate: status < 203 ∧ method ≠ HEAD (colly.go:1185-1190) ∧
        Content-Type contains html (colly.go:1087) — enforced inside
        the UDF. Direct image fetches keep their body in ``img_body``
        (tiny subset) for the PSNR validation join.

        Skew note: input partitioning is hash(url) from the fetch join,
        so a hot *domain's* pages are already spread uniformly across
        tasks — no extra repartition needed.
        """
        from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, IntegerType,
                                       LongType, StringType, StructField, StructType)

        out_schema = self.sch["done"]

        max_body = self.cfg.max_body_size
        # ParseStatusCallback (config.go:20,189-190): the gate is
        # REPLACED, not extended — parse_error_response=True parses
        # only status ≥ 400
        parse_err = self.cfg.parse_error_response
        detect_cs = self.cfg.detect_charset

        def _parse(iterator):
            from colly_spark.operators.extract import decode_body, extract_page
            for pdf in iterator:
                links_col, imgs_col, img_body = [], [], []
                for body, ctype, url, status, method, iid in zip(
                        pdf["body"], pdf["content_type"], pdf["final_url"],
                        pdf["status"], pdf["method"], pdf["image_id"]):
                    # X2: transparent gzip (Content-Encoding / .xml.gz)
                    # then MaxBodySize truncation of the DECODED bytes
                    # (io.LimitReader over the gzip reader,
                    # http_backend.go:229-244)
                    body, ctype = decode_body(url, body, ctype, max_body)
                    gate = (status >= 400) if parse_err else (status < 203)
                    if gate and method != "HEAD":
                        links, images = extract_page(
                            url, body, ctype, detect_charset=detect_cs)
                    else:
                        links, images = [], []
                    links_col.append(links)
                    imgs_col.append([{"url": u, "caption": c} for u, c in images])
                    is_img = (ctype or "").startswith("image/") and iid is not None
                    img_body.append(bytes(body) if (is_img and body is not None) else None)
                yield pd.DataFrame({
                    "seq": pdf["seq"], "url": pdf["url"],
                    "final_url": pdf["final_url"], "depth": pdf["depth"],
                    "method": pdf["method"], "status": pdf["status"],
                    "content_type": pdf["content_type"], "image_id": pdf["image_id"],
                    "links": links_col, "imgs": imgs_col, "img_body": img_body,
                    "req_hash": pdf["req_hash"], "from_cache": False,
                    "referer": pdf["referer"], "set_cookie": pdf["set_cookie"],
                    "cache_max_age": pdf["cache_max_age"],
                    "retry_after": pdf["retry_after"], "etag": pdf["etag"],
                    "last_modified": pdf["last_modified"],
                    "ctx": pdf["ctx"],
                    "body_req": pdf["body_req"], "tries": pdf["tries"],
                })

        return done_raw.mapInPandas(_parse, schema=out_schema)

    def _validate_direct_images(self, done_df):
        """Direct image fetches (content_type image/*) validated against
        the payload table: decoded-pixel allclose / PSNR≥40dB + caption
        presence (BASELINE.json input_hint). Vectorized Arrow batch."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import (BooleanType, DoubleType, StringType,
                                       StructField, StructType)

        direct = done_df.filter(F.col("img_body").isNotNull())
        im = self.images.select(
            F.col("image_id").alias("_iid"), F.col("bytes").alias("_ref_bytes"),
            F.col("fmt").alias("_fmt"))
        j = direct.join(F.broadcast(im), direct["image_id"] == im["_iid"], "left")

        val_schema = StructType([
            StructField("image_url", StringType()),
            StructField("image_id", StringType()),
            StructField("ok", BooleanType()),
            StructField("psnr_db", DoubleType()),
        ])

        def _validate(iterator):
            from colly_spark.functions.images import validate_batch
            for pdf in iterator:
                oks, psnrs = validate_batch(
                    pdf["img_body"].tolist(), pdf["_fmt"].tolist(),
                    pdf["_ref_bytes"].tolist(), pdf["_fmt"].tolist())
                yield pd.DataFrame({
                    "image_url": pdf["final_url"], "image_id": pdf["image_id"],
                    "ok": oks, "psnr_db": psnrs,
                })

        return j.select("final_url", "image_id", "img_body", "_ref_bytes", "_fmt") \
                .mapInPandas(_validate, schema=val_schema)

    # ---- state / resume -------------------------------------------------
    # ---- state-store compaction (Iceberg rewrite_data_files analogue) ---
    _STORES = (("visited", "_visited_paths", "url_hash"),
               ("cache", "_cache_paths", "c_hash"),
               ("cookies", "_cookie_paths", "c_host"),
               ("robots", "_robots_paths", "host"))

    def _compact_merge(self, store: str, dirs: list, batch: int,
                       key: str, level: int) -> str:
        """Merge ``dirs`` into one key-bucketed base dir. Bucketing by
        the probe key keeps the compacted base scan-prunable and the
        file count proportional to data volume, not batch count."""
        from pyspark.sql import functions as F

        rows = sum(_parquet_rows(p) for p in dirs)
        n_buckets = max(1, min(self._n_shuffle, rows // 2_000_000 + 1))
        out_dir = os.path.join(self.state, "out", store,
                               f"compact_{batch:06d}_L{level}")
        (self.spark.read.parquet(*dirs)
             .repartition(n_buckets, F.col(key))
             .write.mode("overwrite").parquet(out_dir))
        return out_dir

    def _maybe_compact(self, batch: int) -> None:
        """Leveled compaction of the append-only state stores. Runs
        BEFORE the manifest commit; replaced dirs go to ``_gc_dirs``
        and are deleted only AFTER the commit, so every on-disk state
        the manifest can reference is complete. Rows are rewritten
        verbatim — probe semantics (revisit counts, expiry generations,
        latest-cookie-wins) are row-level and unaffected."""
        self._join_marks()
        if self.compact_every <= 0:
            return
        for store, attr, key in self._STORES:
            paths = getattr(self, attr)
            deltas = [p for p in paths
                      if os.path.basename(p).startswith("batch_")]
            bases = [p for p in paths
                     if os.path.basename(p).startswith("compact_")]
            changed = False
            if len(deltas) >= self.compact_every:
                bases.append(
                    self._compact_merge(store, deltas, batch, key, level=0))
                self._gc_dirs.extend(deltas)
                deltas, changed = [], True
            if len(bases) >= self.compact_major_bases:
                merged = self._compact_merge(store, bases, batch, key, level=1)
                self._gc_dirs.extend(bases)
                bases, changed = [merged], True
            if changed:
                setattr(self, attr, bases + deltas)
                if store == "robots" and self._lazy_robots:
                    self.robots = self.spark.read.parquet(*(bases + deltas))

    def _gc_replaced(self) -> None:
        """Delete delta dirs replaced by a committed compaction. Safe
        only after _commit: the manifest no longer references them."""
        for d in self._gc_dirs:
            shutil.rmtree(d, ignore_errors=True)
        self._gc_dirs.clear()

    def _write_empty(self, target_dir: str, schema_key: str) -> None:
        """Write an empty sink/snapshot dir WITHOUT a Spark job. The
        first empty write per (process, schema) materializes a template
        via a real Spark write — so the on-disk layout is exactly what
        every other batch produces (_SUCCESS + typed parquet footer) —
        and later empty writes driver-copy it. In the politeness-
        bounded many-small-batch regime, frontier / pending / errors
        are routinely empty and each saved write is a full job
        round-trip off the per-batch floor. Deterministic recompute
        repeats the same decision, so resume stays exact."""
        tmpl = os.path.join(self.state, "empty_tmpl", schema_key)
        if schema_key not in self._tmpl_ready:
            # (re)written once per process, so schema drift across
            # engine versions can't leak a stale template out of an
            # old state dir
            (self.spark.createDataFrame([], self.sch[schema_key])
                 .coalesce(1).write.mode("overwrite").parquet(tmpl))
            self._tmpl_ready.add(schema_key)
        shutil.rmtree(target_dir, ignore_errors=True)
        shutil.copytree(tmpl, target_dir)

    def _crawl_delay_table(self):
        """(host, _cd_ms) for every host whose robots.txt advertises a
        Crawl-delay for this collector's UserAgent group (temoto
        CrawlDelay semantics, capped at cfg.crawl_delay_cap_s — an
        absurd advertised delay must not park a host forever). Host-
        cardinality table, MATERIALIZED ONCE PER ROBOTS-STORE VERSION:
        the table is a pure function of the robots table, and every
        code path that changes that store reassigns ``self.robots``
        (lazy-fetch delta, compaction reload, resume), so the cache is
        keyed on the table's identity — corpus mode computes it once
        for the whole crawl, live mode only when robots for a new host
        actually arrived. Uncached, the two per-batch consumers
        (admission quota + hosthealth spacing) re-ran the full robots
        scan + parse UDF every batch — pure fixed overhead in the
        politeness-bounded regime. Broadcast-joined onto the
        admission pool."""
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.types import DoubleType

        if self.robots is None:
            return None
        cached = self._cd_cache
        if cached is not None and cached[0] is self.robots:
            return cached[1]
        ua = self.cfg.user_agent
        cap = float(max(0, self.cfg.crawl_delay_cap_s))

        @F.pandas_udf(DoubleType())
        def _cd(bodies: pd.Series) -> pd.Series:
            from colly_spark.operators.robots import crawl_delay_of
            return bodies.map(lambda b: crawl_delay_of(b, ua))

        tbl = (self.robots
               .filter(~F.coalesce(F.col("fetch_error"), F.lit(False)))
               .withColumn("_cd_s", _cd(F.col("body")))
               .filter(F.col("_cd_s").isNotNull() & (F.col("_cd_s") > 0))
               .select("host",
                       (F.least(F.col("_cd_s"), F.lit(cap)) * 1000)
                       .cast("int").alias("_cd_ms"))
               .localCheckpoint(eager=True))
        # holding the robots ref in the key also pins it against id
        # reuse; the previous checkpoint is released with the old ref
        self._cd_cache = (self.robots, tbl)
        return tbl

    def _update_host_health(self, fetch_now, done, fetch_errors,
                            batch: int) -> int:
        """Per-host health bookkeeping — the circuit breaker
        (host_error_budget) and Retry-After back-pressure
        (respect_retry_after) share one (host, consec, blocked_until)
        table. Breaker: a host whose attempts ALL transport-errored
        extends its consecutive-failed-batch count, any success
        resets it, budget exhaustion trips a cooldown block.
        Retry-After: a final 429/503 carrying the header blocks its
        host for ceil(r·1000/batch_window_ms) batches (capped at
        retry_after_cap_batches), max-merged with any breaker block.
        The table is snapshotted per batch (snap/hosthealth_N, the
        frontier/pending discipline) so resume and rollback see it;
        it holds ACTIVE hosts only, so it stays tiny. Returns the
        number of currently blocked hosts (driver-side pyarrow count
        of the just-written snapshot — no extra Spark action)."""
        import glob as _glob

        import pyarrow.parquet as _pq
        from pyspark.sql import functions as F

        budget = self.cfg.host_error_budget
        cooldown = self.cfg.host_cooldown_batches
        prev = self._host_health if self._host_health is not None else \
            self.spark.createDataFrame([], self.sch["hosthealth"])
        att = fetch_now.select("seq", "host")
        if budget > 0:
            outcomes = (fetch_errors
                        .filter(F.col("kind") == cfgmod.ERR_MISSING)
                        .select("seq", F.lit(1).alias("e"))
                        .unionByName(done.select("seq", F.lit(0).alias("e")))
                        .join(att, "seq")
                        .groupBy("host")
                        .agg(F.min("e").alias("all_err")))
            merged = prev.join(outcomes, "host", "full").select(
                "host",
                F.when(F.col("all_err") == 0, F.lit(0))
                 .when(F.col("all_err") == 1,
                       F.coalesce(F.col("consec"), F.lit(0)) + 1)
                 .otherwise(F.coalesce(F.col("consec"), F.lit(0)))
                 .alias("c2"),
                F.coalesce(F.col("blocked_until"), F.lit(-1)).alias("b2"))
            tripped = F.col("c2") >= budget
            health = merged.select(
                "host",
                F.when(tripped, F.lit(0)).otherwise(F.col("c2"))
                 .cast("int").alias("consec"),
                F.when(tripped, F.lit(batch + 1 + cooldown))
                 .otherwise(F.col("b2")).cast("int").alias("blocked_until"))
        else:
            health = prev
        if self.cfg.respect_retry_after and "retry_after" in done.columns:
            # server back-pressure: a FINAL 429/503 with Retry-After r
            # blocks its host for ceil(r·1000/window) batches (capped) —
            # max-merged with any breaker block already standing
            win = max(1, self.cfg.batch_window_ms)
            cap = self.cfg.retry_after_cap_batches
            ra = (done
                  .filter(F.col("status").isin(429, 503)
                          & F.col("retry_after").isNotNull())
                  .join(att, "seq")
                  .groupBy("host")
                  .agg(F.max("retry_after").alias("ra_s")))
            ra = ra.select(
                "host",
                (F.lit(batch + 1) + F.least(
                    F.lit(cap),
                    F.ceil(F.col("ra_s") * 1000 / F.lit(win)).cast("int"))
                 ).cast("int").alias("ra_until"))
            health = health.join(ra, "host", "full").select(
                "host",
                F.coalesce(F.col("consec"), F.lit(0))
                 .cast("int").alias("consec"),
                F.greatest(F.coalesce(F.col("blocked_until"), F.lit(-1)),
                           F.coalesce(F.col("ra_until"), F.lit(-1)))
                 .cast("int").alias("blocked_until"))
        if self.cfg.respect_crawl_delay:
            # robots Crawl-delay spacing: a host that actually FETCHED
            # this batch (cache replays excluded — no request went
            # out) with cd > window may not fetch again until
            # batch + ceil(cd/window) — max-merged with any standing
            # breaker / Retry-After block
            cds = self._crawl_delay_table()
            win = max(1, self.cfg.batch_window_ms)
            if cds is not None:
                fetched_hosts = (done.filter(~F.col("from_cache"))
                                 .join(att, "seq")
                                 .select("host").distinct())
                cdb = (fetched_hosts.join(cds, "host")
                       .filter(F.col("_cd_ms") > win)
                       .select(
                           "host",
                           (F.lit(batch) + F.ceil(
                               F.col("_cd_ms") / F.lit(win)).cast("int"))
                           .cast("int").alias("cd_until")))
                health = health.join(cdb, "host", "full").select(
                    "host",
                    F.coalesce(F.col("consec"), F.lit(0))
                     .cast("int").alias("consec"),
                    F.greatest(F.coalesce(F.col("blocked_until"), F.lit(-1)),
                               F.coalesce(F.col("cd_until"), F.lit(-1)))
                     .cast("int").alias("blocked_until"))
        health = health.filter((F.col("consec") > 0)
                               | (F.col("blocked_until") > batch + 1))
        out_dir = os.path.join(self.state, "snap",
                               f"hosthealth_{batch:06d}")
        health.coalesce(1).write.mode("overwrite").parquet(out_dir)
        self._host_health = self.spark.read.parquet(out_dir)
        n_blocked = 0
        for f_ in _glob.glob(os.path.join(out_dir, "*.parquet")):
            vals = _pq.read_table(
                f_, columns=["blocked_until"]).column(
                "blocked_until").to_pylist()
            n_blocked += sum(1 for v in vals if v > batch + 1)
        return n_blocked

    def _manifest_path(self):
        return os.path.join(self.state, "MANIFEST.json")

    def _commit(self, batch: int, next_seq: int):
        """Write the manifest — the commit point. Must run only after
        all of the batch's sink/snapshot writes have completed. Carries
        the live path list of every state store (relative), so a resume
        reads exactly the committed file set — the Iceberg snapshot's
        data-file list analogue — and compaction leftovers are
        identifiable garbage."""
        self._join_marks()

        def rel(ps):
            return [os.path.relpath(p, self.state) for p in ps]

        # per-partition lineage (north rule: "checkpoints ... with
        # per-partition lineage + metrics"): every live state-store dir
        # carries its producing batch + per-part-file row counts, so a
        # resume can prove the bytes it loads are the bytes that were
        # committed. Incremental: only dirs new since the last commit
        # are footer-scanned; dropped (compacted-away) dirs leave the
        # cache. Driver-side pyarrow reads — no Spark jobs.
        live_paths = (self._visited_paths + self._cache_paths
                      + self._cookie_paths + self._robots_paths)
        for p in live_paths:
            if p not in self._lineage:
                self._lineage[p] = _dir_lineage(p)
        keep = set(live_paths)
        self._lineage = {p: v for p, v in self._lineage.items() if p in keep}
        lineage = {os.path.relpath(p, self.state): v
                   for p, v in self._lineage.items()}
        man = {"batch": batch, "next_seq": next_seq,
               "stores": {"visited": rel(self._visited_paths),
                          "cache": rel(self._cache_paths),
                          "cookies": rel(self._cookie_paths),
                          "robots": rel(self._robots_paths)},
               "lineage": lineage}
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path())
        # snapshot log (Iceberg metadata-log analogue): every commit
        # appends its full manifest, so any retained snapshot can be
        # rolled back to (rollback()) or time-travel-read
        # (CrawlHandles as_of). Append-only; a batch recomputed after
        # a crash/rollback appends again and the LAST entry per batch
        # wins. O(100 bytes + lineage) per line — metadata-scale.
        with open(os.path.join(self.state, "SNAPSHOTS.jsonl"), "a") as f:
            f.write(json.dumps(
                {"committed_at": round(time.time(), 3), **man}) + "\n")

    def _load_resume(self):
        """Returns (start_batch, next_seq, frontier_df, pending_df) or
        None when no committed state exists."""
        import glob as _glob
        if not os.path.exists(self._manifest_path()):
            return None
        with open(self._manifest_path()) as f:
            man = json.load(f)
        b = man["batch"]
        # prune any half-written artifacts from a batch after the commit
        # point (deterministic recompute overwrites them anyway; pruning
        # keeps visited exact)
        for d in _glob.glob(os.path.join(self.state, "out", "*", "batch_*")):
            tag = os.path.basename(d).split("_")[1]
            if int(tag) > b:
                shutil.rmtree(d, ignore_errors=True)
        stores = man.get("stores")
        if stores is not None:
            # the manifest's path list IS the committed file set; any
            # other dir under a state store is garbage (a replaced
            # pre-compaction delta or a post-crash partial compact)
            for store, attr, _key in self._STORES:
                live = [os.path.join(self.state, p) for p in stores[store]]
                setattr(self, attr, live)
                keep = {os.path.abspath(p) for p in live}
                for d in _glob.glob(os.path.join(self.state, "out", store, "*")):
                    if os.path.isdir(d) and os.path.abspath(d) not in keep:
                        shutil.rmtree(d, ignore_errors=True)
            # verify per-partition lineage: the committed manifest says
            # exactly which part files each live dir must contain and
            # how many rows each holds — footer-check them so a resume
            # that would silently diverge (truncated copy, lost part
            # file, foreign overwrite) fails loudly instead
            for relp, want in man.get("lineage", {}).items():
                absp = os.path.join(self.state, relp)
                got = _dir_lineage(absp)
                if got["files"] != want["files"]:
                    raise RuntimeError(
                        f"state lineage mismatch in {relp}: committed "
                        f"{want['rows']} rows across "
                        f"{len(want['files'])} part files, found "
                        f"{got['rows']} across {len(got['files'])}")
                self._lineage[absp] = want
            if self._lazy_robots and self._robots_paths:
                self.robots = self.spark.read.parquet(*self._robots_paths)
        else:
            # pre-stores manifest (older state dir): glob order = commit
            # order, no compaction to reconcile
            self._visited_paths = sorted(
                _glob.glob(os.path.join(self.state, "out", "visited", "batch_*")))
            self._cache_paths = sorted(
                _glob.glob(os.path.join(self.state, "out", "cache", "batch_*")))
            self._cookie_paths = sorted(
                _glob.glob(os.path.join(self.state, "out", "cookies", "batch_*")))
        self._visited_rows = sum(_parquet_rows(p) for p in self._visited_paths)
        # seen segments (Bloom or cuckoo) = pure function of the visited
        # set → rebuild (deployment: Iceberg-snapshot the segments instead)
        shutil.rmtree(self.bloom.dir, ignore_errors=True)
        os.makedirs(self.bloom.dir, exist_ok=True)
        self._bloom_active = (self._bloom_threshold <= 0
                              or self._visited_rows >= self._bloom_threshold)
        if self._bloom_active and self._visited_paths:
            self._seen_update(self._visited_df())
        frontier = self.spark.read.parquet(os.path.join(self.state, "snap", f"frontier_{b:06d}"))
        pending = self.spark.read.parquet(os.path.join(self.state, "snap", f"pending_{b:06d}"))
        hh = os.path.join(self.state, "snap", f"hosthealth_{b:06d}")
        self._host_health = (self.spark.read.parquet(hh)
                             if os.path.isdir(hh) else None)
        return b + 1, man["next_seq"], frontier, pending

    # ---- the drive loop --------------------------------------------------
    def bootstrap(self, seeds) -> None:
        """Initialize crawl state from a seed list (submission order;
        url strings, (url, method, body_bytes) tuples, or
        (url, method, body_bytes, depth) tuples — the 4-ary form is
        what a deserialized queue request carries, UnmarshalRequest
        colly.go:560-587 preserving Depth. A 5-ary
        (url, method, body, depth, ctx) form seeds a generic request
        Context — dict or functions.context.Context — inherited by
        every descendant request, context.go:22-88)."""
        rows, next_seq = self._seed_rows(seeds, 0)
        self._frontier = self.spark.createDataFrame(rows, self.sch["frontier"])
        self._pending = self.spark.createDataFrame([], self.sch["pending"])
        if self.live is not None and any(r[4] is not None for r in rows):
            from pyspark.sql import functions as F
            self._live_bodies = self._frontier.filter(
                F.col("body_req").isNotNull()).select("seq", "body_req")
        self._batch, self._next_seq = 0, next_seq
        self._n_frontier, self._n_pending = len(rows), 0
        self._host_health = None
        self._metrics: list = []
        if self.cfg.initial_cookies and self._has_cookies:
            # SetCookies (colly.go:1243-1253): commit the seeded jar
            # as a pre-crawl delta at logical batch -1 so any in-crawl
            # Set-Cookie for the same (host, name) overrides it
            ck_dir = os.path.join(self.state, "out", "cookies",
                                  "batch_000000_seedjar")
            self.spark.createDataFrame(
                [(h, n, v, -1) for (h, n, v) in self.cfg.initial_cookies],
                "c_host string, c_name string, c_value string, c_batch int"
            ).coalesce(1).write.mode("overwrite").parquet(ck_dir)
            self._cookie_paths.append(ck_dir)

    @staticmethod
    def _seed_rows(seeds, start_seq: int):
        from colly_spark.functions.context import ctx_json

        rows, next_seq = [], start_seq
        for s in seeds or []:
            depth, ctx = 1, None
            if isinstance(s, str):
                url, method, body = s, "GET", None
            elif len(s) == 5:
                url, method, body, depth, ctx = s
            elif len(s) == 4:
                url, method, body, depth = s
            else:
                url, method, body = s
            rows.append((next_seq, url, int(depth), method, body, None,
                         ctx_json(ctx), False, 0))
            next_seq += 1
        return rows, next_seq

    def submit(self, seeds) -> int:
        """Queue additional requests onto already-initialized state —
        the reference's repeated ``Visit`` / ``queue.Add`` analogue
        (colly.go Visit re-entrancy; queue/queue.go:84-109 Add*). Seeds
        take the same forms bootstrap accepts and get dense seqs after
        the current ``next_seq``, so per-domain FIFO ordering extends
        across submissions exactly like the reference's shared queue.

        This is also the revisit half of recrawl scheduling:
        ``load_state() → forget_visited(due) → submit(due_urls) →
        while step(): pass`` re-crawls exactly the due set under
        normal dedup/politeness. NOTE: ``run(resume=True)`` re-loads
        the committed frontier snapshot and would DISCARD rows queued
        by an earlier submit() — for the one-call form pass the seeds
        to run itself (``run(due_urls, resume=True)``), which loads
        state first and submits after. Returns the number queued."""
        rows, next_seq = self._seed_rows(seeds, self._next_seq)
        if not rows:
            return 0
        new = self.spark.createDataFrame(rows, self.sch["frontier"])
        self._frontier = (new if self._n_frontier == 0
                          else self._frontier.unionByName(new))
        self._n_frontier += len(rows)
        self._next_seq = next_seq
        if self.live is not None:
            from pyspark.sql import functions as F
            bodies = self._frontier.filter(
                F.col("body_req").isNotNull()).select("seq", "body_req")
            self._live_bodies = bodies if not bodies.isEmpty() else None
        return len(rows)

    def load_state(self) -> None:
        """Load crawl state from the last committed manifest (resume)."""
        loaded = self._load_resume()
        if loaded is None:
            raise ValueError(f"resume requested but no MANIFEST in {self.state}")
        self._batch, self._next_seq, self._frontier, self._pending = loaded
        self._n_frontier = self._frontier.count()
        self._n_pending = self._pending.count()
        if self.live is not None:
            from pyspark.sql import functions as F
            bodies = self._frontier.filter(
                F.col("body_req").isNotNull()).select("seq", "body_req")
            self._live_bodies = bodies if not bodies.isEmpty() else None
        # restore the committed per-batch metrics history (the
        # north-star checkpoint carries "fetch/dedup metrics"): each
        # batch persisted its dict as out/metrics_N.json before use —
        # only batches ≤ the manifest commit point count (a post-crash
        # metrics file from an uncommitted batch is recomputed anyway)
        self._metrics = _read_metrics(os.path.join(self.state, "out"),
                                      self._batch - 1)

    def handles(self) -> CrawlHandles:
        h = CrawlHandles(self.spark, os.path.join(self.state, "out"))
        h.metrics = self._metrics
        return h

    def run(self, seeds=None, max_batches: int = 10_000, resume: bool = False) -> CrawlHandles:
        """Drain the frontier to empty (or max_batches). With
        ``resume=True``, continues from the last committed batch;
        seeds passed alongside resume are submit()-ed on top of the
        restored frontier (the repeated-Visit form)."""
        if resume:
            self.load_state()
            if seeds:
                self.submit(seeds)
        else:
            self.bootstrap(seeds)
        while self._batch < max_batches:
            if not self.step():
                break
        return self.handles()

    def step(self) -> bool:
        """Execute exactly one micro-batch from committed state.
        Returns False (no-op) once frontier ∧ pending are empty —
        the queue-drain termination condition (queue/queue.go:169-175).
        Called by run() in a loop, or once per Structured Streaming
        tick by streaming/drain.run_streaming_drain."""
        from pyspark.sql import functions as F

        spark = self.spark
        if self._n_frontier == 0 and self._n_pending == 0:
            return False
        batch, next_seq = self._batch, self._next_seq
        frontier, pending = self._frontier, self._pending
        m = dict(batch=batch, submitted=self._n_frontier, admitted=0, fetched=0,
                 deferred=0, errors=0, new_links=0)
        _t = time.time()

        def _lap(key):
            nonlocal _t
            now = time.time()
            m[key] = round(now - _t, 2)
            _t = now
        # 1+2. admission ∪ politeness quota — ONE eager checkpoint
        # (truncates the DAG so downstream plans stay bounded regardless
        # of driver heap) and ONE count job for both metrics
        fetch_now, deferred, adm_errors, counts = self._admit(frontier, pending, batch)
        m["admitted"] = counts["admitted"]
        m["deferred"] = counts["deferred"]
        _lap("t_admit")
        # F9 per-request abort: matched rows were seen-marked at
        # admission but are silently dropped before the fetch
        # (colly.go:655-657 — no error callback)
        if self.cfg.abort_url_filters:
            abort_hit = reduce(
                lambda a, b: a | b,
                (F.col("canon_url").rlike(p) for p in self.cfg.abort_url_filters))
            fetch_now = fetch_now.filter(~abort_hit)
        _lap("t_quota")
        # zero-fetch batch (everything deferred/rejected — the common
        # shape in a politeness-bounded drain): skip the cache probe,
        # the fetch join and the whole redirect-hop machinery — their
        # jobs on empty inputs were the largest slice of the per-batch
        # floor. The count rode the admission checkpoint (Observation).
        skip_fetch = counts["fetch_now"] == 0
        cache_hits_done = None
        reval_payload = None
        if skip_fetch:
            done = spark.createDataFrame([], self.sch["done"])
            fetch_errors = spark.createDataFrame([], self.sch["error"])
            cache = stale = None
        else:
            # 3a. X4 response-cache probe: GET rows with a valid cached
            # entry skip the fetch/redirect/parse path entirely
            cache, stale = self._cache_probe_tables(batch)
        if cache is not None:
            # broadcast decision keyed on the CACHE's own row count
            # (its rows carry c_links/c_imgs/c_img_body — heavy), not
            # the visited count, which is a different table entirely
            probe = fetch_now.join(
                F.broadcast(cache) if self._cache_rows < 2_000_000 else cache,
                (fetch_now["url_hash"] == cache["c_hash"])
                & (fetch_now["method"] == "GET"), "left")
            cache_hits_done = probe.filter(F.col("c_hash").isNotNull()).select(
                "seq", F.col("canon_url").alias("url"),
                F.col("c_final_url").alias("final_url"), "depth", "method",
                F.col("c_status").alias("status"),
                F.col("c_content_type").alias("content_type"),
                F.col("c_image_id").alias("image_id"),
                F.col("c_links").alias("links"), F.col("c_imgs").alias("imgs"),
                F.col("c_img_body").alias("img_body"),
                F.col("url_hash").alias("req_hash"),
                F.lit(True).alias("from_cache"), "referer",
                # replayed cache hits never re-set cookies (the jar
                # lives at the HTTP layer; cache hits bypass Do())
                F.lit(None).cast("string").alias("set_cookie"),
                F.lit(None).cast("int").alias("cache_max_age"),
                # cache hits never replay back-pressure: the stored
                # entry was a successful fetch (429/503 are 4xx/5xx —
                # 5xx never stored; a stored 429's Retry-After already
                # acted when it was fetched)
                F.lit(None).cast("int").alias("retry_after"),
                # replays carry no fresh validators (nothing to store —
                # from_cache rows never reach the cache writer anyway)
                F.lit(None).cast("string").alias("etag"),
                F.lit(None).cast("string").alias("last_modified"),
                # ctx/body/tries are per-REQUEST state: a replay keeps
                # the requesting row's, not the original fetcher's
                "ctx", "body_req", "tries")
            fetch_now_eff = probe.filter(F.col("c_hash").isNull()).select(fetch_now.columns)
        else:
            fetch_now_eff = fetch_now
        if stale is not None:
            # 3a'. RFC 9111 §4.3 revalidation (cache_revalidate): rows
            # whose latest entry is STALE but validator-carrying go out
            # CONDITIONAL — attach If-None-Match from the stored ETag
            # (light 2-column broadcast); the heavy replay payload
            # stays aside and joins only the 304s after the fetch
            sv = stale.select("c_hash", "c_etag", "c_lastmod")
            probe2 = fetch_now_eff.join(
                F.broadcast(sv),
                (fetch_now_eff["url_hash"] == sv["c_hash"])
                & (fetch_now_eff["method"] == "GET"), "left")
            fetch_now_eff = (probe2.withColumn("_inm", F.col("c_etag"))
                             .withColumn("_ims", F.col("c_lastmod"))
                             .drop("c_hash", "c_etag", "c_lastmod"))
            reval_payload = stale
        # 3b. fetch + redirects + fused parse — the eager checkpoint
        # materializes the compact (body-free) parsed output once.
        # X5 CheckHead: HEAD copies fetch first; only seqs whose HEAD
        # succeeded proceed to the GET (colly.go:492-497)
        if skip_fetch:
            pass  # done/fetch_errors pre-built empty above
        elif self.cfg.check_head:
            gets = fetch_now_eff.filter(F.col("method") == "GET")
            others = fetch_now_eff.filter(F.col("method") != "GET")
            head_rows = gets.withColumn("method", F.lit("HEAD"))
            done_head, head_errors = self._fetch(head_rows, batch, tag="head_")
            done_head = done_head.localCheckpoint(eager=True)
            ok_seqs = done_head.select("seq")
            gated = gets.join(ok_seqs, "seq", "left_semi")
            done_get, fetch_errors = self._fetch(gated.unionByName(others), batch)
            done = done_head.unionByName(done_get)
            fetch_errors = fetch_errors.unionByName(head_errors)
        else:
            done, fetch_errors = self._fetch(fetch_now_eff, batch)
        if reval_payload is not None:
            # 304 Not Modified → replay the stored entry's final
            # response (status/links/images), body-free. from_cache
            # stays False so the store below REFRESHES the entry with
            # a new c_created + the 304's own caching headers (the
            # done row's cache_max_age/etag came from the live join).
            rp = reval_payload.select(
                F.col("c_hash").alias("_rh"),
                F.col("c_final_url").alias("_rfinal"),
                F.col("c_status").alias("_rstatus"),
                F.col("c_content_type").alias("_rct"),
                F.col("c_image_id").alias("_riid"),
                F.col("c_links").alias("_rlinks"),
                F.col("c_imgs").alias("_rimgs"),
                F.col("c_img_body").alias("_rimgb"))
            rp = F.broadcast(rp) if self._cache_rows < 2_000_000 else rp
            done = done.join(
                rp, (done["req_hash"] == F.col("_rh"))
                & (done["status"] == 304), "left")
            hit304 = F.col("_rh").isNotNull()

            def _swap(col, repl):
                return F.when(hit304, repl).otherwise(F.col(col)).alias(col)

            done = done.select(
                "seq", "url", _swap("final_url", F.col("_rfinal")), "depth",
                "method", _swap("status", F.col("_rstatus")),
                _swap("content_type", F.col("_rct")),
                _swap("image_id", F.col("_riid")),
                _swap("links", F.col("_rlinks")),
                _swap("imgs", F.col("_rimgs")),
                _swap("img_body", F.col("_rimgb")),
                "req_hash", "from_cache", "referer", "set_cookie",
                "cache_max_age", "retry_after", "etag", "last_modified",
                "ctx", "body_req", "tries", hit304.alias("revalidated"))
        if cache_hits_done is not None:
            if reval_payload is not None:
                cache_hits_done = cache_hits_done.withColumn(
                    "revalidated", F.lit(False))
            done = done.unionByName(cache_hits_done)
        if skip_fetch:
            # zero-fetch batch: done is empty by construction — no
            # checkpoint/observe job needed
            done_counts = {"fetched": 0, "cache_hits": 0}
        else:
            # fetched/cache-hit counts ride the checkpoint job
            # (Observation)
            from pyspark.sql import Observation
            done_obs = Observation(f"done_{batch}")
            obs_aggs = [
                F.count(F.lit(1)).alias("fetched"),
                F.sum(F.when(F.col("from_cache"), 1).otherwise(0)).alias("cache_hits"),
            ]
            if reval_payload is not None:
                obs_aggs.append(F.sum(
                    F.when(F.col("revalidated"), 1).otherwise(0)
                ).alias("revalidated"))
            done = done.observe(done_obs, *obs_aggs).localCheckpoint(eager=True)
            done_counts = done_obs.get
            if reval_payload is not None:
                done = done.drop("revalidated")
        fresh_fetches = (int(done_counts["fetched"] or 0)
                         - int(done_counts["cache_hits"] or 0))
        if self.cfg.cache_enabled:
            m["cache_hits"] = int(done_counts["cache_hits"] or 0)
        if self.cfg.cache_enabled and getattr(self.cfg, "cache_revalidate", False):
            m["revalidated"] = int(done_counts.get("revalidated") or 0)
        if self.cfg.cache_enabled and fresh_fetches > 0:
            # store: GET, never 5xx, fresh fetches only. Skipped
            # entirely when the batch produced no fresh fetches — an
            # empty delta dir would otherwise be appended and re-read
            # by every later batch's probe (deterministic recompute
            # repeats the same skip, so resume stays exact)
            to_store = done.filter(
                (F.col("method") == "GET") & (F.col("status") < 500)
                & (F.col("status") > 0) & ~F.col("from_cache"))
            cache_dir = os.path.join(self.state, "out", "cache", f"batch_{batch:06d}")
            to_store.select(
                F.col("req_hash").alias("c_hash"),
                F.col("final_url").alias("c_final_url"),
                F.col("status").alias("c_status"),
                F.col("content_type").alias("c_content_type"),
                F.col("image_id").alias("c_image_id"),
                F.col("links").alias("c_links"), F.col("imgs").alias("c_imgs"),
                F.col("img_body").alias("c_img_body"),
                # response validators: let a stale entry revalidate
                # (If-None-Match / If-Modified-Since) instead of
                # refetching the body
                F.col("etag").alias("c_etag"),
                F.col("last_modified").alias("c_lastmod"),
                F.lit(batch).alias("c_created"),
                # by-header expiry (response.go:108-149): the response's
                # max-age in logical batches; NULL when no header —
                # under the header policy such entries never replay
                # (cacheExpByHeader's zero expiry = already expired)
                F.when(
                    F.col("cache_max_age").isNotNull(),
                    F.lit(batch) + F.ceil(
                        F.col("cache_max_age") * 1000
                        / F.lit(self.cfg.batch_window_ms))
                ).cast("long").alias("c_expiry"),
            ).write.mode("overwrite").parquet(cache_dir)
            self._cache_paths.append(cache_dir)
        if self._has_cookies and fresh_fetches > 0:
            # commit this batch's Set-Cookie rows — visible from the
            # next batch on (cookiejar.go:23-60; cache replays
            # excluded, so a batch with no fresh fetches has nothing
            # to commit — skip the write job + empty delta dir)
            ck_dir = os.path.join(self.state, "out", "cookies", f"batch_{batch:06d}")
            done.filter(F.col("set_cookie").isNotNull() & ~F.col("from_cache")).select(
                F.regexp_extract("final_url", "^[a-z]+://([^/]+)", 1).alias("c_host"),
                F.substring_index("set_cookie", "=", 1).alias("c_name"),
                F.expr("substring(set_cookie, instr(set_cookie, '=') + 1)").alias("c_value"),
                F.lit(batch).alias("c_batch"),
            ).dropDuplicates(["c_host", "c_name", "c_value"]) \
             .write.mode("overwrite").parquet(ck_dir)
            self._cookie_paths.append(ck_dir)
        # X6 http-trace plumbing (http_trace.go:9-37): per-request
        # connect/first-byte timings. No network here → deterministic
        # synthetic latencies derived from the request hash (the column
        # shape and metrics rollup are what deployment inherits).
        if self.cfg.proxies:
            parr = F.array(*[F.lit(p) for p in self.cfg.proxies])
            proxy_expr = F.element_at(
                parr, (F.pmod(F.col("seq"), F.lit(len(self.cfg.proxies))) + 1).cast("int"))
        else:
            proxy_expr = F.lit(None).cast("string")
        ua_trace = self._ua_expr() if not self.cfg.user_agents else (
            F.element_at(
                F.array(*[F.lit(u) for u in self.cfg.user_agents]),
                (F.pmod(F.col("req_hash") + F.lit(self.cfg.seed),
                        F.lit(len(self.cfg.user_agents))) + 1).cast("int")))
        trace = done.select(
            F.lit(batch).alias("batch"), "seq", "url", "final_url", "depth",
            hostname_udf(F.col("final_url")).alias("host"), "status", "method",
            "referer",
            (F.pmod(F.col("req_hash"), F.lit(97)).cast("double") / 10.0 + 1.0).alias("connect_ms"),
            (F.pmod(F.col("req_hash"), F.lit(331)).cast("double") / 10.0 + 5.0).alias("ttfb_ms"),
            ua_trace.alias("ua"), proxy_expr.alias("proxy"), "ctx")
        m["fetched"] = int(done_counts["fetched"] or 0)
        _lap("t_fetch")
        # http status errors (recorded, not counted in m["errors"] —
        # simulator parity)
        http_errors = done.filter(F.col("status") >= 400).select(
            F.lit(batch).alias("batch"), "seq", F.col("url"),
            F.concat(F.lit("http_"), F.col("status")).alias("kind"))
        # 4. link/image projection off the checkpointed compact rows
        links = done.select(
            F.col("seq").alias("parent_seq"), (F.col("depth") + 1).alias("depth"),
            F.col("final_url").alias("referer"),
            # Request.Visit passes the parent's Ctx to the child
            # (request.go:151-153) — links inherit it verbatim
            "ctx",
            F.posexplode("links").alias("link_idx", "url"))
        page_images = done.select(
            F.col("final_url").alias("page_url"), F.explode("imgs").alias("im")
        ).select("page_url", F.col("im.url").alias("image_url"),
                 F.col("im.caption").alias("caption"))
        if self._has_images:
            direct_images = self._validate_direct_images(done)
        else:
            from pyspark.sql.types import (BooleanType, DoubleType, StringType,
                                           StructField, StructType)
            direct_images = spark.createDataFrame([], StructType([
                StructField("image_url", StringType()),
                StructField("image_id", StringType()),
                StructField("ok", BooleanType()),
                StructField("psnr_db", DoubleType()),
            ]))
        images_out = page_images.select(
            F.lit(batch).alias("batch"),
            F.col("page_url"), "image_url",
            F.lit(None).cast("string").alias("image_id"),
            "caption", F.lit(None).cast("boolean").alias("ok"),
            F.lit(None).cast("double").alias("psnr_db"),
        ).unionByName(direct_images.select(
            F.lit(batch).alias("batch"),
            F.lit(None).cast("string").alias("page_url"),
            "image_url", "image_id",
            F.lit(None).cast("string").alias("caption"), "ok", "psnr_db"))
        # 5. dense discovery seqs for new links → next frontier.
        # dense_seq's own per-partition count pass doubles as the
        # emptiness check (a separate links.isEmpty() was one more job)
        # — and a zero-fetch batch has no links by construction, so it
        # skips even that count job
        queue_full_errors = spark.createDataFrame([], self.sch["error"])
        if skip_fetch:
            n_new = 0
        else:
            seq_links, next_seq_after = dense_seq(
                links, ["parent_seq", "link_idx"], out_col="seq", start=next_seq)
            n_new = next_seq_after - next_seq
        if n_new == 0:
            new_frontier = spark.createDataFrame([], self.sch["frontier"])
        else:
            # S6 frontier capacity: keep the first (max_queue_size −
            # pending) links in discovery order, drop the rest with
            # ErrQueueFull (queue/queue.go:35, storage/mem/fifo.go:188)
            cap = self.cfg.max_queue_size
            if cap > 0:
                allowed_new = max(0, cap - m["deferred"])
                if n_new > allowed_new:
                    cutoff = next_seq + allowed_new
                    queue_full_errors = seq_links.filter(F.col("seq") >= cutoff).select(
                        F.lit(batch).alias("batch"), "seq", F.col("url"),
                        F.lit(cfgmod.ERR_QUEUE_FULL).alias("kind"))
                    seq_links = seq_links.filter(F.col("seq") < cutoff)
                    n_new = allowed_new
            new_frontier = seq_links.select(
                "seq", "url", "depth", F.lit("GET").alias("method"),
                F.lit(None).cast("binary").alias("body_req"), "referer", "ctx",
                F.lit(False).alias("no_revisit"), F.lit(0).alias("tries"))
            next_seq = next_seq + n_new
        m["new_links"] = n_new
        # Request.Retry (request.go:190-198): final GET/POST responses
        # with a retry-policy status re-enter the next batch's frontier
        # at the same depth with the same parameters, bypassing
        # check-and-mark; seqs are assigned after this batch's links,
        # in original-seq order; capacity guard does not apply (retries
        # re-enter via scrape, not queue.Add)
        n_retries = 0
        if self.cfg.retry_http_statuses and not skip_fetch:
            retry_src = done.filter(
                F.col("status").isin(*self.cfg.retry_http_statuses)
                & (F.col("tries") < F.lit(self.cfg.max_retries))
                & (F.col("method") != "HEAD")
            ).select(
                F.col("seq").alias("orig_seq"), F.col("final_url").alias("url"),
                "depth", "method", "body_req", "referer", "ctx",
                (F.col("tries") + 1).alias("tries"))
            seq_retries, next_seq2 = dense_seq(
                retry_src, ["orig_seq"], out_col="seq", start=next_seq)
            n_retries = next_seq2 - next_seq
            if n_retries > 0:
                new_frontier = new_frontier.unionByName(seq_retries.select(
                    "seq", "url", "depth", "method", "body_req", "referer",
                    "ctx", F.lit(True).alias("no_revisit"), "tries"))
                next_seq = next_seq2
        _lap("t_extract")
        # 6. sinks (idempotent per-batch partitions) — all writes are
        # independent jobs submitted concurrently; the error count is a
        # driver-side pyarrow scan of the written files afterwards (was
        # a fourth Spark job re-running the fetch-error plan). Small
        # batches coalesce so a near-empty batch doesn't write
        # n_shuffle tiny tasks/files per sink. The manifest (the commit
        # point, in _commit below) is written only after every write.
        all_errors = (adm_errors.unionByName(fetch_errors)
                      .unionByName(http_errors).unionByName(queue_full_errors))
        out = os.path.join(self.state, "out")
        small = m["fetched"] + m["admitted"] < 100_000

        def shrink(df):
            return df.coalesce(4) if small else df

        errors_dir = os.path.join(out, "errors", f"batch_{batch:06d}")
        from concurrent.futures import ThreadPoolExecutor

        # known-empty sinks become driver-side template copies, not
        # Spark jobs (see _write_empty). Errors can only be proven
        # empty on a zero-fetch batch (fetch/http/queue-full error
        # sources are empty by construction there, leaving exactly the
        # admission Observation's count); frontier/pending emptiness
        # is known from the dense-seq and admission counts.
        # COLLY_EMPTY_TMPL=0 is the escape hatch (and the A/B lever
        # scripts/empty_batch_bench.py flips within one session).
        tmpl_on = os.environ.get("COLLY_EMPTY_TMPL", "1") != "0"
        errors_empty = tmpl_on and skip_fetch and counts["errs"] == 0
        frontier_empty = tmpl_on and (n_new + n_retries) == 0
        pending_empty = tmpl_on and m["deferred"] == 0
        frontier_dir = os.path.join(self.state, "snap", f"frontier_{batch:06d}")
        pending_dir = os.path.join(self.state, "snap", f"pending_{batch:06d}")
        # per-sink wall stamps ride the metrics row (sink_s_* keys —
        # deliberately NOT t_-prefixed: lap consumers sum t_* and the
        # concurrent per-write walls overlap, so they must not enter
        # that sum) to keep the fixed-overhead work data-driven; each
        # stamp is that write's submit-to-finish wall inside the
        # overlap (they sum to MORE than the t_sinks lap precisely
        # when the overlap is working)
        def timed(label, fn):
            def run():
                t0 = time.time()
                fn()
                m[f"sink_s_{label}"] = round(time.time() - t0, 2)
            return run

        with ThreadPoolExecutor(max_workers=5) as ex:
            futs = []
            if errors_empty:
                self._write_empty(errors_dir, "error")
            else:
                futs.append(ex.submit(timed(
                    "errors",
                    lambda: shrink(all_errors).write.mode("overwrite")
                    .parquet(errors_dir))))
            if frontier_empty:
                self._write_empty(frontier_dir, "frontier")
            else:
                futs.append(ex.submit(timed(
                    "frontier",
                    lambda: (new_frontier.coalesce(4) if small
                             else new_frontier)
                    .write.mode("overwrite").parquet(frontier_dir))))
            if pending_empty:
                self._write_empty(pending_dir, "pending")
            else:
                futs.append(ex.submit(timed(
                    "pending",
                    lambda: shrink(deferred).write.mode("overwrite")
                    .parquet(pending_dir))))
            if m["fetched"] > 0:
                # a batch with no fetches has an empty trace and no
                # images — skip those write jobs entirely (handles glob
                # only existing dirs; a deterministic recompute repeats
                # the same skip, so resume stays exact)
                futs += [
                    ex.submit(timed(
                        "trace",
                        lambda: shrink(trace).write.mode("overwrite").parquet(
                            os.path.join(out, "trace", f"batch_{batch:06d}")))),
                    ex.submit(timed(
                        "images",
                        lambda: shrink(images_out).write.mode("overwrite").parquet(
                            os.path.join(out, "images", f"batch_{batch:06d}")))),
                ]
            for f in futs:
                f.result()
        m["errors"] = _count_nonhttp_errors(errors_dir)
        _lap("t_sinks")
        # 7. state-store compaction (pre-commit), then the commit point
        # — then reload the snapshots, which both truncates the lineage
        # at the batch boundary (otherwise the logical plan compounds
        # across batches) and makes every batch start from exactly the
        # state a resume would load
        if (self.cfg.host_error_budget > 0 or self.cfg.respect_retry_after
                or self.cfg.respect_crawl_delay):
            m["hosts_blocked"] = self._update_host_health(
                fetch_now, done, fetch_errors, batch)
        self._maybe_compact(batch)
        self._commit(batch, next_seq)
        self._gc_replaced()
        _lap("t_commit")
        self._metrics.append(m)
        pd.DataFrame([m]).to_json(os.path.join(out, f"metrics_{batch:06d}.json"), orient="records")
        for df in (done, *self._batch_persists):
            df.unpersist()
        self._batch_persists.clear()
        # reload the committed snapshots: truncates lineage at the
        # batch boundary and makes every batch start from exactly
        # the state a resume would load
        self._frontier = spark.read.parquet(
            os.path.join(self.state, "snap", f"frontier_{batch:06d}"))
        self._pending = spark.read.parquet(
            os.path.join(self.state, "snap", f"pending_{batch:06d}"))
        self._n_frontier, self._n_pending = n_new + n_retries, m["deferred"]
        self._next_seq = next_seq
        self._batch = batch + 1
        return True
