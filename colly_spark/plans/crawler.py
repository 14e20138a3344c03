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
from dataclasses import dataclass, field
from functools import reduce

import pandas as pd

from colly_spark import config as cfgmod
from colly_spark.config import CrawlConfig
from colly_spark.functions.udfs import canonicalize_udf, fnv64a_body_udf, hostname_udf
from colly_spark.operators import politeness, seen
from colly_spark.operators.robots import robots_allowed_udf
from colly_spark.plans.util import dense_seq

REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def _schemas():
    from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, IntegerType,
                                   LongType, StringType, StructField, StructType)

    frontier = StructType([
        StructField("seq", LongType()),
        StructField("url", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
        StructField("body_req", BinaryType()),
    ])
    pending = StructType([
        StructField("seq", LongType()),
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
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
    return dict(frontier=frontier, pending=pending, visited=visited,
                error=error, trace=trace, images=images)


@dataclass
class CrawlHandles:
    """Lazy readers over the crawl's sink directories."""
    spark: object
    out_dir: str
    metrics: list = field(default_factory=list)

    def _read(self, name, schema_key):
        import glob as _glob
        paths = sorted(_glob.glob(os.path.join(self.out_dir, name, "batch_*")))
        if not paths:
            return self.spark.createDataFrame([], _schemas()[schema_key])
        return self.spark.read.parquet(*paths)

    def trace(self):
        return self._read("trace", "trace")

    def errors(self):
        return self._read("errors", "error")

    def images(self):
        return self._read("images", "images")

    def visited(self):
        import glob as _glob
        paths = sorted(_glob.glob(os.path.join(self.out_dir, "visited", "batch_*")))
        if not paths:
            return self.spark.createDataFrame([], _schemas()["visited"])
        return self.spark.read.parquet(*paths)


class Crawler:
    def __init__(self, spark, corpus: dict, cfg: CrawlConfig, state_dir: str,
                 bloom_partitions: int = seen.DEFAULT_PARTITIONS,
                 bloom_bits: int = seen.DEFAULT_BITS):
        """corpus: dict of Spark DataFrames (pages, robots, images) —
        see plans/util.to_spark_corpus."""
        self.spark = spark
        self.cfg = cfg
        self.state = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.sch = _schemas()
        self.pages = corpus["pages"].persist()
        self.robots = corpus["robots"].persist()
        self.images = corpus["images"].persist()
        self._has_images = not corpus["images"].isEmpty()
        self.bloom = seen.BloomSegments(
            os.path.join(state_dir, "bloom"), bloom_partitions, bloom_bits)
        self.visited_df = spark.createDataFrame([], self.sch["visited"])
        self._filters = self._compile_filters()
        self._batch_persists: list = []

    # ---- filter chain (F1-F5) as one Catalyst when-chain ---------------
    def _compile_filters(self):
        from colly_spark.operators.filters import admission_error_expr

        cfg = self.cfg

        def err_expr(url_col, host_col, depth_col):
            return admission_error_expr(cfg, url_col, host_col, depth_col)

        return err_expr

    def _robots_gate(self, df, url_col="canon_url"):
        """Append robots_ok:boolean. Broadcast join (robots table is
        per-host — tiny) + vectorized matcher UDF. HEAD skips robots
        (colly.go:723); IgnoreRobotsTxt short-circuits entirely."""
        from pyspark.sql import functions as F

        if self.cfg.ignore_robots:
            return df.withColumn("robots_ok", F.lit(True))
        r = F.broadcast(self.robots.select(
            F.col("host").alias("_rhost"), F.col("body").alias("_rbody"),
            F.col("fetch_error").alias("_rerr")))
        df = df.join(r, df["host"] == r["_rhost"], "left")
        ok = robots_allowed_udf()(F.col(url_col), F.col("_rbody"), F.col("_rerr"))
        return (df.withColumn("robots_ok", (F.col("method") == "HEAD") | ok)
                  .drop("_rhost", "_rbody", "_rerr"))

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
        # within-batch claim: lowest seq per hash wins
        w = Window.partitionBy("url_hash").orderBy("seq")
        ranked = cand.withColumn("_claim", F.row_number().over(w))
        dup_in_batch = ranked.filter(F.col("_claim") > 1).drop("_claim")
        first = ranked.filter(F.col("_claim") == 1).drop("_claim")
        # Bloom probe: definitely-new rows skip the exact join entirely
        probed = seen.bloom_probe(first, self.bloom).persist()
        self._batch_persists.append(probed)
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen", "pid")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen", "pid")
        vis = self.visited_df
        already_exact = maybe.join(vis, "url_hash", "left_semi")
        confirmed_new = maybe.join(vis, "url_hash", "left_anti")
        accepted = fresh.unionByName(confirmed_new)
        already = dup_in_batch.unionByName(already_exact)
        # mark BEFORE fetch: append to visited delta + fold into Bloom
        marks = accepted.select("url_hash").persist()
        delta_dir = os.path.join(self.state, "out", "visited", f"batch_{batch:06d}_{delta_tag}")
        marks.write.mode("overwrite").parquet(delta_dir)
        seen.bloom_update(self.spark, self.bloom, marks)
        self.visited_df = self.visited_df.unionByName(
            self.spark.read.parquet(delta_dir)).localCheckpoint(eager=True)
        marks.unpersist()
        return accepted.unionByName(bypass), already

    # ---- admission (phase 1) -------------------------------------------
    def _admit(self, frontier_df, batch: int):
        """requestCheck over new frontier rows. Returns
        (admitted_pending_df, errors_df, n_admitted)."""
        from pyspark.sql import functions as F

        df = frontier_df.withColumn("canon_url", canonicalize_udf(F.col("url")))
        bad = df.filter(F.col("canon_url").isNull() | (F.col("canon_url") == ""))
        errors = [bad.select(
            F.lit(batch).alias("batch"), "seq", F.col("url"),
            F.lit(cfgmod.ERR_MISSING).alias("kind"))]
        ok = (df.filter(F.col("canon_url").isNotNull() & (F.col("canon_url") != ""))
                .withColumn("host", hostname_udf(F.col("canon_url"))))
        ok = ok.withColumn("_err", self._filters(F.col("canon_url"), F.col("host"), F.col("depth")))
        errors.append(ok.filter(F.col("_err").isNotNull()).select(
            F.lit(batch).alias("batch"), "seq", F.col("canon_url").alias("url"),
            F.col("_err").alias("kind")))
        ok = ok.filter(F.col("_err").isNull()).drop("_err")
        ok = self._robots_gate(ok)
        errors.append(ok.filter(~F.col("robots_ok")).select(
            F.lit(batch).alias("batch"), "seq", F.col("canon_url").alias("url"),
            F.lit(cfgmod.ERR_ROBOTS).alias("kind")))
        ok = ok.filter(F.col("robots_ok")).drop("robots_ok")
        # dedup key: FNV-64a(canon ‖ body); HEAD / bodyless non-GET skip
        # check-and-mark entirely (colly.go:728-734)
        ok = ok.withColumn("url_hash", fnv64a_body_udf(F.col("canon_url"), F.col("body_req")))
        ok = ok.withColumn(
            "needs_mark", (F.col("method") == "GET") | F.col("body_req").isNotNull())
        accepted, already = self._check_and_mark(ok, batch, "admit")
        errors.append(already.select(
            F.lit(batch).alias("batch"), "seq", F.col("canon_url").alias("url"),
            F.lit(cfgmod.ERR_ALREADY_VISITED).alias("kind")))
        pending = accepted.select("seq", "canon_url", "host", "depth", "method")
        err_df = reduce(lambda a, b: a.unionByName(b), errors)
        return pending, err_df

    # ---- fetch + redirect-hop loop (phase 3) ---------------------------
    def _fetch(self, fetch_now, batch: int):
        """Returns (done_df, errors_df). done_df columns: seq, url
        (original canon), depth, method, final_url, status,
        content_type, body, image_id."""
        from pyspark.sql import functions as F

        pages = self.pages.select(
            F.col("url").alias("_purl"), F.col("status"), F.col("content_type"),
            F.col("body"), F.col("redirect_to"), F.col("image_id"))
        remaining = fetch_now.select(
            "seq", F.col("canon_url").alias("url"), F.col("canon_url").alias("cur"),
            "depth", "method")
        done_parts, err_parts = [], []

        def err_rows(df, kind_col):
            return df.select(F.lit(batch).alias("batch"), "seq",
                             F.col("url"), kind_col.alias("kind"))

        for hop in range(self.cfg.max_redirects + 2):
            joined = remaining.join(pages, remaining["cur"] == pages["_purl"], "left")
            missing = joined.filter(F.col("_purl").isNull())
            err_parts.append(err_rows(missing, F.lit(cfgmod.ERR_MISSING)))
            hit = joined.filter(F.col("_purl").isNotNull()).drop("_purl")
            is_redirect = F.col("status").isin(*REDIRECT_STATUSES) & F.col("redirect_to").isNotNull()
            finals = hit.filter(~is_redirect)
            done_parts.append(finals.select(
                "seq", "url", "depth", "method", F.col("cur").alias("final_url"),
                "status", "content_type", "body", "image_id"))
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
                "seq", "url", "depth", "method",
                canonicalize_udf(F.col("redirect_to")).alias("canon_url"))
            badt = t.filter(F.col("canon_url").isNull() | (F.col("canon_url") == ""))
            err_parts.append(err_rows(badt, F.lit(cfgmod.ERR_MISSING)))
            t = (t.filter(F.col("canon_url").isNotNull() & (F.col("canon_url") != ""))
                   .withColumn("host", hostname_udf(F.col("canon_url"))))
            t = t.withColumn("_err", self._filters(F.col("canon_url"), F.col("host"), F.col("depth")))
            err_parts.append(err_rows(t.filter(F.col("_err").isNotNull()), F.col("_err")))
            t = t.filter(F.col("_err").isNull()).drop("_err")
            t = self._robots_gate(t)
            err_parts.append(err_rows(t.filter(~F.col("robots_ok")), F.lit(cfgmod.ERR_ROBOTS)))
            t = t.filter(F.col("robots_ok")).drop("robots_ok")
            t = t.withColumn("url_hash", fnv64a_body_udf(F.col("canon_url"), F.lit(None).cast("binary")))
            t = t.withColumn("needs_mark", F.col("method") == "GET")
            accepted, already = self._check_and_mark(t, batch, f"hop{hop}")
            err_parts.append(err_rows(already, F.lit(cfgmod.ERR_ALREADY_VISITED)))
            # truncate the per-hop plan chain (few rows; without this the
            # logical plan compounds multiplicatively per hop)
            remaining = accepted.select(
                "seq", "url", F.col("canon_url").alias("cur"), "depth", "method"
            ).localCheckpoint(eager=True)
            redir.unpersist()
        done = reduce(lambda a, b: a.unionByName(b), done_parts)
        errs = reduce(lambda a, b: a.unionByName(b), err_parts)
        return done, errs

    # ---- extraction + image validation (phase 4) -----------------------
    def _extract(self, done_df):
        """Returns (links_df[parent_seq, link_idx, url, depth],
        images_df[page_url, image_url, caption])."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                                       StructField, StructType)

        parse = done_df.filter((F.col("status") < 203) & (F.col("method") != "HEAD"))
        # round-robin repartition: extraction is per-row CPU work; this
        # spreads a hot domain's pages across all cores (skew kill)
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        parse = parse.select("seq", "final_url", "depth", "content_type", "body").repartition(n)

        out_schema = StructType([
            StructField("seq", LongType()),
            StructField("final_url", StringType()),
            StructField("depth", IntegerType()),
            StructField("links", ArrayType(StringType())),
            StructField("imgs", ArrayType(StructType([
                StructField("url", StringType()),
                StructField("caption", StringType()),
            ]))),
        ])

        def _parse_pages(iterator):
            from colly_spark.operators.extract import extract_page
            for pdf in iterator:
                links_col, imgs_col = [], []
                for body, ctype, url in zip(pdf["body"], pdf["content_type"], pdf["final_url"]):
                    links, images = extract_page(url, body, ctype)
                    links_col.append(links)
                    imgs_col.append([{"url": u, "caption": c} for u, c in images])
                yield pd.DataFrame({
                    "seq": pdf["seq"], "final_url": pdf["final_url"],
                    "depth": pdf["depth"], "links": links_col, "imgs": imgs_col,
                })

        parsed = parse.mapInPandas(_parse_pages, schema=out_schema).persist()
        links = parsed.select(
            F.col("seq").alias("parent_seq"), (F.col("depth") + 1).alias("depth"),
            F.posexplode("links").alias("link_idx", "url"))
        page_images = parsed.select(
            F.col("final_url").alias("page_url"),
            F.explode("imgs").alias("im")
        ).select("page_url", F.col("im.url").alias("image_url"), F.col("im.caption").alias("caption"))
        return parsed, links, page_images

    def _validate_direct_images(self, done_df):
        """Direct image fetches (content_type image/*) validated against
        the payload table: decoded-pixel allclose / PSNR≥40dB + caption
        presence (BASELINE.json input_hint). Vectorized Arrow batch."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import (BooleanType, DoubleType, StringType,
                                       StructField, StructType)

        direct = done_df.filter(
            F.col("content_type").startswith("image/") & F.col("image_id").isNotNull())
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
                    pdf["body"].tolist(), pdf["_fmt"].tolist(),
                    pdf["_ref_bytes"].tolist(), pdf["_fmt"].tolist())
                yield pd.DataFrame({
                    "image_url": pdf["final_url"], "image_id": pdf["image_id"],
                    "ok": oks, "psnr_db": psnrs,
                })

        return j.select("final_url", "image_id", "body", "_ref_bytes", "_fmt") \
                .mapInPandas(_validate, schema=val_schema)

    # ---- state / resume -------------------------------------------------
    def _manifest_path(self):
        return os.path.join(self.state, "MANIFEST.json")

    def _commit(self, batch: int, next_seq: int, frontier_df, pending_df):
        frontier_df.write.mode("overwrite").parquet(
            os.path.join(self.state, "snap", f"frontier_{batch:06d}"))
        pending_df.write.mode("overwrite").parquet(
            os.path.join(self.state, "snap", f"pending_{batch:06d}"))
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": batch, "next_seq": next_seq}, f)
        os.replace(tmp, self._manifest_path())

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
        vis_paths = sorted(_glob.glob(os.path.join(self.state, "out", "visited", "batch_*")))
        if vis_paths:
            self.visited_df = self.spark.read.parquet(*vis_paths).localCheckpoint(eager=True)
        # Bloom = pure function of the visited set → rebuild (deployment:
        # Iceberg-snapshot the segments instead)
        shutil.rmtree(self.bloom.dir, ignore_errors=True)
        os.makedirs(self.bloom.dir, exist_ok=True)
        if vis_paths:
            seen.bloom_update(self.spark, self.bloom, self.visited_df)
        frontier = self.spark.read.parquet(os.path.join(self.state, "snap", f"frontier_{b:06d}"))
        pending = self.spark.read.parquet(os.path.join(self.state, "snap", f"pending_{b:06d}"))
        return b + 1, man["next_seq"], frontier, pending

    # ---- the drive loop --------------------------------------------------
    def run(self, seeds=None, max_batches: int = 10_000, resume: bool = False) -> CrawlHandles:
        """seeds: list of url strings or (url, method, body_bytes)
        tuples in submission order. With ``resume=True``, continues from
        the last committed batch instead (seeds ignored)."""
        from pyspark.sql import functions as F

        spark = self.spark
        handles = CrawlHandles(spark, os.path.join(self.state, "out"))
        start_batch, next_seq = 0, 0
        frontier = pending = None
        if resume:
            loaded = self._load_resume()
            if loaded is None:
                raise ValueError(f"resume requested but no MANIFEST in {self.state}")
            start_batch, next_seq, frontier, pending = loaded
        else:
            rows = []
            for s in seeds or []:
                if isinstance(s, str):
                    url, method, body = s, "GET", None
                else:
                    url, method, body = s
                rows.append((next_seq, url, 1, method, body))
                next_seq += 1
            frontier = spark.createDataFrame(rows, self.sch["frontier"])
            pending = spark.createDataFrame([], self.sch["pending"])

        batch = start_batch
        # carry counts forward (set exactly by each batch's own
        # bookkeeping) instead of re-counting the snapshots every loop
        n_frontier = frontier.count()
        n_pending = pending.count()
        while batch < max_batches:
            if n_frontier == 0 and n_pending == 0:
                break
            m = dict(batch=batch, submitted=n_frontier, admitted=0, fetched=0,
                     deferred=0, errors=0, new_links=0)
            # 1. admission — localCheckpoint truncates the admission DAG
            # (UDF chain + bloom probe + anti-join) so downstream plans
            # stay bounded regardless of driver heap
            admitted, adm_errors = self._admit(frontier, batch)
            admitted = admitted.localCheckpoint(eager=True)
            adm_errors = adm_errors.localCheckpoint(eager=True)
            m["admitted"] = admitted.count()
            # 2. politeness quota over pending ∪ admitted. With no
            # LimitRules every quota is unbounded (the reference skips
            # the semaphore entirely for nil rules, http_backend.go:134)
            # → skip the window shuffle and fetch everything now.
            pool = pending.unionByName(admitted)
            if self.cfg.limit_rules:
                fetch_now, deferred = politeness.admit_batch(pool, self.cfg)
                fetch_now = fetch_now.persist()
                deferred = deferred.persist()
                m["deferred"] = deferred.count()
            else:
                fetch_now = pool.persist()
                deferred = spark.createDataFrame([], self.sch["pending"])
                m["deferred"] = 0
            # 3. fetch + redirects
            done, fetch_errors = self._fetch(fetch_now, batch)
            done = done.localCheckpoint(eager=True)
            trace = done.select(
                F.lit(batch).alias("batch"), "seq", "url", "final_url", "depth",
                hostname_udf(F.col("final_url")).alias("host"), "status")
            m["fetched"] = done.count()
            # http status errors (recorded, not counted in m["errors"] —
            # simulator parity)
            http_errors = done.filter(F.col("status") >= 400).select(
                F.lit(batch).alias("batch"), "seq", F.col("url"),
                F.concat(F.lit("http_"), F.col("status")).alias("kind"))
            # 4. extraction + images (direct-image validation joins the
            # payload table — skipped when the corpus carries none)
            parsed, links, page_images = self._extract(done)
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
            # 5. dense discovery seqs for new links → next frontier
            if links.isEmpty():
                new_frontier = spark.createDataFrame([], self.sch["frontier"])
                n_new = 0
            else:
                seq_links, next_seq_after = dense_seq(
                    links, ["parent_seq", "link_idx"], out_col="seq", start=next_seq)
                new_frontier = seq_links.select(
                    "seq", "url", "depth", F.lit("GET").alias("method"),
                    F.lit(None).cast("binary").alias("body_req"))
                n_new = next_seq_after - next_seq
                next_seq = next_seq_after
            m["new_links"] = n_new
            # 6. sinks (idempotent per-batch partitions)
            all_errors = adm_errors.unionByName(fetch_errors).unionByName(http_errors)
            all_errors = all_errors.persist()
            m["errors"] = all_errors.filter(~F.col("kind").startswith("http_")).count()
            out = os.path.join(self.state, "out")
            trace.write.mode("overwrite").parquet(os.path.join(out, "trace", f"batch_{batch:06d}"))
            all_errors.write.mode("overwrite").parquet(os.path.join(out, "errors", f"batch_{batch:06d}"))
            images_out.write.mode("overwrite").parquet(os.path.join(out, "images", f"batch_{batch:06d}"))
            handles.metrics.append(m)
            pd.DataFrame([m]).to_json(os.path.join(out, f"metrics_{batch:06d}.json"), orient="records")
            # 7. commit point — then reload the snapshots, which both
            # truncates the lineage at the batch boundary (otherwise the
            # logical plan compounds across batches) and makes every
            # batch start from exactly the state a resume would load
            self._commit(batch, next_seq, new_frontier, deferred)
            for df in (admitted, fetch_now, deferred, done, parsed, all_errors,
                       *self._batch_persists):
                df.unpersist()
            self._batch_persists.clear()
            frontier = spark.read.parquet(
                os.path.join(self.state, "snap", f"frontier_{batch:06d}"))
            pending = spark.read.parquet(
                os.path.join(self.state, "snap", f"pending_{batch:06d}"))
            n_frontier, n_pending = n_new, m["deferred"]
            batch += 1
        return handles
