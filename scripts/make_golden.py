#!/usr/bin/env python
"""Generate the golden parquet oracles under golden/.

- crawl_trace.parquet: the expected fetch trace of the flagship
  `crawl_trace` query, produced by the pure-Python reference simulator
  (oracle/simulator.py) — NOT by the Spark engine — over the exact
  corpus spec + config the query uses. The DuckDB oracle for
  `crawl_trace` is a SELECT over this file, which turns the flagship
  drain into a hard rows+schema+hash CORRECTNESS gate.
- image_decode.parquet: expected (w, h, fmt, phash, decode_ok) for the
  64 deterministic synthetic images of `q_image_decode`, computed by a
  plain-Python replica of the generation+decode pipeline (no Spark) —
  pins the Arrow/mapInPandas plumbing end-to-end.

Deterministic: re-running reproduces byte-identical values.
Run from the repo root: python scripts/make_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

GOLDEN = os.path.join(_REPO, "golden")


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def make_crawl_trace() -> None:
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.functions.urlnorm import request_hash
    from colly_spark.oracle.simulator import Simulator
    from colly_spark.sources.fixtures import CorpusSpec, make_corpus

    # MUST mirror __spark_entry__.q_crawl_trace exactly
    corpus = make_corpus(CorpusSpec(seed=42, n_domains=2,
                                    base_pages_per_domain=5, n_images=4))
    cfg = CrawlConfig(
        max_depth=3, ignore_robots=False,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=50, parallelism=2),))
    res = Simulator(corpus, cfg).run(["http://d00.test/", "http://d01.test/"])

    rows = []
    for (batch, seq, url, final_url, depth, host, status, method, referer,
         ua, proxy, _ctx) in res.trace:
        h = _signed(request_hash(url, None))
        rows.append(dict(
            batch=batch, seq=seq, url=url, final_url=final_url, depth=depth,
            host=host, status=status, method=method, referer=referer,
            connect_ms=(h % 97) / 10.0 + 1.0,
            ttfb_ms=(h % 331) / 10.0 + 5.0,
            ua=ua, proxy=proxy))
    schema = pa.schema([
        ("batch", pa.int32()), ("seq", pa.int64()), ("url", pa.string()),
        ("final_url", pa.string()), ("depth", pa.int32()), ("host", pa.string()),
        ("status", pa.int32()), ("method", pa.string()), ("referer", pa.string()),
        ("connect_ms", pa.float64()), ("ttfb_ms", pa.float64()),
        ("ua", pa.string()), ("proxy", pa.string()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "crawl_trace.parquet"))
    print(f"crawl_trace: {len(rows)} rows")


def make_crawl_events() -> None:
    """Expected LoggerEvent stream for `crawl_events`, derived straight
    from the independent simulator's trace/errors/images lists by the
    reference's logEvent site list (collector.go:102 request, :143
    response_hdr WARN-on-≥300, :177 response, :225 error, :286 html,
    :408 scraped; error gate colly.go:685-710 = status < 203) — NOT by
    the engine's events() view. batch/seq are null on html/error rows
    (the simulator records those without request ids)."""
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.oracle.simulator import Simulator
    from colly_spark.sources.fixtures import CorpusSpec, make_corpus

    INFO, WARN = 1, 2
    corpus = make_corpus(CorpusSpec(seed=42, n_domains=2,
                                    base_pages_per_domain=5, n_images=4))
    cfg = CrawlConfig(
        max_depth=3, ignore_robots=False,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=50, parallelism=2),))
    res = Simulator(corpus, cfg).run(["http://d00.test/", "http://d01.test/"])

    rows = []

    def ev(batch, seq, level, typ, url, status=None, kind=None):
        rows.append(dict(batch=batch, seq=seq, level=level, event_type=typ,
                         url=url, status=status, kind=kind))

    for (batch, seq, url, _final, _depth, _host, status, _method,
         _referer, _ua, _proxy, _ctx) in res.trace:
        ev(batch, seq, INFO, "request", url)
        ev(batch, seq, WARN if status >= 300 else INFO, "response_hdr",
           url, status=status)
        if status < 203:
            ev(batch, seq, INFO, "response", url, status=status)
            ev(batch, seq, INFO, "scraped", url)
    for (page_url, _img_url, _img_id, _caption) in res.images:
        ev(None, None, INFO, "html", page_url)
    for (url, kind) in res.errors:
        ev(None, None, WARN, "error", url, kind=kind)

    schema = pa.schema([
        ("batch", pa.int32()), ("seq", pa.int64()), ("level", pa.int32()),
        ("event_type", pa.string()), ("url", pa.string()),
        ("status", pa.int32()), ("kind", pa.string()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "crawl_events.parquet"))
    print(f"crawl_events: {len(rows)} rows")


def make_image_decode(n: int = 64, seed: int = 42, size: int = 16) -> None:
    # plain-Python replica of multimodal.synthesize_images → decode_meta
    # over the full five-codec cycle (from-scratch png/jpeg/VP8L +
    # native avif / lossy-VP8 webp)
    from colly_spark.functions.images import decode_image, phash64, synth_encode

    cycle = ("png", "jpeg", "webp", "avif", "webp_lossy")
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        fmt, data, _ = synth_encode(px, cycle[i % len(cycle)])
        decoded = decode_image(data, fmt)
        rows.append(dict(image_id=f"img{i:08d}", w=decoded.shape[1],
                         h=decoded.shape[0], fmt=fmt,
                         phash=phash64(decoded), decode_ok=True))
    schema = pa.schema([
        ("image_id", pa.string()), ("w", pa.int32()), ("h", pa.int32()),
        ("fmt", pa.string()), ("phash", pa.int64()), ("decode_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_decode.parquet"))
    print(f"image_decode: {len(rows)} rows")


def make_image_stats(n: int = 64, seed: int = 42, size: int = 16) -> None:
    # plain-Python replica of synthesize_images → image_stats over the
    # five-codec cycle; pins the decode round-trip + Arrow plumbing
    # (the stat math itself is KAT'd in tests/test_image_stats.py)
    from colly_spark.functions.images import decode_image, synth_encode
    from colly_spark.operators.multimodal import luma_stats

    cycle = ("png", "jpeg", "webp", "avif", "webp_lossy")
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        fmt, data, _ = synth_encode(px, cycle[i % len(cycle)])
        m, c, e, s = luma_stats(decode_image(data, fmt))
        rows.append(dict(image_id=f"img{i:08d}", fmt=fmt, mean_luma=m,
                         contrast=c, entropy=e, sharpness=s,
                         decode_ok=True))
    schema = pa.schema([
        ("image_id", pa.string()), ("fmt", pa.string()),
        ("mean_luma", pa.float64()), ("contrast", pa.float64()),
        ("entropy", pa.float64()), ("sharpness", pa.float64()),
        ("decode_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_stats.parquet"))
    print(f"image_stats: {len(rows)} rows")


def make_image_phash(n: int = 96, n_variants: int = 32, seed: int = 42,
                     size: int = 16) -> None:
    # plain-Python replica of synthesize_images(n, n_variants) → phash;
    # golden input for the phash_near_dup brute-force DuckDB oracle
    from colly_spark.functions.images import synth_encode

    rows = []
    for i in range(n + n_variants):
        base = i if i < n else i - n
        rng = np.random.default_rng(seed * 1_000_003 + base)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        enc = ("png", "jpeg", "webp")[i % 3] if i < n else "jpeg"
        _, _, ph = synth_encode(px, enc)
        rows.append(dict(image_id=f"img{i:08d}", phash=ph))
    schema = pa.schema([("image_id", pa.string()), ("phash", pa.int64())])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_phash.parquet"))
    print(f"image_phash: {len(rows)} rows")


def make_image_curation(n: int = 96, n_variants: int = 32, seed: int = 42,
                        size: int = 16, min_entropy: float = 6.95,
                        k: int = 3) -> None:
    """image_curation.parquet: expected output of the composed image
    curation pipeline (ONE decode pass → entropy gate → phash near-dup
    keep-min groups) — plain-Python replica with brute-force Hamming
    pairs + union-find components over the ADMITTED set."""
    from colly_spark.functions.images import decode_image, phash64, synth_encode
    from colly_spark.operators.multimodal import luma_stats

    rows = []
    for i in range(n + n_variants):
        base = i if i < n else i - n
        rng = np.random.default_rng(seed * 1_000_003 + base)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        enc = ("png", "jpeg", "webp")[i % 3] if i < n else "jpeg"
        fmt, data, _ = synth_encode(px, enc)
        decoded = decode_image(data, fmt)
        _m, _c, e, _s = luma_stats(decoded)
        rows.append((i, fmt, e, phash64(decoded)))
    admitted = [(i, fmt, e, ph) for i, fmt, e, ph in rows
                if e >= min_entropy]
    ids = [i for i, *_ in admitted]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(admitted)):
        for b in range(a + 1, len(admitted)):
            ia, pha = admitted[a][0], admitted[a][3]
            ib, phb = admitted[b][0], admitted[b][3]
            if bin((pha ^ phb) & ((1 << 64) - 1)).count("1") <= k:
                ra, rb = find(ia), find(ib)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    canon = {i: find(i) for i in ids}
    sizes = {}
    for i in ids:
        sizes[canon[i]] = sizes.get(canon[i], 0) + 1
    out = [dict(image_id=f"img{i:08d}", fmt=fmt, entropy=e,
                canon_id=f"img{canon[i]:08d}",
                cluster_size=sizes[canon[i]],
                is_canonical=(canon[i] == i))
           for i, fmt, e, _ph in admitted]
    schema = pa.schema([
        ("image_id", pa.string()), ("fmt", pa.string()),
        ("entropy", pa.float64()), ("canon_id", pa.string()),
        ("cluster_size", pa.int64()), ("is_canonical", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(out), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_curation.parquet"))
    n_groups = len(set(canon.values()))
    print(f"image_curation: {len(out)} admitted of {len(rows)}, "
          f"{n_groups} groups")


def make_images_meta(n: int = 512, seed: int = 99) -> None:
    """Deterministic image-metadata INPUT table for the
    `image_corpus_filter` query (NOT an expected-output golden): varied
    (w, h, fmt, caption, phash) with deliberate degenerate rows — tiny
    images, extreme aspect ratios, blank/short captions, undecodable
    formats, exact phash duplicates — so every filter clause and the
    keep-min dedup are exercised. Both engines read this file and
    compute the filter independently."""
    import random

    rng = random.Random(seed)
    words = ("a sunny beach photo of two dogs playing with red ball near "
             "old wooden pier at golden sunset light").split()
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.10:          # tiny
            w, h = rng.choice((8, 16, 32, 48)), rng.choice((8, 16, 32, 48))
        elif kind < 0.20:        # extreme aspect (banners/sprites)
            w, h = rng.choice((64, 1024, 2048)), rng.choice((8, 16, 32))
            if rng.random() < 0.5:
                w, h = h, w
        else:
            w, h = rng.choice((64, 128, 256, 512, 1024)), rng.choice(
                (64, 128, 256, 512, 768))
        fmt = rng.choice(("png", "jpeg", "jpeg", "webp", "gif", "bmp", "avif"))
        n_tok = rng.choice((0, 1, 2, 3, 4, 6, 8, 12))
        caption = " ".join(rng.choice(words) for _ in range(n_tok))
        if rng.random() < 0.05:
            caption = "   " + caption + "  "   # whitespace padding
        if rows and rng.random() < 0.12:       # exact phash duplicate
            phash = rows[rng.randrange(len(rows))]["phash"]
        else:
            phash = _signed(rng.getrandbits(64))
        rows.append(dict(image_id=f"img{i:08d}", w=np.int32(w), h=np.int32(h),
                         fmt=fmt, caption=caption, phash=phash))
    schema = pa.schema([
        ("image_id", pa.string()), ("w", pa.int32()), ("h", pa.int32()),
        ("fmt", pa.string()), ("caption", pa.string()), ("phash", pa.int64()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "images_meta.parquet"))
    print(f"images_meta: {len(rows)} rows")


def make_image_metadata_scrub(n: int = 64, seed: int = 42,
                              size: int = 16) -> None:
    """Expected output of q_image_metadata_scrub, computed
    ARITHMETICALLY from the container specs and the known injected
    payload sizes — the scrubber code is never executed here, so the
    oracle is independent of it:

    - jpeg: APP1 (2 marker + 2 len + 6 'Exif\\0\\0' + p) and COM
      (2 + 2 + p) segments removed → n=2, bytes = 14 + 2p
    - png: one tEXt chunk (4 len + 4 tag + 8 'Comment\\0' + p + 4 crc)
      → n=1, bytes = 20 + p
    - webp: one RIFF EXIF chunk (8 header + p + odd-pad) → n=1
    - avif: untouched → 0, 0

    clean_len is the pre-injection encoded length (scrubbing must
    restore the original bytes exactly), so restored=True and
    pixels_unchanged=True everywhere.
    """
    from colly_spark.functions.images import synth_encode

    cycle = ("png", "jpeg", "webp", "avif", "webp_lossy")
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        fmt, data, _ = synth_encode(px, cycle[i % len(cycle)])
        p = len(f"GPS {i} 51.5074 -0.1278 CAM{i % 9}".encode())
        if fmt == "jpeg":
            n_removed, bytes_removed = 2, 14 + 2 * p
        elif fmt == "png":
            n_removed, bytes_removed = 1, 20 + p
        elif fmt == "webp":
            n_removed, bytes_removed = 1, 8 + p + (p & 1)
        else:  # avif: injector and scrubber both pass through
            n_removed, bytes_removed = 0, 0
        rows.append(dict(image_id=f"img{i:08d}", fmt=fmt,
                         n_removed=n_removed, bytes_removed=bytes_removed,
                         clean_len=len(data), pixels_unchanged=True,
                         restored=True))
    schema = pa.schema([
        ("image_id", pa.string()), ("fmt", pa.string()),
        ("n_removed", pa.int32()), ("bytes_removed", pa.int64()),
        ("clean_len", pa.int64()), ("pixels_unchanged", pa.bool_()),
        ("restored", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_metadata_scrub.parquet"))
    print(f"image_metadata_scrub: {len(rows)} rows")


def make_warc_fixture() -> None:
    """golden/warc/: 2 member-per-record .warc.gz files + 1 plain
    .warc, plus warc_scan.parquet — the ground-truth record list
    (written straight from the generated tuples, BEFORE serialization,
    so the parquet pins what the distributed parser must recover).
    Bodies exercise the framing traps: empty, CRLFCRLF inside the
    payload, raw non-ASCII bytes."""
    import hashlib
    import random

    from colly_spark.sources import warc as W

    rng = random.Random(4242)
    recs = []
    for i in range(40):
        url = f"http://w{i % 5:02d}.test/doc/{i:03d}"
        date = f"2026-01-{(i % 27) + 1:02d}T{i % 10:02d}:00:00Z"
        status = [200, 200, 200, 301, 404, 500][i % 6]
        ctype = ["text/html; charset=utf-8", "application/json",
                 "image/png"][i % 3]
        if i % 7 == 0:
            body = b""
        elif i % 7 == 1:
            body = b"part1\r\n\r\npart2-" + bytes([i])  # CRLFCRLF inside
        else:
            body = (f"<html><body>doc {i} ".encode()
                    + bytes(rng.randrange(256) for _ in range(
                        rng.randrange(10, 200))))
        recs.append((url, date, status, ctype, body))

    wdir = os.path.join(GOLDEN, "warc")
    os.makedirs(wdir, exist_ok=True)
    for fname, chunk in (("part-00000.warc.gz", recs[:15]),
                         ("part-00001.warc.gz", recs[15:30])):
        blob = W.gzip_member(W.build_warcinfo("2026-01-01T00:00:00Z"))
        blob += b"".join(W.gzip_member(W.build_response_record(*r))
                         for r in chunk)
        with open(os.path.join(wdir, fname), "wb") as f:
            f.write(blob)
    plain = (W.build_warcinfo("2026-01-01T00:00:00Z")
             + b"".join(W.build_response_record(*r) for r in recs[30:]))
    with open(os.path.join(wdir, "part-00002.warc"), "wb") as f:
        f.write(plain)

    rows = [dict(url=u, status=s, content_type=c, body_len=len(b),
                 body_sha256=hashlib.sha256(b).hexdigest())
            for (u, d, s, c, b) in recs]
    schema = pa.schema([("url", pa.string()), ("status", pa.int32()),
                        ("content_type", pa.string()),
                        ("body_len", pa.int32()),
                        ("body_sha256", pa.string())])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "warc_scan.parquet"))
    print(f"warc fixture: {len(recs)} records across 3 files")


def make_webdataset_fixture(n: int = 40, seed: int = 42,
                            size: int = 16) -> None:
    """golden/wds/: 3 deterministic WebDataset tar shards (16/16/8
    samples) framed by the plain-Python build_shard over the shared
    synthetic-image replica, plus wds_scan.parquet — the ground-truth
    component list written from the tuples BEFORE tar framing (so the
    distributed parser is checked against what the shards must
    contain).  The fixture doubles as the EXPORTER pin: to_webdataset
    over the same samples (one partition, shard_rows=16) must
    reproduce these files byte-identically — tests/test_webdataset.py.
    The .json metadata string replicates Spark's
    to_json(struct(h, phash, w, fmt)) rendering exactly (no spaces,
    struct field order), which image_samples emits."""
    import hashlib

    from colly_spark.functions.images import synth_encode
    from colly_spark.sources import webdataset as WD

    cycle = ("png", "jpeg", "webp", "avif", "webp_lossy")
    samples, truth = [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        fmt, data, ph = synth_encode(px, cycle[i % len(cycle)])
        key = f"img{i:08d}"
        files = {
            fmt: data,
            "txt": f"synthetic caption {i}".encode(),
            "json": (f'{{"h":{size},"phash":{ph},"w":{size},'
                     f'"fmt":"{fmt}"}}').encode(),
        }
        samples.append((key, files))
        truth.extend(dict(key=key, ext=e, size=len(d),
                          digest=hashlib.sha256(d).hexdigest())
                     for e, d in files.items())

    wdir = os.path.join(GOLDEN, "wds")
    os.makedirs(wdir, exist_ok=True)
    for s, lo in enumerate(range(0, n, 16)):
        blob = WD.build_shard(samples[lo:lo + 16])
        with open(os.path.join(wdir, f"part-00000-{s:03d}.tar"), "wb") as f:
            f.write(blob)

    truth.sort(key=lambda r: (r["key"], r["ext"]))
    schema = pa.schema([("key", pa.string()), ("ext", pa.string()),
                        ("size", pa.int64()), ("digest", pa.string())])
    tbl = pa.Table.from_pandas(pd.DataFrame(truth), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "wds_scan.parquet"))
    print(f"wds fixture: {n} samples / {len(truth)} components, 3 shards")


def make_boilerplate() -> None:
    """boilerplate.parquet: expected (doc_id, n_blocks, n_good,
    main_text) of `extract_main_text` over synth_page_html pages of
    the sf0.01 documents table. The synthesis function is shared (so
    engine and replica agree on the input); the replica below derives
    the expected blocks from the construction arithmetic directly —
    it never parses HTML, so the DOM engine + mapInPandas extraction
    path is what the golden pins."""
    import duckdb

    from colly_spark.operators.boilerplate import (MAX_LINK_DENSITY,
                                                   MIN_STOPWORD_DENSITY,
                                                   MIN_WORDS, STOPWORDS,
                                                   SYNTH_STOPS)

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet'"
        " ORDER BY doc_id").fetchall()

    def good(text: str, link_chars: int) -> bool:
        words = text.split(" ")
        nw = len(words)
        sd = sum(w.lower() in STOPWORDS for w in words) / nw
        return (nw >= MIN_WORDS and link_chars / len(text) < MAX_LINK_DENSITY
                and sd >= MIN_STOPWORD_DENSITY)

    out = []
    for doc_id, text in rows:
        toks = text.split()
        blocks = [("home about contact", 16)]  # nav: 3 link texts
        for j in range(0, len(toks), 9):
            words = []
            for idx, t in enumerate(toks[j:j + 9]):
                words.append(t)
                if idx % 2 == 1:
                    words.append(SYNTH_STOPS[(doc_id + j + idx)
                                             % len(SYNTH_STOPS)])
            blocks.append((" ".join(words) + ".", 0))
        if doc_id % 3 == 0:
            for k in range(3):
                t = toks[k % len(toks)]
                blocks.append((t, len(t)))
        blocks.append(("copyright example site", 0))
        kept = [t for t, lc in blocks if good(t, lc)]
        out.append((doc_id, len(blocks), len(kept),
                    "\n".join(kept) if kept else None))

    tbl = pa.Table.from_pandas(
        pd.DataFrame(out, columns=["doc_id", "n_blocks", "n_good",
                                   "main_text"]),
        schema=pa.schema([("doc_id", pa.int64()), ("n_blocks", pa.int64()),
                          ("n_good", pa.int64()), ("main_text", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "boilerplate.parquet"))
    print("boilerplate.parquet:", len(out), "rows")


def make_bpe() -> None:
    """bpe_merges.parquet + bpe_encode.parquet: expected output of
    `bpe_train` (40 merges, min_count=2) and `bpe_encode` over the
    sf0.01 documents table, computed by the independent pure-Python
    reference (oracle/bpe_ref.py) — BPE's iterate-argmax-rewrite loop
    is not one SQL statement, so the golden discipline applies. The
    driver's correctness gate runs at sf0.01; tests cover other
    inputs via the same replica."""
    import duckdb

    from colly_spark.oracle import bpe_ref

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet'"
        " ORDER BY doc_id").fetchall()
    texts = [t for _i, t in rows]
    merges = bpe_ref.train(texts, n_merges=40, min_count=2)
    mt = pa.Table.from_pandas(
        pd.DataFrame(merges,
                     columns=["rank", "lhs", "rhs", "merged", "pair_count"]),
        schema=pa.schema([("rank", pa.int32()), ("lhs", pa.string()),
                          ("rhs", pa.string()), ("merged", pa.string()),
                          ("pair_count", pa.int64())]),
        preserve_index=False)
    pq.write_table(mt, os.path.join(GOLDEN, "bpe_merges.parquet"))

    enc = bpe_ref.encode_texts(texts, merges)
    et = pa.Table.from_pandas(
        pd.DataFrame([(i, n, d) for (i, _t), (n, d) in zip(rows, enc)],
                     columns=["doc_id", "n_bpe_tokens",
                              "n_distinct_symbols"]),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_bpe_tokens", pa.int64()),
                          ("n_distinct_symbols", pa.int64())]),
        preserve_index=False)
    pq.write_table(et, os.path.join(GOLDEN, "bpe_encode.parquet"))
    print(f"bpe: {len(merges)} merges, {len(enc)} encoded docs")


def make_unigram() -> None:
    """unigram_vocab.parquet + unigram_encode.parquet: expected output
    of `unigram_train` (vocab_size=150, seed_size=300, max_piece_len=5,
    n_rounds=4) and `unigram_encode` over the sf0.01 documents table,
    computed by the independent pure-Python reference
    (oracle/unigram_ref.py) — the iterate-segment-prune loop is not one
    SQL statement, so the golden discipline applies (same as bpe)."""
    import duckdb

    from colly_spark.oracle import unigram_ref

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet'"
        " ORDER BY doc_id").fetchall()
    texts = [t for _i, t in rows]
    vocab = unigram_ref.train(texts, vocab_size=150, seed_size=300,
                              max_piece_len=5, n_rounds=4)
    vt = pa.Table.from_pandas(
        pd.DataFrame(vocab, columns=["piece", "count", "logp"]),
        schema=pa.schema([("piece", pa.string()), ("count", pa.int64()),
                          ("logp", pa.float64())]),
        preserve_index=False)
    pq.write_table(vt, os.path.join(GOLDEN, "unigram_vocab.parquet"))

    enc = unigram_ref.encode_texts(texts, vocab, max_piece_len=5)
    et = pa.Table.from_pandas(
        pd.DataFrame([(i, n, d) for (i, _t), (n, d) in zip(rows, enc)],
                     columns=["doc_id", "n_pieces", "n_distinct_pieces"]),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_pieces", pa.int64()),
                          ("n_distinct_pieces", pa.int64())]),
        preserve_index=False)
    pq.write_table(et, os.path.join(GOLDEN, "unigram_encode.parquet"))
    print(f"unigram: {len(vocab)} vocab pieces, {len(enc)} encoded docs")


def make_av() -> None:
    """audio_features.parquet + video_frames.parquet: expected output
    of `audio_features` / `video_frames`, computed WITHOUT the
    containers — audio stats straight from the synthesized samples
    (never through WAV bytes, so the golden pins the RIFF round-trip)
    and video phashes from plain-Python decode of the same
    deterministic JPEG frames (pins the AVI walk + sampling + Arrow
    plumbing; the JPEG codec itself is KAT'd against libjpeg)."""
    from colly_spark.functions.audio import audio_stats, synth_samples
    from colly_spark.functions.images import phash64
    from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from colly_spark.operators.av import synth_video_frames

    arows = []
    for i in range(60):
        rate, samples = synth_samples(i)
        arows.append(dict({"audio_id": f"aud{i:08d}", "decode_ok": True},
                          **audio_stats(samples, rate)))
    at = pa.Table.from_pandas(
        pd.DataFrame(arows), preserve_index=False,
        schema=pa.schema([("audio_id", pa.string()),
                          ("decode_ok", pa.bool_()),
                          ("rate", pa.int32()), ("channels", pa.int32()),
                          ("n_frames", pa.int32()),
                          ("duration_ms", pa.int32()),
                          ("rms", pa.float64()), ("peak", pa.float64()),
                          ("zcr", pa.float64())]))
    pq.write_table(at, os.path.join(GOLDEN, "audio_features.parquet"))

    vrows = []
    for i in range(24):
        for idx, px in enumerate(synth_video_frames(i)):
            if idx % 2:
                continue
            dec = decode_jpeg(encode_jpeg(px, quality=95))
            vrows.append(dict(video_id=f"vid{i:08d}", frame_idx=idx,
                              w=dec.shape[1], h=dec.shape[0],
                              phash=phash64(dec), decode_ok=True))
    from colly_spark.operators.av import mp4_params

    prows = []
    for i in range(48):
        p = mp4_params(i)
        # duration round-trips through media units: ms → ts units →
        # ms (floor twice), replicated here WITHOUT touching bytes
        units = p["duration_ms"] * p["timescale"] // 1000
        prows.append(dict(video_id=f"mp4{i:08d}", brand=p["brand"],
                          codec=p["codec"], w=p["w"], h=p["h"],
                          duration_ms=int(units * 1000 // p["timescale"]),
                          n_tracks=1, video_tracks=1, probe_ok=True))
    pt = pa.Table.from_pandas(
        pd.DataFrame(prows), preserve_index=False,
        schema=pa.schema([("video_id", pa.string()),
                          ("brand", pa.string()), ("codec", pa.string()),
                          ("w", pa.int32()), ("h", pa.int32()),
                          ("duration_ms", pa.int32()),
                          ("n_tracks", pa.int32()),
                          ("video_tracks", pa.int32()),
                          ("probe_ok", pa.bool_())]))
    pq.write_table(pt, os.path.join(GOLDEN, "mp4_probe.parquet"))

    vt = pa.Table.from_pandas(
        pd.DataFrame(vrows), preserve_index=False,
        schema=pa.schema([("video_id", pa.string()),
                          ("frame_idx", pa.int32()),
                          ("w", pa.int32()), ("h", pa.int32()),
                          ("phash", pa.int64()),
                          ("decode_ok", pa.bool_())]))
    pq.write_table(vt, os.path.join(GOLDEN, "video_frames.parquet"))
    print(f"av: {len(arows)} audio rows, {len(vrows)} video frame rows, "
          f"{len(prows)} mp4 probe rows")


def make_video_near_dup(n: int = 24, n_variants: int = 12,
                        every: int = 2, variant_quality: int = 85) -> None:
    """video_frames_nd.parquet: plain-Python replica of
    `video_frame_sample(synthesize_videos(n, n_variants=12,
    variant_quality=85), every=2)` — the variant corpus (video n+j
    re-encodes video j's frames at q85; at 16×16 lower qualities
    drift phash past the k=3 radius — measured frame frac(Hamming≤3)
    vs the q95 base: q70 0.73, q85 0.96) whose frame phashes feed the `video_near_dup` oracle. The
    oracle SQL then runs the brute-force aligned-Hamming verify over
    these rows; Manku banded candidates are provably identical for
    k < n_bands, so the engine's banded plan is pinned against the
    O(n²) ground truth."""
    from colly_spark.functions.images import phash64
    from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from colly_spark.operators.av import synth_video_frames

    rows = []
    for i in range(n + n_variants):
        base_i = i if i < n else i - n
        q = 95 if i < n else variant_quality
        for idx, px in enumerate(synth_video_frames(base_i)):
            if idx % every:
                continue
            dec = decode_jpeg(encode_jpeg(px, quality=q))
            rows.append(dict(video_id=f"vid{i:08d}", frame_idx=idx,
                             phash=phash64(dec)))
    t = pa.Table.from_pandas(
        pd.DataFrame(rows), preserve_index=False,
        schema=pa.schema([("video_id", pa.string()),
                          ("frame_idx", pa.int32()),
                          ("phash", pa.int64())]))
    pq.write_table(t, os.path.join(GOLDEN, "video_frames_nd.parquet"))
    print(f"video_near_dup: {len(rows)} frame rows")


def make_gif(n_static: int = 48, n_anim: int = 24, n_variants: int = 12,
             every: int = 2) -> None:
    """gif_decode.parquet + gif_frames.parquet: expected outputs of
    `q_gif_decode` / `q_gif_frames`, computed WITHOUT the GIF codec —
    static phashes straight from the raw synthetic pixels (every 16×16
    image has ≤256 distinct colors, so the exact-palette encoder is
    LOSSLESS and the golden pins that claim end to end), and animated
    frame phashes from the raw per-frame pixels (variants: through the
    JPEG q85 degrade the synthesizer applies, but never through GIF
    bytes). Any GIF encode/decode drift — LZW, palette order,
    compositing — breaks the hash."""
    from colly_spark.functions.images import phash64, synth_pixels
    from colly_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from colly_spark.operators.av import synth_video_frames

    rows = []
    for i in range(n_static):
        px = synth_pixels(i)
        rows.append(dict(image_id=f"img{i:08d}", w=px.shape[1],
                         h=px.shape[0], fmt="gif", phash=phash64(px),
                         decode_ok=True))
    schema = pa.schema([
        ("image_id", pa.string()), ("w", pa.int32()), ("h", pa.int32()),
        ("fmt", pa.string()), ("phash", pa.int64()), ("decode_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "gif_decode.parquet"))

    frows = []
    for i in range(n_anim + n_variants):
        base_i = i if i < n_anim else i - n_anim
        for idx, px in enumerate(synth_video_frames(base_i)):
            if idx % every:
                continue
            if i >= n_anim:
                px = decode_jpeg(encode_jpeg(px, quality=85))
            frows.append(dict(video_id=f"gif{i:08d}", frame_idx=idx,
                              w=px.shape[1], h=px.shape[0],
                              phash=phash64(px), decode_ok=True))
    ft = pa.Table.from_pandas(
        pd.DataFrame(frows), preserve_index=False,
        schema=pa.schema([("video_id", pa.string()),
                          ("frame_idx", pa.int32()),
                          ("w", pa.int32()), ("h", pa.int32()),
                          ("phash", pa.int64()),
                          ("decode_ok", pa.bool_())]))
    pq.write_table(ft, os.path.join(GOLDEN, "gif_frames.parquet"))
    print(f"gif: {len(rows)} static rows, {len(frows)} frame rows")


def make_sitemap(n_domains: int = 2, base: int = 6, seed: int = 42) -> None:
    """sitemap_discover.parquet: expected LEAF entries of
    `q_sitemap_discover` — computed from the fixture's URL-enumeration
    ARITHMETIC alone (fixtures._page_counts + the rich-sitemap field
    formulas), never through XML bytes or the parser, so the golden
    pins the whole chain: index recursion (incl. the self-reference
    cycle), gzip member decode, namespace-prefixed entry tags, field
    typing."""
    from colly_spark.sources.fixtures import CorpusSpec, _domain, _page_counts

    spec = CorpusSpec(seed=seed, n_domains=n_domains,
                      base_pages_per_domain=base, n_images=4)
    cfreq = ("daily", "weekly", "monthly")
    rows = []
    for d in range(n_domains):
        host = _domain(d)
        n = _page_counts(spec)[d]
        urls = [f"http://{host}/"] + [f"http://{host}/page/{i}"
                                      for i in range(1, n)]
        half = max(1, n // 2)
        for part, src in ((list(enumerate(urls))[:half], "sitemap_rich_1.xml"),
                          (list(enumerate(urls))[half:],
                           "sitemap_rich_2.xml.gz")):
            for pi, u in part:
                rows.append(dict(
                    src_sitemap=f"http://{host}/{src}", url=u,
                    lastmod=f"2025-{(pi % 9) + 1:02d}-01",
                    changefreq=cfreq[pi % 3],
                    priority=round(1.0 - (pi % 10) / 10.0, 1)))
    t = pa.Table.from_pandas(
        pd.DataFrame(rows), preserve_index=False,
        schema=pa.schema([("src_sitemap", pa.string()), ("url", pa.string()),
                          ("lastmod", pa.string()),
                          ("changefreq", pa.string()),
                          ("priority", pa.float64())]))
    pq.write_table(t, os.path.join(GOLDEN, "sitemap_discover.parquet"))
    print(f"sitemap: {len(rows)} leaf entries")


def make_audio_fp(n: int = 20, n_variants: int = 10, shift: int = 512,
                  gain: float = 0.8) -> None:
    """audio_fp.parquet: plain-Python replica of
    `audio_fingerprints(synthesize_audio_fp(n, n_variants=10))` —
    landmark constellations computed from the raw samples WITHOUT
    the WAV container round-trip (the audio_features discipline), so
    the golden pins encode→decode→landmark plumbing end to end. The
    `audio_near_dup` oracle SQL then replays stop-hash filtering,
    the hash join, offset voting, and the (votes desc, dt asc) best
    pick over these integer rows bit-exactly."""
    from colly_spark.functions.audio import spectral_landmarks, synth_fp_samples

    rows = []
    for i in range(n + n_variants):
        base_i = i if i < n else i - n
        _rate, x = synth_fp_samples(base_i)
        if i >= n:
            y = np.zeros_like(x)
            y[shift:] = x[:-shift]
            x = np.clip(np.round(y * gain), -32768, 32767).astype(np.int16)
        for h, t in spectral_landmarks(x):
            rows.append(dict(audio_id=f"aud{i:08d}", fp_hash=h, t=t))
    t = pa.Table.from_pandas(
        pd.DataFrame(rows), preserve_index=False,
        schema=pa.schema([("audio_id", pa.string()),
                          ("fp_hash", pa.int64()),
                          ("t", pa.int32())]))
    pq.write_table(t, os.path.join(GOLDEN, "audio_fp.parquet"))
    print(f"audio_fp: {len(rows)} landmark rows")


def make_image_cls_stats(n: int = 96, seed: int = 42,
                         size: int = 16) -> None:
    """image_cls_stats.parquet: the mixed-scene (even smooth / odd
    noise) corpus' pixel statistics — plain-Python replica of
    synthesize_images(scene="mixed") → image_stats, the feature input
    the image_classifier oracle replays GD over."""
    from colly_spark.functions.images import (decode_image, synth_encode,
                                              synth_pixels)
    from colly_spark.operators.multimodal import luma_stats

    cycle = ("png", "jpeg", "webp", "avif", "webp_lossy")
    rows = []
    for i in range(n):
        px = synth_pixels(i, seed, size, scene="mixed")
        fmt, data, _ = synth_encode(px, cycle[i % len(cycle)])
        m, c, e, s = luma_stats(decode_image(data, fmt))
        rows.append(dict(image_id=f"img{i:08d}", fmt=fmt, mean_luma=m,
                         contrast=c, entropy=e, sharpness=s,
                         decode_ok=True))
    schema = pa.schema([
        ("image_id", pa.string()), ("fmt", pa.string()),
        ("mean_luma", pa.float64()), ("contrast", pa.float64()),
        ("entropy", pa.float64()), ("sharpness", pa.float64()),
        ("decode_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_cls_stats.parquet"))
    print(f"image_cls_stats: {len(rows)} rows")


def make_avif_probe(n: int = 64, seed: int = 42) -> None:
    """avif_probe.parquet: expected probe output computed DIRECTLY
    from the deterministic parameter draw (multimodal.avif_params) —
    never through the bytes — so the writer↔prober round-trip
    (functions/avif.encode_avif_stub / probe_avif) is the thing
    pinned, the mp4_probe discipline. Three deterministic poison rows
    (empty, wrong-magic, truncated container) pin the probe_ok=false
    path in-driver."""
    from colly_spark.operators.multimodal import avif_params

    rows = []
    for i in range(n):
        p = avif_params(i, seed)
        rows.append(dict(image_id=f"avf{i:08d}", brand=p["brand"],
                         w=p["w"], h=p["h"], depth=p["depth"],
                         n_items=2 if p["alpha"] else 1,
                         alpha=p["alpha"], rotation=p["rotation"],
                         mirror=p["mirror"],
                         seq_profile=p["seq_profile"],
                         animated=p["brand"] == "avis", probe_ok=True))
    for pid in ("avfpoison01", "avfpoison02", "avfpoison03"):
        rows.append(dict(image_id=pid, brand=None, w=None, h=None,
                         depth=None, n_items=None, alpha=None,
                         rotation=None, mirror=None, seq_profile=None,
                         animated=None, probe_ok=False))
    schema = pa.schema([
        ("image_id", pa.string()), ("brand", pa.string()),
        ("w", pa.int32()), ("h", pa.int32()), ("depth", pa.int32()),
        ("n_items", pa.int32()), ("alpha", pa.bool_()),
        ("rotation", pa.int32()), ("mirror", pa.int32()),
        ("seq_profile", pa.int32()), ("animated", pa.bool_()),
        ("probe_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "avif_probe.parquet"))
    print(f"avif_probe: {len(rows)} rows")


def make_image_probe(n_imgs: int = 50, n_avif: int = 12,
                     n_anim: int = 4, size: int = 16) -> None:
    """image_probe.parquet: expected unified-header-probe output
    computed DIRECTLY from the parameter draws (synthesize_images'
    fmt cycle + size, multimodal.avif_params, the animated-gif frame
    count) — never through the bytes, so the five container families'
    writer↔prober round-trips are the thing pinned. Three poison rows
    pin counted rejection."""
    from colly_spark.operators.multimodal import avif_params

    cycle = ("png", "jpeg", "webp", "gif", "webp")  # webp_lossy → webp
    rows = []
    for i in range(n_imgs):
        rows.append(dict(image_id=f"img{i:08d}",
                         fmt_detected=cycle[i % len(cycle)],
                         w=size, h=size, depth=8, alpha=False,
                         animated=False, probe_ok=True))
    for i in range(n_avif):
        p = avif_params(i)
        rows.append(dict(image_id=f"avf{i:08d}", fmt_detected="avif",
                         w=p["w"], h=p["h"], depth=p["depth"],
                         alpha=p["alpha"],
                         animated=p["brand"] == "avis", probe_ok=True))
    for i in range(n_anim):
        rows.append(dict(image_id=f"anm{i:08d}", fmt_detected="gif",
                         w=size, h=size, depth=8, alpha=False,
                         animated=True, probe_ok=True))
    for pid in ("zzzpoison01", "zzzpoison02", "zzzpoison03"):
        rows.append(dict(image_id=pid, fmt_detected=None, w=None,
                         h=None, depth=None, alpha=None, animated=None,
                         probe_ok=False))
    schema = pa.schema([
        ("image_id", pa.string()), ("fmt_detected", pa.string()),
        ("w", pa.int32()), ("h", pa.int32()), ("depth", pa.int32()),
        ("alpha", pa.bool_()), ("animated", pa.bool_()),
        ("probe_ok", pa.bool_()),
    ])
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema,
                               preserve_index=False)
    pq.write_table(tbl, os.path.join(GOLDEN, "image_probe.parquet"))
    print(f"image_probe: {len(rows)} rows")


def make_ann_ivfpq() -> None:
    """ann_ivfpq.parquet + ann_ivfpq_refined.parquet: expected top-k of
    the IVF-PQ queries over the sf0.01 embeddings table, computed by
    the independent numpy replica (oracle/ivfpq_ref.py) with the SAME
    seeded centroids/codebooks the engine derives — ADC scoring and
    codebook residual quantization are not one SQL statement, so the
    golden discipline applies (the driver gate runs at sf0.01; tests
    replay the replica on other inputs)."""
    import duckdb

    from colly_spark.operators.pq import pq_codebooks
    from colly_spark.operators.similarity import ivf_centroids
    from colly_spark.oracle import ivfpq_ref

    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM"
        " '/root/testdata/sf0.01/embeddings.parquet'"
        " ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    cents = ivf_centroids(dim=64, nlist=16, seed=7)
    books = pq_codebooks(dim=64, m=8, nbits=4, seed=11)
    qids = ids[ids < 8]

    for name, refine, col in (("ann_ivfpq", 0, "adc_sim"),
                              ("ann_ivfpq_refined", 24, "cos_sim")):
        out = ivfpq_ref.topk(ids, vecs, qids, cents, books,
                             k=5, nprobe=4, refine=refine)
        t = pa.Table.from_pandas(
            pd.DataFrame(out, columns=["query_id", "neighbor_id",
                                       "rank", col]),
            schema=pa.schema([("query_id", pa.int64()),
                              ("neighbor_id", pa.int64()),
                              ("rank", pa.int32()),
                              (col, pa.float64())]),
            preserve_index=False)
        pq.write_table(t, os.path.join(GOLDEN, f"{name}.parquet"))
        print(f"{name}: {len(out)} rows")


def make_ann_ivf() -> None:
    """ann_ivf_trained.parquet + ann_ivf_prod.parquet: expected top-k
    of the two formerly rows-only IVF queries over the sf0.01
    embeddings table, computed by the independent numpy/decimal
    replica (oracle/ivf_ref.py). ann_ivf_trained is reproducible
    because ivf_train_kmeans(..., exact=True) makes the Lloyd-loop
    cell sums order-independent (round-12 + DECIMAL — the repo's
    engine-neutral float discipline); ann_ivf_prod is serving-only on
    fixed harness centroids with the deterministic 64→256 widening.
    Same golden discipline as make_ann_ivfpq (driver gate runs at
    sf0.01; tests replay the replica on other inputs)."""
    import duckdb

    from colly_spark.oracle import ivf_ref

    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM"
        " '/root/testdata/sf0.01/embeddings.parquet'"
        " ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    qids = ids[ids < 8]

    trained = ivf_ref.train_kmeans(vecs, nlist=8, n_iter=3, dim=64, seed=7)
    jobs = (
        ("ann_ivf_trained", ivf_ref.ivf_topk(ids, vecs, qids, trained,
                                             k=5, nprobe=2)),
        ("ann_ivf_prod", ivf_ref.ivf_topk(
            ids, ivf_ref.widen_256(vecs), qids,
            ivf_ref.init_centroids(256, 1024, seed=7), k=5, nprobe=64)),
    )
    for name, out in jobs:
        t = pa.Table.from_pandas(
            pd.DataFrame(out, columns=["query_id", "neighbor_id",
                                       "rank", "cos_sim"]),
            schema=pa.schema([("query_id", pa.int64()),
                              ("neighbor_id", pa.int64()),
                              ("rank", pa.int32()),
                              ("cos_sim", pa.float64())]),
            preserve_index=False)
        pq.write_table(t, os.path.join(GOLDEN, f"{name}.parquet"))
        print(f"{name}: {len(out)} rows")


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    make_crawl_trace()
    make_boilerplate()
    make_crawl_events()
    make_image_decode()
    make_image_stats()
    make_image_curation()
    make_image_phash()
    make_images_meta()
    make_image_metadata_scrub()
    make_warc_fixture()
    make_webdataset_fixture()
    make_bpe()
    make_unigram()
    make_av()
    make_gif()
    make_sitemap()
    make_video_near_dup()
    make_audio_fp()
    make_ann_ivfpq()
    make_ann_ivf()
    make_image_cls_stats()
    make_avif_probe()
    make_image_probe()
