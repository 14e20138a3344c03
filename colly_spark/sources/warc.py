"""WARC (ISO 28500 / WARC-1.1) ingest + export — the archival wire
format of web-scale crawling (Common Crawl ships ~64k .warc.gz files
per monthly snapshot).  A crawl engine that cannot read or write WARC
cannot exchange data with the rest of the crawl ecosystem, so both
directions are first-class here:

- ``to_warc(df, out_dir)`` — distributed sink: one ``.warc.gz`` per
  partition, each record an independent gzip member (the standard
  record-at-time compression, which is what makes member-level random
  access possible), written executor-side with a tiny manifest
  DataFrame returned (path, records, bytes per file) — no data ever
  moves to the driver.
- ``read_warc(spark, glob)`` — distributed source: whole-file
  parallelism over ``binaryFile`` rows (the Common-Crawl-native split:
  many ~1 GiB files), parsing gzip members incrementally with
  ``zlib(wbits=31)`` so each member's compressed offset/length are
  recovered — the reader doubles as the CDX indexer.
- ``warc_cdx(spark, glob)`` — the CDX-style member index
  (url, path, offset, length, digest) derived declaratively from the
  reader output.
- ``read_warc_members(spark, index_df)`` — record-level parallelism:
  seek-read individual gzip members by (path, offset, length) from a
  CDX index — the scale path when files are few and huge, and the
  shape of an object-store range request.

Record layout per ISO 28500: CRLF-terminated header lines, blank line,
``Content-Length`` block bytes, then CRLF CRLF.  Response records wrap
a full HTTP/1.1 message (``Content-Type: application/http;
msgtype=response``).  Determinism: gzip mtime pinned to 0, record IDs
are UUIDv5-style names derived from (url, date), WARC-Date comes from
the data, never the clock.

Reference tie-in: the reference engine keeps responses in memory and
hands them to callbacks (response.go); WARC is how a distributed crawl
persists that same (url, status, headers, body) tuple durably.  All
parsing is Arrow-batched (mapInPandas); bodies stay ``binary`` columns.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import uuid
import zlib

CRLF = "\r\n"
_HTTP_CT = "application/http; msgtype=response"
_SCHEMA = ("path string, offset long, length long, warc_type string, "
           "record_id string, url string, warc_date string, status int, "
           "content_type string, body binary")
_MANIFEST_SCHEMA = "path string, records long, bytes long"
# fixed namespace for deterministic record IDs (any stable UUID works;
# this one is uuid5(NIL, 'colly-spark-warc'))
_ID_NS = uuid.uuid5(uuid.UUID(int=0), "colly-spark-warc")


def record_id(url: str, date: str) -> str:
    return f"<urn:uuid:{uuid.uuid5(_ID_NS, f'{date} {url}')}>"


def build_response_record(url: str, date: str, status: int,
                          content_type: str, body: bytes,
                          http_headers: list[tuple[str, str]] | None = None,
                          ) -> bytes:
    """One uncompressed WARC/1.1 response record (bytes)."""
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found",
              404: "Not Found", 500: "Internal Server Error"}.get(status, "X")
    lines = [f"HTTP/1.1 {status} {reason}",
             f"Content-Type: {content_type}",
             f"Content-Length: {len(body)}"]
    for k, v in (http_headers or []):
        lines.append(f"{k}: {v}")
    http = (CRLF.join(lines) + CRLF + CRLF).encode("ascii") + body
    hdr = [
        "WARC/1.1",
        "WARC-Type: response",
        f"WARC-Record-ID: {record_id(url, date)}",
        f"WARC-Date: {date}",
        f"WARC-Target-URI: {url}",
        f"WARC-Payload-Digest: sha256:{hashlib.sha256(body).hexdigest()}",
        f"Content-Type: {_HTTP_CT}",
        f"Content-Length: {len(http)}",
    ]
    return (CRLF.join(hdr) + CRLF + CRLF).encode("ascii") + http + b"\r\n\r\n"


def build_warcinfo(date: str, payload: str = "software: colly-spark\r\n",
                   ) -> bytes:
    body = payload.encode("ascii")
    hdr = ["WARC/1.1", "WARC-Type: warcinfo",
           f"WARC-Record-ID: {record_id('warcinfo', date)}",
           f"WARC-Date: {date}",
           "Content-Type: application/warc-fields",
           f"Content-Length: {len(body)}"]
    return (CRLF.join(hdr) + CRLF + CRLF).encode("ascii") + body + b"\r\n\r\n"


def gzip_member(record: bytes) -> bytes:
    """Compress one record as an independent gzip member, mtime pinned
    for byte-deterministic output."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# parsing


def _parse_record(raw: bytes, path: str, offset: int, length: int) -> dict:
    """One uncompressed record → reader-schema dict."""
    split = raw.find(b"\r\n\r\n")
    head = raw[:split].decode("ascii", "replace").split(CRLF)
    fields = {}
    for line in head[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    n = int(fields.get("content-length", "0"))
    block = raw[split + 4:split + 4 + n]
    wtype = fields.get("warc-type", "")
    status, ctype, body = None, None, None
    if wtype == "response" and fields.get("content-type", "").startswith(
            "application/http"):
        hsplit = block.find(b"\r\n\r\n")
        hlines = block[:hsplit].decode("ascii", "replace").split(CRLF)
        try:
            status = int(hlines[0].split(" ", 2)[1])
        except (IndexError, ValueError):
            status = None
        for line in hlines[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
        body = block[hsplit + 4:]
    return dict(path=path, offset=offset, length=length, warc_type=wtype,
                record_id=fields.get("warc-record-id"),
                url=fields.get("warc-target-uri"),
                warc_date=fields.get("warc-date"), status=status,
                content_type=ctype, body=body)


def parse_warc_bytes(data: bytes, path: str = ""):
    """Yield reader-schema dicts from one WARC file's bytes — gzip
    (member per record) or plain, auto-detected.  Tracks each member's
    compressed (offset, length) so the parse doubles as CDX indexing."""
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            raw = d.decompress(data[pos:])
            consumed = len(data) - pos - len(d.unused_data)
            yield _parse_record(raw, path, pos, consumed)
            pos += consumed
    else:
        pos = 0
        while pos < len(data):
            split = data.find(b"\r\n\r\n", pos)
            if split < 0:
                break
            head = data[pos:split].decode("ascii", "replace")
            n = 0
            for line in head.split(CRLF):
                if line.lower().startswith("content-length:"):
                    n = int(line.split(":", 1)[1])
            end = split + 4 + n + 4  # block + closing CRLF CRLF
            yield _parse_record(data[pos:end], path, pos, end - pos)
            pos = end


_READER_COLS = ("path", "offset", "length", "warc_type", "record_id",
                "url", "warc_date", "status", "content_type", "body")


def _rows_pdf(rows: list[dict]):
    """Reader-schema pandas frame with Arrow-safe dtypes (status is
    null for non-response records — nullable Int32, never float)."""
    import pandas as pd

    pdf = (pd.DataFrame(rows, columns=_READER_COLS) if rows
           else pd.DataFrame({c: [] for c in _READER_COLS}))
    pdf["status"] = pdf["status"].astype("Int32")
    return pdf


# ---------------------------------------------------------------------------
# Spark surfaces


def read_warc(spark, path_glob: str):
    """Distributed WARC scan: one task per file (binaryFile source —
    the Common Crawl shape is tens of thousands of ~1 GiB files, so
    file granularity IS the right split; for few huge files use
    warc_cdx + read_warc_members).  Returns
    (path, offset, length, warc_type, record_id, url, warc_date,
    status, content_type, body)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), path))
            yield _rows_pdf(rows)

    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content"))
    return files.mapInPandas(parse, schema=_SCHEMA)


def warc_cdx(spark, path_glob: str):
    """CDX-style member index over a WARC glob: where every URL's
    record lives (path, offset, length) + its payload digest — the
    lookup table that makes record-level random access possible."""
    from pyspark.sql import functions as F

    return (read_warc(spark, path_glob)
            .filter(F.col("warc_type") == "response")
            .select("url", "path", "offset", "length",
                    F.sha2(F.col("body"), 256).alias("digest")))


def read_warc_members(spark, index_df):
    """Record-level parallel reads: seek to each (path, offset) and
    decompress exactly that gzip member — the object-store range-GET
    shape.  ``index_df`` needs (path, offset, length); repartition it
    to spread members of one huge file across the cluster."""

    def fetch(batches):
        for pdf in batches:
            rows = []
            for path, off, ln in zip(pdf["path"], pdf["offset"],
                                     pdf["length"]):
                if path.startswith("file:"):
                    from urllib.parse import unquote, urlparse
                    local = unquote(urlparse(path).path)
                else:
                    local = path
                with open(local, "rb") as f:
                    f.seek(int(off))
                    member = f.read(int(ln))
                raw = zlib.decompressobj(wbits=31).decompress(member)
                rows.append(_parse_record(raw, path, int(off), int(ln)))
            yield _rows_pdf(rows)

    return index_df.select("path", "offset", "length").mapInPandas(
        fetch, schema=_SCHEMA)


def to_warc(df, out_dir: str, warcinfo_date: str = "2026-01-01T00:00:00Z"):
    """Distributed WARC export: each partition of ``df`` —
    (url, warc_date, status, content_type, body) — becomes one
    ``part-NNNNN.warc.gz`` (warcinfo member first, then one member per
    record), written executor-side.  Returns the collected manifest
    [(path, records, bytes)]; the action IS the write.  Partition the
    input by whatever locality the archive should have (e.g.
    repartitionByRange on url for CDX-friendly ordering)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write(batches):
        import os

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        chunks = [gzip_member(build_warcinfo(warcinfo_date))]
        n = 0
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rec = build_response_record(
                    r.url, r.warc_date, int(r.status),
                    r.content_type, bytes(r.body))
                chunks.append(gzip_member(rec))
                n += 1
        blob = b"".join(chunks)
        with open(path, "wb") as f:
            f.write(blob)
        yield pd.DataFrame({"path": [path], "records": [n],
                            "bytes": [len(blob)]})

    cols = ["url", "warc_date", "status", "content_type", "body"]
    return df.select(*cols).mapInPandas(
        write, schema=_MANIFEST_SCHEMA).collect()
