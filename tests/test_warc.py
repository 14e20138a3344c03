"""WARC ingest/export (sources/warc.py).

Pins:
- a hand-written ISO 28500 record (literal bytes, framed per the spec
  text) parses to the exact fields — the parser is checked against the
  SPEC, not against our own writer;
- distributed round-trip: to_warc partitions → read_warc recovers the
  exact (url, date, status, content_type, body) multiset; manifest
  counts match;
- CDX member index + seek-read (read_warc_members) returns the same
  records as the full scan — record-level random access works;
- plain (uncompressed) .warc and gzip member files parse identically;
- framing traps: empty body, CRLFCRLF inside a body, raw bytes.
"""

import glob
import os

from pyspark.sql import functions as F

from colly_spark.sources.warc import (parse_warc_bytes, read_warc,
                                      read_warc_members, to_warc, warc_cdx)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_GLOB = os.path.join(REPO, "golden", "warc", "*.warc*")

# framed exactly per ISO 28500: CRLF header lines, blank line,
# Content-Length block bytes, CRLF CRLF
_KAT = (b"WARC/1.1\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
        b"WARC-Date: 2026-02-03T04:05:06Z\r\n"
        b"WARC-Target-URI: http://kat.test/a\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 78\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: 14\r\n"
        b"\r\n"
        b"hello\r\n\r\nworld"
        b"\r\n\r\n")


def test_spec_kat_parses():
    recs = list(parse_warc_bytes(_KAT, path="kat"))
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "response"
    assert r["url"] == "http://kat.test/a"
    assert r["warc_date"] == "2026-02-03T04:05:06Z"
    assert r["status"] == 200
    assert r["content_type"] == "text/html"
    assert r["body"] == b"hello\r\n\r\nworld"  # CRLFCRLF inside survives
    assert r["offset"] == 0 and r["length"] == len(_KAT)


def _round_trip_rows():
    return [
        (f"http://rt{i % 3}.test/p/{i}", f"2026-03-0{i % 9 + 1}T00:00:00Z",
         [200, 301, 404][i % 3], "text/html; charset=utf-8",
         (b"" if i == 0 else b"a\r\n\r\nb" + bytes([i]) * (i % 5)))
        for i in range(17)
    ]


def test_round_trip_distributed(spark, tmp_path):
    rows = _round_trip_rows()
    df = spark.createDataFrame(
        rows, "url string, warc_date string, status int, "
              "content_type string, body binary").repartition(4)
    out = str(tmp_path / "arch")
    manifest = to_warc(df, out)
    assert sum(m.records for m in manifest) == 17
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == len(manifest)

    back = (read_warc(spark, os.path.join(out, "*.warc.gz"))
            .filter(F.col("warc_type") == "response")
            .select("url", "warc_date", "status", "content_type", "body")
            .collect())
    got = {(r.url, r.warc_date, r.status, r.content_type,
            bytes(r.body)) for r in back}
    assert got == set(rows)


def test_warcinfo_records_present_and_typed(spark, tmp_path):
    df = spark.createDataFrame(
        _round_trip_rows(), "url string, warc_date string, status int, "
                            "content_type string, body binary").coalesce(1)
    out = str(tmp_path / "arch2")
    to_warc(df, out)
    types = dict(read_warc(spark, os.path.join(out, "*.warc.gz"))
                 .groupBy("warc_type").count().collect())
    assert types == {"warcinfo": 1, "response": 17}


def test_cdx_member_reads_match_full_scan(spark):
    full = (read_warc(spark, FIXTURE_GLOB)
            .filter((F.col("warc_type") == "response")
                    & F.col("path").endswith(".warc.gz")))
    expected = {(r.url, bytes(r.body)) for r in full.collect()}
    assert len(expected) == 30  # the two gz fixture files
    idx = warc_cdx(spark, FIXTURE_GLOB).filter(
        F.col("path").endswith(".warc.gz"))
    got = {(r.url, bytes(r.body))
           for r in read_warc_members(spark, idx.repartition(8)).collect()}
    assert got == expected


def test_plain_and_gz_fixture_files_parse(spark):
    by_file = dict(read_warc(spark, FIXTURE_GLOB)
                   .filter(F.col("warc_type") == "response")
                   .groupBy(F.element_at(F.split("path", "/"), -1))
                   .count().collect())
    assert by_file == {"part-00000.warc.gz": 15, "part-00001.warc.gz": 15,
                       "part-00002.warc": 10}
