"""WebDataset tar-shard export/ingest (sources/webdataset.py).

Pins:
- key-split convention KATs (first dot of the basename);
- EXPORTER byte-equality: to_webdataset over the Spark-synthesized
  image table (one partition, shard_rows=16) reproduces the golden
  fixture shards byte-identically — the distributed writer is checked
  against the plain-Python framing replica, and determinism falls out;
- distributed round-trip: image_samples → to_webdataset partitions →
  read_webdataset recovers exact bytes/captions/metadata per key;
- shard rolling: shard_rows caps every shard, manifest counts match;
- component index + seek-read (read_webdataset_members) returns the
  same bytes as the full scan — range-GET access works;
- samples_from_components reassembles the sample shape declaratively.
"""

import glob
import json
import os

from pyspark.sql import functions as F

from colly_spark.sources.webdataset import (build_shard, image_samples,
                                            parse_shard_bytes,
                                            read_webdataset,
                                            read_webdataset_members,
                                            samples_from_components,
                                            split_key, to_webdataset,
                                            webdataset_index)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_GLOB = os.path.join(REPO, "golden", "wds", "*.tar")
CYCLE = ("png", "jpeg", "webp", "avif", "webp_lossy")


def test_split_key_kats():
    assert split_key("000042.jpg") == ("000042", "jpg")
    assert split_key("000042.seg.png") == ("000042", "seg.png")
    assert split_key("dir.v2/000042.txt") == ("dir.v2/000042", "txt")
    assert split_key("noext") == ("noext", "")


def test_shard_framing_roundtrip_plain_python():
    samples = [("a", {"txt": b"hello", "json": b"{}"}),
               ("b", {"bin": b"\x00\xff" * 10})]
    got = list(parse_shard_bytes(build_shard(samples), "p"))
    assert [(r["key"], r["ext"], r["data"]) for r in got] == [
        ("a", "json", b"{}"), ("a", "txt", b"hello"),
        ("b", "bin", b"\x00\xff" * 10)]
    # offsets are real: data lives at offset inside the shard bytes
    blob = build_shard(samples)
    for r in parse_shard_bytes(blob, "p"):
        assert blob[r["offset"]:r["offset"] + r["size"]] == r["data"]


def _image_samples_df(spark, n=40):
    from colly_spark.operators.multimodal import synthesize_images

    return image_samples(synthesize_images(spark, n, fmt_cycle=CYCLE))


def test_exporter_matches_golden_fixture_bytes(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = to_webdataset(_image_samples_df(spark).coalesce(1), out,
                             shard_rows=16)
    assert sorted(m["samples"] for m in manifest) == [8, 16, 16]
    got = sorted(glob.glob(os.path.join(out, "*.tar")))
    want = sorted(glob.glob(FIXTURE_GLOB))
    assert [os.path.basename(p) for p in got] == [
        os.path.basename(p) for p in want]
    for g, w in zip(got, want):
        with open(g, "rb") as fg, open(w, "rb") as fw:
            assert fg.read() == fw.read(), os.path.basename(g)


def test_distributed_roundtrip_and_shard_rolling(spark, tmp_path):
    from colly_spark.operators.multimodal import synthesize_images

    out = str(tmp_path / "wds")
    src = synthesize_images(spark, 37, fmt_cycle=CYCLE)
    manifest = to_webdataset(image_samples(src).repartition(4), out,
                             shard_rows=5)
    assert sum(m["samples"] for m in manifest) == 37
    assert max(m["samples"] for m in manifest) <= 5
    assert sum(m["files"] for m in manifest) == 37 * 3

    comps = read_webdataset(spark, os.path.join(out, "*.tar"))
    rows = comps.collect()
    assert len(rows) == 37 * 3
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], {})[r["ext"]] = bytes(r["data"])
    for s in src.collect():
        files = by_key[s["image_id"]]
        assert files[s["fmt"]] == bytes(s["bytes"])
        assert files["txt"].decode() == s["caption"]
        meta = json.loads(files["json"])
        assert (meta["w"], meta["h"], meta["phash"], meta["fmt"]) == (
            s["w"], s["h"], s["phash"], s["fmt"])


def test_member_seek_read_equals_full_scan(spark, tmp_path):
    out = str(tmp_path / "wds")
    to_webdataset(_image_samples_df(spark, 20).repartition(3), out,
                  shard_rows=4)
    idx = webdataset_index(spark, os.path.join(out, "*.tar"))
    full = {(r["key"], r["ext"]): bytes(r["data"])
            for r in read_webdataset(spark, os.path.join(out, "*.tar"))
            .collect()}
    via_members = {(r["key"], r["ext"]): bytes(r["data"])
                   for r in read_webdataset_members(
                       spark, idx.repartition(6)).collect()}
    assert via_members == full


def test_samples_from_components(spark, tmp_path):
    out = str(tmp_path / "wds")
    to_webdataset(_image_samples_df(spark, 10).repartition(2), out,
                  shard_rows=4)
    comps = read_webdataset(spark, os.path.join(out, "*.tar"))
    got = {r["key"]: dict(r["files"])
           for r in samples_from_components(comps).collect()}
    assert len(got) == 10
    assert all(sorted(v) == sorted(["json", "txt"] + [CYCLE[i % 5]
               if CYCLE[i % 5] != "webp_lossy" else "webp"])
               for i, (k, v) in enumerate(sorted(got.items())))


def test_scan_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    import duckdb

    s = entry.q_webdataset_scan(spark, "").toPandas()
    d = duckdb.sql(entry.oracle_sql()["webdataset_scan"]).df()
    assert list(map(tuple, s[sorted(s.columns)].values.tolist())) == \
        list(map(tuple, d[sorted(d.columns)].values.tolist()))
