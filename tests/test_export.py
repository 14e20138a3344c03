"""`export` CLI: crawl state → WebDataset tar shards of the fetched
image samples, with CDC-correct incremental semantics (--since B ships
exactly the images NOT seen by snapshot B — incremental read of the
new range + anti-join against the shipped range, so re-references of
already-shipped images never re-ship)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from colly_spark.__main__ import main
from colly_spark.plans.crawler import Crawler

from tests.test_compaction import SEEDS, _cfg


@pytest.fixture(scope="module")
def export_crawl(spark, tmp_path_factory):
    """One politeness-bounded drain over the DEFAULT fixture corpus —
    the same corpus spec cmd_export's --fixture-corpus rebuilds, so
    the byte-source join is exact."""
    from colly_spark.plans.util import to_spark_corpus
    from colly_spark.sources.fixtures import CorpusSpec, make_corpus

    corpus = to_spark_corpus(spark, make_corpus(CorpusSpec(seed=42)))
    state = str(tmp_path_factory.mktemp("export_state"))
    h = Crawler(spark, corpus, _cfg(), state,
                bloom_threshold_rows=0, compact_every=0).run(SEEDS)
    return corpus, state, h


def _keys(spark, out_dir):
    from colly_spark.sources.webdataset import read_webdataset

    comp = read_webdataset(spark, os.path.join(out_dir, "*.tar"))
    return {r["key"] for r in comp.select("key").distinct().collect()}


def test_export_full_then_incremental(spark, export_crawl, tmp_path,
                                      capsys):
    corpus, state, h = export_crawl
    # split point: a snapshot with some ok images before it and the
    # rest strictly after (image fetches cluster late in a politeness-
    # bounded drain, so an arbitrary early snapshot may precede all)
    img_batches = sorted(r["batch"] for r in
                         h.images().filter(F.col("ok"))
                         .select("batch").collect())
    assert len(set(img_batches)) >= 2, img_batches
    a = img_batches[len(img_batches) // 2]
    if a == img_batches[-1]:
        a = sorted(set(img_batches))[-2]

    full_dir = str(tmp_path / "full")
    assert main(["export", "--state-dir", state, "--out", full_dir,
                 "--fixture-corpus", "--cpus", "4",
                 "--shuffle-partitions", "8"]) == 0
    full_sum = json.loads(capsys.readouterr().out.strip())

    inc_dir = str(tmp_path / "inc")
    assert main(["export", "--state-dir", state, "--out", inc_dir,
                 "--fixture-corpus", "--since", str(a), "--cpus", "4",
                 "--shuffle-partitions", "8"]) == 0
    inc_sum = json.loads(capsys.readouterr().out.strip())

    ok_ids = {r["image_id"] for r in
              h.images().filter(F.col("ok")).collect()}
    early_ids = {r["image_id"] for r in
                 h.images(as_of=a).filter(F.col("ok")).collect()}
    assert _keys(spark, full_dir) == ok_ids
    assert _keys(spark, inc_dir) == ok_ids - early_ids
    assert full_sum["samples"] == len(ok_ids)
    assert inc_sum["samples"] == len(ok_ids - early_ids)
    assert 0 < inc_sum["samples"] < full_sum["samples"]


def test_export_sample_bytes_roundtrip(spark, export_crawl, tmp_path,
                                       capsys):
    """A shipped sample's image component is byte-identical to the
    corpus row, its .txt is the caption, and the .json metadata
    carries the crawl provenance (first_batch, n_refs)."""
    from colly_spark.sources.webdataset import read_webdataset

    corpus, state, _h = export_crawl
    out = str(tmp_path / "wds")
    assert main(["export", "--state-dir", state, "--out", out,
                 "--fixture-corpus", "--cpus", "4",
                 "--shuffle-partitions", "8"]) == 0
    capsys.readouterr()
    comp = read_webdataset(spark, os.path.join(out, "*.tar")).collect()
    by_key: dict = {}
    for r in comp:
        by_key.setdefault(r["key"], {})[r["ext"]] = bytes(r["data"])
    src = {r["image_id"]: r for r in corpus["images"].collect()}
    assert by_key
    for key, files in by_key.items():
        row = src[key]
        assert files[row["fmt"]] == bytes(row["bytes"])
        assert files["txt"].decode() == (row["caption"] or "")
        meta = json.loads(files["json"])
        assert meta["fmt"] == row["fmt"]
        assert meta["n_refs"] >= 1 and meta["first_batch"] >= 0


def test_export_requires_byte_source(tmp_path, capsys):
    assert main(["export", "--state-dir", str(tmp_path),
                 "--out", str(tmp_path / "o")]) == 2
