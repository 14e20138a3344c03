"""Round-3 hardening fixes (ADVICE.md items): winnowing operates on
code points (engine/oracle parity on non-ASCII text), utf-16 BOM
consumption, and CLI argument validation."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


NON_ASCII_DOCS = [
    (0, "Le caf\xe9 \xe9tait ouvert — caf\xe9 au lait pour tous"),
    (1, "日本語のテキストです。"
        "重複検出のための文書で"
        "す。"),
    (2, "mixed ascii and \xfcml\xe4uts pl\xfcs русс"
        "кий text"),
    (3, "plain ascii control document with enough length to fingerprint"),
]


def test_winnow_non_ascii_matches_oracle(spark):
    """winnow_udf hashes CODE POINTS (not UTF-8 bytes) and reports
    character positions — bit-exact vs the DuckDB oracle's
    ord(substr(t,i,1)) replay on accented/CJK/Cyrillic text."""
    sdf = spark.createDataFrame(NON_ASCII_DOCS, "doc_id long, text string")
    from colly_spark.operators.text_dedup import winnow_udf

    eng = sorted(
        (r["doc_id"], r["s"]["pos"], r["s"]["fp"])
        for r in sdf.select(
            "doc_id",
            F.explode(winnow_udf(k=8, w=4)(F.col("text"))).alias("s"),
        ).collect())

    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(NON_ASCII_DOCS,
                                         columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT doc_id, text FROM docs_pd")
    sql = entry_mod.oracle_sql()["winnow_fingerprints"]
    ora = sorted(map(tuple, con.sql(sql).fetchall()))
    assert eng == ora


def test_winnow_positions_are_character_positions(spark):
    """A 2-byte character before the fingerprinted region must not
    shift positions (they are code-point indexed, like the oracle's)."""
    from colly_spark.operators.text_dedup import winnow_udf

    base = "abcdefghijklmnop"
    rows = [(0, "X" + base), (1, "\xe9" + base)]  # 1-byte vs 2-byte prefix
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = sdf.select(
        "doc_id", F.explode(winnow_udf(k=8, w=4)(F.col("text"))).alias("s"))
    pos = {}
    for r in out.collect():
        pos.setdefault(r["doc_id"], []).append(r["s"]["pos"])
    # the shared suffix grams sit at identical character positions
    assert [p for p in pos[0] if p > 1] == [p for p in pos[1] if p > 1]


def test_utf16_bom_consumed_in_decode_text():
    from colly_spark.operators.extract import decode_text

    le = ("\ufeff" + "hello").encode("utf-16-le")  # BOM + text, LE
    be = ("\ufeff" + "hello").encode("utf-16-be")  # BOM + text, BE
    assert decode_text(le, "text/html", detect=True) == "hello"
    assert decode_text(be, "text/html", detect=True) == "hello"


def test_cli_crawl_requires_corpus(capsys, tmp_path):
    from colly_spark.__main__ import main

    rc = main(["crawl", "--state-dir", str(tmp_path / "st"),
               "http://a.test/"])
    assert rc == 2
    assert "--corpus" in capsys.readouterr().err


def test_smj_fallback_matches_shj_fetch_join(spark, corpus_spark, tmp_path,
                                             monkeypatch):
    """The fetch join falls back from the shuffle-hash hint to
    sort-merge when the frontier's per-partition build rows exceed
    COLLY_SHJ_ROWS_PER_PART (the hash map otherwise outgrows task
    memory at stress corpus sizes). Forcing the fallback (cap=0) must
    produce an identical crawl: same trace rows, same seen set."""
    from colly_spark.config import CrawlConfig
    from colly_spark.plans.crawler import Crawler

    cfg = CrawlConfig(max_depth=2, ignore_robots=True)
    seeds = ["http://d00.test/", "http://d01.test/"]

    def run(state, **env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        h = Crawler(spark, corpus_spark, cfg, state).run(
            list(seeds), max_batches=20)
        trace = sorted(map(tuple, h.trace().select(
            "batch", "seq", "url", "status").collect()))
        seen = {r["url_hash"] for r in h.visited().collect()}
        for k in env:
            monkeypatch.delenv(k)
        return trace, seen

    shj = run(str(tmp_path / "shj"))
    smj = run(str(tmp_path / "smj"), COLLY_SHJ_ROWS_PER_PART="0")
    assert len(shj[0]) > 2 and shj[1]     # a real crawl, not a no-op
    assert shj == smj
