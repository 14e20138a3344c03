"""Regression tests for the round-1 ADVICE findings."""

from pyspark.sql import functions as F

from colly_spark.config import CrawlConfig
from colly_spark.operators.filters import admission_error_expr
from colly_spark.operators.unmarshal import extract_fields


def _admit_errors(spark, cfg, hosts):
    df = spark.createDataFrame(
        [(f"http://{h}/", h, 1) for h in hosts], "url string, host string, depth int")
    expr = admission_error_expr(cfg, F.col("url"), F.col("host"), F.col("depth"))
    rows = df.select("host", expr.alias("err")).collect()
    return {r["host"]: r["err"] for r in rows}

class TestGlobAnchoring:
    """Globs are full-host matches (gobwas/glob), not substring searches."""

    def test_allowed_glob_rejects_prefixed_host(self, spark):
        cfg = CrawlConfig(allowed_domain_globs=("src*.test",))
        errs = _admit_errors(spark, cfg, ["src0.test", "evilsrc0.test", "src0.test.evil"])
        assert errs["src0.test"] is None
        assert errs["evilsrc0.test"] == "forbidden_domain"
        assert errs["src0.test.evil"] == "forbidden_domain"

    def test_disallowed_glob_not_substring(self, spark):
        cfg = CrawlConfig(disallowed_domain_globs=("bad.*",))
        errs = _admit_errors(spark, cfg, ["bad.test", "notbad.test"])
        assert errs["bad.test"] == "forbidden_domain"
        assert errs["notbad.test"] is None

    def test_matches_oracle_fnmatchcase(self, spark):
        from colly_spark.oracle.simulator import _glob_any as sim_glob  # noqa: F401
        import fnmatch
        globs = ("src*.test", "*.example.org")
        hosts = ["src0.test", "evilsrc0.test", "a.example.org",
                 "example.org", "xsrc.test.example.orgx"]
        cfg = CrawlConfig(allowed_domain_globs=globs)
        errs = _admit_errors(spark, cfg, hosts)
        for h in hosts:
            expect_ok = any(fnmatch.fnmatchcase(h, g) for g in globs)
            assert (errs[h] is None) == expect_ok, h


class TestUnmarshalVoidElements:
    def test_br_does_not_leak_capture(self):
        out = extract_fields('<div class="x">A<br></div><p>B</p>',
                             [{"field": "f", "selector": ".x"}])
        assert out["f"] == "A"

    def test_img_selfclosing_inside_capture(self):
        out = extract_fields('<div class="x">A<img src="z"/>C</div><p>B</p>',
                             [{"field": "f", "selector": ".x"}])
        assert out["f"] == "AC"

    def test_void_attr_extraction_still_works(self):
        out = extract_fields('<img src="pic.png">',
                             [{"field": "src", "selector": "img", "attr": "src"}])
        assert out["src"] == "pic.png"

    def test_stray_end_tag_for_void(self):
        out = extract_fields('<div class="x">A</br>B</div><p>C</p>',
                             [{"field": "f", "selector": ".x"}])
        assert out["f"] == "AB"


def test_ngram_jaccard_trims_edge_whitespace(spark):
    from colly_spark.operators.text_dedup import ngram_jaccard

    docs = spark.createDataFrame(
        [(1, "  alpha beta gamma delta  "), (2, "alpha beta gamma delta")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    row = ngram_jaccard(docs, pairs).collect()[0]
    assert row["jaccard"] == 1.0
