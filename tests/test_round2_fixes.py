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


class TestLshDegenerateBuckets:
    def test_empty_docs_dropped(self, spark):
        """10k empty/near-empty docs must not explode the band join:
        empty docs get NULL bucket keys and are dropped entirely."""
        from colly_spark.operators.text_dedup import candidate_pairs, lsh_buckets

        rows = [(i, "") for i in range(5000)] + [(i, "   ") for i in range(5000, 10000)]
        rows += [(20000, "alpha beta gamma delta epsilon"),
                 (20001, "alpha beta gamma delta epsilon")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        buckets = lsh_buckets(docs)
        # only the 2 non-empty docs produce buckets (16 bands each)
        assert buckets.count() == 32
        pairs = candidate_pairs(buckets).collect()
        assert {(r["a"], r["b"]) for r in pairs} == {(20000, 20001)}

    def test_oversized_bucket_capped(self, spark):
        """A bucket with > max members is excluded from the pair join
        and reported by oversized_buckets (never silently)."""
        from colly_spark.operators.text_dedup import (candidate_pairs, lsh_buckets,
                                                      oversized_buckets)

        same = "identical boilerplate text repeated across the corpus body"
        docs = spark.createDataFrame(
            [(i, same) for i in range(50)]
            + [(100, "unique alpha beta gamma delta"), (101, "unique alpha beta gamma delta")],
            "doc_id long, text string")
        buckets = lsh_buckets(docs)
        pairs = candidate_pairs(buckets, max_bucket_size=10).collect()
        assert {(r["a"], r["b"]) for r in pairs} == {(100, 101)}
        over = oversized_buckets(buckets, max_bucket_size=10).collect()
        assert len(over) == 16 and all(r["n_members"] == 50 for r in over)


def test_ngram_jaccard_trims_edge_whitespace(spark):
    from colly_spark.operators.text_dedup import ngram_jaccard

    docs = spark.createDataFrame(
        [(1, "  alpha beta gamma delta  "), (2, "alpha beta gamma delta")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    row = ngram_jaccard(docs, pairs).collect()[0]
    assert row["jaccard"] == 1.0
