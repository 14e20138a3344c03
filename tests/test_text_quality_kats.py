"""Hand-computed known-answer tests for the Gopher-style repetition
signals (operators/text_quality.repetition_stats / gopher_filter_exprs)
— the oracle gate (test_entry_oracle) proves Spark==DuckDB; these pin
both to the intended semantics on documents small enough to compute by
hand."""

from __future__ import annotations

import pytest


def _stats(spark, text):
    from colly_spark.operators.text_quality import repetition_stats

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0].asDict()


class TestRepetitionKATs:
    def test_alternating_pair(self, spark):
        # "a b a b a b": n_chars=11
        # 2-grams: "a b" x3 (len 3), "b a" x2 -> top cov 9/11
        # 3-grams: "a b a" x2, "b a b" x2 (len 5) -> top cov 10/11
        # 4-grams: "a b a b" x2, "b a b a" x1 -> dup cov 2*7/11
        r = _stats(spark, "a b a b a b")
        assert r["top_2gram_frac"] == round(9 / 11, 6)
        assert r["top_3gram_frac"] == round(10 / 11, 6)
        assert r["dup_4gram_frac"] == round(14 / 11, 6)

    def test_no_repeats(self, spark):
        r = _stats(spark, "one two three four five")
        # every 2-gram unique: top cov = count 1 * longest 2-gram
        # "three four" (10 chars) over 23 chars
        assert r["top_2gram_frac"] == round(10 / 23, 6)
        assert r["dup_4gram_frac"] == 0.0

    def test_too_short_for_grams(self, spark):
        r = _stats(spark, "single")
        assert (r["top_2gram_frac"], r["top_3gram_frac"],
                r["dup_4gram_frac"]) == (0.0, 0.0, 0.0)

    def test_three_tokens_has_no_4grams(self, spark):
        r = _stats(spark, "x y z")
        assert r["top_3gram_frac"] == round(5 / 5, 6)
        assert r["dup_4gram_frac"] == 0.0


class TestGopherFilterKATs:
    @pytest.mark.parametrize("text,ok_count,ok_len,ok_alpha", [
        (" ".join(["word"] * 50), True, True, True),
        (" ".join(["word"] * 49), False, True, True),   # too short
        (" ".join(["ab"] * 60), True, False, True),     # mean len 2 < 3
        (" ".join(["12345"] * 40 + ["abcde"] * 20), True, True, False),
    ])
    def test_flags(self, spark, text, ok_count, ok_len, ok_alpha):
        from pyspark.sql import functions as F

        from colly_spark.operators.text_quality import gopher_filter_exprs

        df = spark.createDataFrame([(text,)], "text string")
        flags, keep = gopher_filter_exprs(F.col("text"))
        row = df.select(*[v.alias(k) for k, v in flags.items()],
                        keep.alias("keep")).collect()[0]
        assert row["ok_token_count"] is ok_count
        assert row["ok_mean_token_len"] is ok_len
        assert row["ok_alpha_frac"] is ok_alpha
        assert row["keep"] is (ok_count and ok_len and ok_alpha)


def _cleaned(spark, rows, k=5):
    from colly_spark.operators.text_dedup import remove_duplicate_spans

    df = spark.createDataFrame(list(enumerate(rows)),
                               "doc_id long, text string")
    out = remove_duplicate_spans(df, k=k).orderBy("doc_id").collect()
    return [r.asDict() for r in out]


class TestDupSpanKATs:
    def test_within_doc_repeat(self, spark):
        # "a b c d e" repeats at pos 0 and 6; keeper is pos 0, the
        # pos-6 occurrence's 5 tokens are cut.
        [r] = _cleaned(spark, ["a b c d e x a b c d e"])
        assert r["clean_text"] == "a b c d e x"
        assert (r["n_kept"], r["n_removed"]) == (6, 5)

    def test_cross_doc_keeper_is_global_first(self, spark):
        rs = _cleaned(spark, ["a b c d e x", "y a b c d e"])
        assert rs[0]["clean_text"] == "a b c d e x"
        assert rs[0]["n_removed"] == 0
        assert rs[1]["clean_text"] == "y"
        assert (rs[1]["n_kept"], rs[1]["n_removed"]) == (1, 5)

    def test_overlapping_cuts_union(self, spark):
        # duplicated grams at pos 7 ("a b c d e") and 8 ("b c d e f")
        # cover positions 7..12 jointly, not 10 tokens.
        [r] = _cleaned(spark, ["m a b c d e f a b c d e f m"])
        assert r["clean_text"] == "m a b c d e f m"
        assert (r["n_kept"], r["n_removed"]) == (8, 6)

    def test_short_doc_untouched(self, spark):
        [r] = _cleaned(spark, ["p q r s"])
        assert r["clean_text"] == "p q r s"
        assert (r["n_kept"], r["n_removed"]) == (4, 0)

    def test_fully_duplicated_doc_empties(self, spark):
        rs = _cleaned(spark, ["q w e r t", "q w e r t"])
        assert rs[0]["clean_text"] == "q w e r t"
        assert rs[1]["clean_text"] == ""
        assert (rs[1]["n_kept"], rs[1]["n_removed"]) == (0, 5)


class TestBpePretokenizerKATs:
    @pytest.mark.parametrize("text,want", [
        ("it's a test", ["it", "'s", " a", " test"]),
        ("price 42 now!", ["price", " 42", " now", "!"]),
        # double space: the ws-run match (no lookahead in the RE2
        # subset) swallows both spaces, so "b" carries no prefix
        ("a  b", ["a", "b"]),
        ("don't we'll I'm", ["don", "'t", " we", "'ll", " I", "'m"]),
        ("x++y", ["x", "++", "y"]),
    ])
    def test_segments(self, spark, text, want):
        from pyspark.sql import functions as F

        from colly_spark.operators.text_quality import bpe_tokens_expr

        df = spark.createDataFrame([(text,)], "text string")
        got = df.select(bpe_tokens_expr(F.col("text")).alias("t")).collect()[0]["t"]
        assert got == want


class TestDecontaminateKATs:
    def test_shared_span_flags_doc(self, spark):
        from colly_spark.operators.text_dedup import decontaminate

        corpus = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta"),
             (1, "one two three four")],          # <5 tokens: no grams
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, "x alpha beta gamma delta epsilon y")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r.asDict()
                for r in decontaminate(corpus, bench, k=5).collect()}
        # doc 0 shares "alpha beta gamma delta epsilon" AND
        # "beta gamma delta epsilon zeta"? — the second is NOT in
        # bench (bench has "beta gamma delta epsilon y"), so exactly 1
        assert rows[0]["n_shared_grams"] == 1
        assert rows[0]["contaminated"] is True
        assert rows[1]["n_shared_grams"] == 0
        assert rows[1]["contaminated"] is False

    def test_repeated_shared_span_counted_once(self, spark):
        from colly_spark.operators.text_dedup import decontaminate

        corpus = spark.createDataFrame(
            [(0, "a b c d e a b c d e")], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, "a b c d e")], "doc_id long, text string")
        [r] = decontaminate(corpus, bench, k=5).collect()
        assert r["n_shared_grams"] == 1  # distinct shared grams


class TestPackSequencesKATs:
    def test_next_fit_fold(self, spark):
        from colly_spark.operators.sampling import pack_sequences

        rows = [("a", "s", 4), ("b", "s", 5), ("c", "s", 3),
                ("d", "s", 12), ("e", "s", 2)]
        df = spark.createDataFrame(
            rows, "doc_id string, source string, n_tokens long")
        out = {r["key"]: (r["shard"], r["offset"])
               for r in pack_sequences(df, budget=10, n_buckets=1).collect()}
        # a(4)->s0@0; b(5) fits (9<=10)->s0@4; c(3) overflows->s1@0;
        # d(12) oversized, own shard->s2@0; e(2)->s3@0
        assert out == {"a": (0, 0), "b": (0, 4), "c": (1, 0),
                       "d": (2, 0), "e": (3, 0)}

    def test_shards_never_straddle(self, spark):
        from pyspark.sql import functions as F

        from colly_spark.operators.sampling import pack_sequences
        from colly_spark.operators.text_quality import token_count_expr

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
            .select("doc_id", "source",
                    token_count_expr(F.col("text")).cast("long")
                    .alias("n_tokens"))
        packed = pack_sequences(d, budget=200)
        bad = (packed.groupBy("stratum", "bucket", "shard")
               .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
               .filter((F.col("tot") > 200) & (F.col("n") > 1)))
        assert bad.count() == 0  # only a lone oversized doc may exceed
        off = (packed.groupBy("stratum", "bucket", "shard")
               .agg(F.min("offset").alias("mn")).filter("mn != 0"))
        assert off.count() == 0  # every shard starts at offset 0


class TestPIIScrubKATs:
    def _scrub(self, spark, text):
        from colly_spark.operators.text_quality import pii_scrub

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return pii_scrub(df).collect()[0].asDict()

    def test_email_ip_phone(self, spark):
        r = self._scrub(spark, "mail bob.smith+x@sub.example.co.uk at "
                               "192.168.1.10 or +44-555-0142 now")
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (1, 1, 1)
        assert r["clean_text"] == "mail <EMAIL> at <IP> or <PHONE> now"

    def test_ip_mail_host_still_redacted(self, spark):
        # an all-numeric mail host is not an email (no alpha TLD) but
        # its dotted quad must still fall to the IP pass
        r = self._scrub(spark, "x user@10.0.0.1 y")
        assert (r["n_emails"], r["n_ipv4"]) == (0, 1)
        assert r["clean_text"] == "x user@<IP> y"

    def test_counts_multiple(self, spark):
        r = self._scrub(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8 +1-555-1234")
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (2, 2, 1)
        assert r["clean_text"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"

    def test_clean_text_without_pii_is_unchanged(self, spark):
        r = self._scrub(spark, "plain words only here")
        assert r["clean_text"] == "plain words only here"
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (0, 0, 0)


class TestC4LineFilterKATs:
    """C4 §2.2 rules pinned by hand on tiny pages (the oracle gate
    proves Spark==DuckDB; these pin both to the paper's semantics)."""

    def _run(self, spark, text, min_kept=5):
        from colly_spark.operators.text_quality import c4_line_filter

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return c4_line_filter(df, min_kept=min_kept).collect()[0].asDict()

    def test_line_rules(self, spark):
        # line 1 kept; line 2 no terminal punct; line 3 two words;
        # line 4 mentions javascript; line 5 kept (quote terminal)
        text = "\n".join([
            "the quick brown fox jumps.",
            "read more below",
            "home about.",
            "please enable javascript to continue.",
            'she said "hello there world"',
        ])
        r = self._run(spark, text, min_kept=2)
        assert r["n_lines"] == 5 and r["n_kept"] == 2
        assert r["page_kept"] is True
        assert r["kept_text"] == (
            'the quick brown fox jumps.\nshe said "hello there world"')

    def test_page_drop_lorem_ipsum(self, spark):
        text = "good long line number one.\nLorem Ipsum dolor sit amet."
        r = self._run(spark, text, min_kept=1)
        assert r["page_kept"] is False and r["kept_text"] is None

    def test_page_drop_curly_brace(self, spark):
        text = "good long line number one.\nvar x = { a: 1 }"
        r = self._run(spark, text, min_kept=1)
        assert r["page_kept"] is False and r["kept_text"] is None

    def test_page_drop_min_kept(self, spark):
        text = "one good terminal line here.\nanother good line survives."
        assert self._run(spark, text, min_kept=3)["page_kept"] is False
        assert self._run(spark, text, min_kept=2)["page_kept"] is True
