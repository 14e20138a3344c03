"""Boilerplate removal (operators/boilerplate.py, jusText-lite rules):
hand-computed KATs per rule, leaf-block semantics, and the operator
over synthesized pages vs the golden replica's arithmetic. The full
golden gate is test_entry_oracle[extract_main_text]."""

from __future__ import annotations

from colly_spark.operators.boilerplate import (classify_blocks,
                                               extract_main_text,
                                               synth_page_html)

GOOD_P = "<p>the quick brown fox jumps over the lazy dog today.</p>"


class TestClassifyKATs:
    def test_good_paragraph(self):
        blocks = classify_blocks(f"<html><body>{GOOD_P}</body></html>")
        assert len(blocks) == 1
        text, nw, ld, sd, good = blocks[0]
        assert nw == 10 and ld == 0.0 and good
        # stopwords: the, the -> 2/10 (== MIN_STOPWORD_DENSITY, inclusive)
        assert sd == 0.2

    def test_short_block_bad(self):
        blocks = classify_blocks("<p>the of and is.</p>")
        assert blocks[0][4] is False  # 4 words < MIN_WORDS

    def test_link_density_bad(self):
        html = '<div><a href="/">home page</a> <a href="/a">about us</a></div>'
        blocks = classify_blocks(html)
        text, nw, ld, sd, good = blocks[0]
        assert text == "home page about us"
        assert ld > 0.33 and good is False

    def test_stopword_density_bad(self):
        blocks = classify_blocks(
            "<p>colorless green ideas sleep furiously tonight.</p>")
        assert blocks[0][3] == 0.0 and blocks[0][4] is False

    def test_leaf_blocks_only(self):
        # the outer div contains a p -> only the p is a block
        html = f"<div><div>wrapper</div>{GOOD_P}</div>"
        blocks = classify_blocks(html)
        texts = [b[0] for b in blocks]
        assert "wrapper" in texts
        assert any(t.startswith("the quick") for t in texts)
        assert not any(t.startswith("wrapper the quick") for t in texts)

    def test_document_order(self):
        html = "<p>first of the good long lines.</p>" \
               "<p>second of the good long lines.</p>"
        blocks = classify_blocks(html)
        assert [b[0].split(" ")[0] for b in blocks] == ["first", "second"]


def test_operator_matches_replica(spark):
    """extract_main_text over synthesized pages == the golden
    replica's no-parser arithmetic (same logic as make_golden)."""
    from colly_spark.operators.boilerplate import (MAX_LINK_DENSITY,
                                                   MIN_STOPWORD_DENSITY,
                                                   MIN_WORDS, STOPWORDS,
                                                   SYNTH_STOPS)

    docs = [(i, f"alpha bravo charlie delta echo foxtrot golf hotel india "
                f"juliet kilo lima mike november oscar papa word{i}")
            for i in range(6)]

    def replica(doc_id, text):
        toks = text.split()
        blocks = [("home about contact", 16)]
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

        def good(t, lc):
            w = t.split(" ")
            sd = sum(x.lower() in STOPWORDS for x in w) / len(w)
            return (len(w) >= MIN_WORDS and lc / len(t) < MAX_LINK_DENSITY
                    and sd >= MIN_STOPWORD_DENSITY)

        kept = [t for t, lc in blocks if good(t, lc)]
        return (doc_id, len(blocks), len(kept),
                "\n".join(kept) if kept else None)

    df = spark.createDataFrame(
        [(i, synth_page_html(i, t)) for i, t in docs],
        "doc_id long, html string")
    got = sorted(tuple(r) for r in extract_main_text(df).collect())
    want = sorted(replica(i, t) for i, t in docs)
    assert got == want
    # and the content actually survives somewhere
    assert any(r[2] > 0 for r in got)
