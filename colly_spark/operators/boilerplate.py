"""Boilerplate removal (main-content extraction) — the text-extraction
pass every web-LLM pipeline runs between raw HTML and the line/quality
filters (C4 extracts text first; RefinedWeb uses trafilatura; the rule
shape here is jusText's, Pomikálek 2011: classify block-level elements
by link density / stopword density / length and keep the good ones).

This is the deterministic "jusText-lite" core: per-block rules only
(no context-sensitive re-classification pass), so every block's label
is a pure function of its own text — replayable by an independent
replica without an HTML parser, which is what makes the golden oracle
honest.

Block model: the LEAF block elements of the DOM (p, h1-h6, li, td,
pre, blockquote, and divs that contain no other block element). For
each block:

    n_words          whitespace tokens of the normalized text
    link_density     chars under <a> descendants / total chars
    stopword_density stopword tokens / n_words

    good  ⇔  n_words >= MIN_WORDS
             and link_density  < MAX_LINK_DENSITY
             and stopword_density >= MIN_STOPWORD_DENSITY

Scale shape: mapInPandas over Arrow batches — per-document parse is
inherently per-row work (the same shape as _parse_batch's link
extraction, plans/crawler.py); zero shuffle, html column pruned after
the pass. Reference seam: the reference hands response bodies to
callbacks and never extracts main text itself (colly.go OnHTML), so
this is an LLM-pipeline addition, not a parity item.
"""

from __future__ import annotations

BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6",
     "li", "td", "pre", "blockquote", "div"})
MIN_WORDS = 5
MAX_LINK_DENSITY = 0.33
MIN_STOPWORD_DENSITY = 0.20

# a small fixed English function-word list (public-domain words); the
# point is densities, not linguistic completeness — jusText ships per-
# language lists the same way.
STOPWORDS = frozenset(
    "a an and are as at be but by for from has have in is it its of on"
    " or that the to was were will with this they he she you we i not"
    " their there".split())


def _norm_text(s: str) -> str:
    return " ".join(s.split())


def classify_blocks(html: str):
    """[(text, n_words, link_density, stopword_density, good)] for the
    leaf block elements of ``html``, document order."""
    from colly_spark.operators.dom import parse_dom

    root = parse_dom(html)
    out = []
    for n in root.iter_elements():
        if n.tag not in BLOCK_TAGS:
            continue
        if any(d.tag in BLOCK_TAGS for d in n.iter_elements() if d is not n):
            continue  # not a leaf block
        text = _norm_text(n.text())
        if not text:
            continue
        link_chars = sum(
            len(_norm_text(d.text())) for d in n.iter_elements()
            if d is not n and d.tag == "a")
        words = text.split(" ")
        nw = len(words)
        ld = link_chars / len(text)
        sd = sum(w.lower() in STOPWORDS for w in words) / nw
        good = (nw >= MIN_WORDS and ld < MAX_LINK_DENSITY
                and sd >= MIN_STOPWORD_DENSITY)
        out.append((text, nw, round(ld, 6), round(sd, 6), good))
    return out


SYNTH_STOPS = ("the", "of", "and", "to", "in", "is", "on", "that")


def synth_page_html(doc_id: int, text: str) -> str:
    """Deterministic page fixture for the `extract_main_text` query
    and its golden replica (both import THIS function, so they agree
    on the input; the replica re-derives the expected blocks from the
    construction arithmetic below WITHOUT an HTML parser — that
    independence is what the golden pins):

    - a nav div of three links (link-dense, short → boilerplate),
    - one <p> per 9 tokens of the document text, a rotating function
      word injected after every 2nd token (content: long, link-free,
      stopword-dense → good, except short trailing chunks),
    - every 3rd doc: a 3-item related-links list (each li is a 1-word
      pure-link block → boilerplate),
    - a short copyright footer div (boilerplate)."""
    toks = text.split()
    paras = []
    for j in range(0, len(toks), 9):
        words = []
        for idx, t in enumerate(toks[j:j + 9]):
            words.append(t)
            if idx % 2 == 1:
                words.append(SYNTH_STOPS[(doc_id + j + idx)
                                         % len(SYNTH_STOPS)])
        paras.append("<p>" + " ".join(words) + ".</p>")
    nav = ('<div><a href="/">home</a> <a href="/a">about</a>'
           ' <a href="/c">contact</a></div>')
    rel = ""
    if doc_id % 3 == 0:
        items = "".join(
            f'<li><a href="/t/{k}">{toks[k % len(toks)]}</a></li>'
            for k in range(3))
        rel = "<ul>" + items + "</ul>"
    footer = "<div>copyright example site</div>"
    return ("<html><body>" + nav + "".join(paras) + rel + footer
            + "</body></html>")


def extract_main_text(df, html_col: str = "html", id_col: str = "doc_id"):
    """Per-document main-content extraction: (id, n_blocks, n_good,
    main_text) — main_text is the newline-join of good blocks (NULL
    when none survive). mapInPandas, Arrow-batched."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("id", LongType()),
        StructField("n_blocks", LongType()),
        StructField("n_good", LongType()),
        StructField("main_text", StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for i, html in zip(pdf["id"], pdf["h"]):
                blocks = classify_blocks(html)
                good = [t for t, _nw, _ld, _sd, g in blocks if g]
                rows.append((int(i), len(blocks), len(good),
                             "\n".join(good) if good else None))
            yield pd.DataFrame(rows, columns=["id", "n_blocks",
                                              "n_good", "main_text"])

    out = (df.select(F.col(id_col).alias("id"), F.col(html_col).alias("h"))
           .mapInPandas(run, schema))
    return out.select(F.col("id").alias(id_col), "n_blocks", "n_good",
                      "main_text")
