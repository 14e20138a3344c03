"""Independent pure-Python reference unigram-LM tokenizer (Kudo 2018,
"Subword Regularization" — the SentencePiece unigram family) used to
generate the golden oracles for `unigram_train`/`unigram_encode` and to
check the Spark operator in tests. Deliberately Spark-free, exactly
like oracle/bpe_ref.py.

Shared spec (the Spark operator in operators/unigram.py implements the
SAME rule; hard-EM/Viterbi variant so every quantity is deterministic):

- words: lowercased ASCII-whitespace tokens (split on [ \\t\\n\\x0b\\f\\r]+
  — the Java-regex \\s set the engine's tokens_expr uses; empty
  dropped), corpus counts;
- seed vocabulary: every substring of a word with length ≤ max_piece_len,
  scored Σ word_count × occurrences (all start positions, overlapping);
  keep the top ``seed_size`` multi-char pieces by (score desc, piece
  asc), plus ALL single characters (coverage guarantee — kept forever);
- piece counts start at the seed scores; each round:
    probs:   p(x) = count(x) / Σ counts  (exact integer ratio → float64)
    E-step:  Viterbi-segment each word under log p — DP left to right,
             best[i] = max_j (best[j] + log p(s[j:i])), j ascending with
             strict improvement, so ties prefer the SMALLEST j (longest
             final piece); piece counts = Σ word_count per occurrence;
    prune:   if more than ``vocab_size`` multi-char pieces survive,
             keep the top max(vocab_size, ⌊0.75·n⌋) by
             (count desc, piece asc); zero-count multi-char pieces drop;
             single chars always stay (count floor 1 for the next probs);
- after ``n_rounds`` rounds the final E-step's counts + log p (9 dp)
  are the vocabulary; encode(word) = Viterbi under the final probs.

log p is rounded to 9 dp in the OUTPUT only (hash stability); the DP
itself uses the raw float64 logs, computed as math.log(count) -
math.log(total) in this exact order by both implementations.
"""

from __future__ import annotations

import math
import re

# ASCII whitespace EXACTLY as the engine's tokens_expr splits it (Java
# regex \s = [ \t\n\x0B\f\r]): Python str.split() would additionally
# split on Unicode whitespace (NBSP, NEL, …) and silently diverge from
# the Spark word table on non-ASCII documents
_WS = re.compile(r"[ \t\n\x0b\x0c\r]+")


def split_words(text: str) -> list:
    return [w for w in _WS.split(text or "") if w]


def word_counts(texts) -> dict:
    wc: dict = {}
    for t in texts:
        for w in split_words(t):
            w = w.lower()
            wc[w] = wc.get(w, 0) + 1
    return wc


def seed_vocab(wc: dict, seed_size: int, max_piece_len: int):
    """Returns {piece: seed_count} — all single chars + top multi-char
    substrings by (count desc, piece asc)."""
    scores: dict = {}
    for w, c in wc.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                p = w[i:j]
                scores[p] = scores.get(p, 0) + c
    chars = {p: s for p, s in scores.items() if len(p) == 1}
    multi = sorted(((p, s) for p, s in scores.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(chars)
    out.update(dict(multi))
    return out


def _logprobs(counts: dict) -> dict:
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def viterbi(word: str, logp: dict, max_piece_len: int):
    """Best segmentation; ties prefer smallest split point (longest
    final piece). Single-char coverage makes every word segmentable."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -math.inf:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    pieces, i = [], n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def _estep_counts(words: dict, counts: dict, max_piece_len: int) -> dict:
    logp = _logprobs(counts)
    out: dict = {}
    for w, c in words.items():
        for p in viterbi(w, logp, max_piece_len):
            out[p] = out.get(p, 0) + c
    return out


def train(texts, vocab_size: int = 150, seed_size: int = 300,
          max_piece_len: int = 5, n_rounds: int = 4):
    """Returns sorted [(piece, count, logp_9dp)] — the final vocab."""
    wc = word_counts(texts)
    counts = seed_vocab(wc, seed_size, max_piece_len)
    for _ in range(n_rounds):
        used = _estep_counts(wc, counts, max_piece_len)
        multi = sorted(((p, c) for p, c in used.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        if len(multi) > vocab_size:
            multi = multi[:max(vocab_size, int(len(multi) * 0.75))]
        counts = {p: max(used.get(p, 0), 1)
                  for p in counts if len(p) == 1}
        counts.update(dict(multi))
    used = _estep_counts(wc, counts, max_piece_len)
    final = {p: max(used.get(p, 0), 1) for p in counts if len(p) == 1}
    final.update({p: c for p, c in used.items() if len(p) > 1})
    logp = _logprobs(final)
    return sorted((p, c, round(logp[p], 9)) for p, c in final.items())


def encode_texts(texts, vocab_rows, max_piece_len: int = 5):
    """Per-text (n_pieces, n_distinct_pieces) under the final vocab
    (rows of (piece, count, logp))."""
    counts = {p: c for p, c, _ in vocab_rows}
    logp = _logprobs(counts)
    cache: dict = {}
    out = []
    for t in texts:
        n, seen = 0, set()
        for w in split_words(t):
            w = w.lower()
            pieces = cache.get(w)
            if pieces is None:
                pieces = cache[w] = viterbi(w, logp, max_piece_len)
            n += len(pieces)
            seen.update(pieces)
        out.append((n, len(seen)))
    return out
