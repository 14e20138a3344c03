"""Independent pure-Python reference BPE (Sennrich et al. 2016) used
to generate the golden oracles for `bpe_train`/`bpe_encode` and to
check the Spark operator in tests. Deliberately Spark-free: a plain
dict/loop implementation of the exact rule the operator claims.

Rule (shared spec):
- words: lowercased whitespace tokens (empty tokens dropped);
- symbols(word) = characters + a trailing '</w>' marker;
- pair counts: every adjacent symbol position, weighted by word count
  (overlapping identical pairs count per position);
- merge choice: max count, ties by lexicographically smallest
  (lhs, rhs); stop when the best count < min_count or after n_merges;
- merge apply: left-to-right non-overlapping replacement;
- encode: apply the learned merges to a word in rank order.
"""

from __future__ import annotations

import re

END = "</w>"

# ASCII whitespace exactly as the engine's tokens_expr (Java regex \s)
# splits it — Python str.split() also splits Unicode whitespace (NBSP,
# NEL) and would silently diverge on non-ASCII documents
_WS = re.compile(r"[ \t\n\x0b\x0c\r]+")


def word_counts(texts) -> dict:
    wc: dict = {}
    for t in texts:
        for w in _WS.split(t or ""):
            if not w:
                continue
            w = w.lower()
            wc[w] = wc.get(w, 0) + 1
    return wc


def _merge(sym: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train(texts, n_merges: int, min_count: int = 2):
    """Returns [(rank, lhs, rhs, merged, pair_count)], rank from 1."""
    wc = word_counts(texts)
    words = {w: (list(w) + [END], c) for w, c in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict = {}
        for sym, c in words.values():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, a, b, a + b, cnt))
        words = {w: (_merge(sym, a, b), c) for w, (sym, c) in words.items()}
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """ranks: {(lhs, rhs): rank}. Standard BPE encode: repeatedly merge
    the best-ranked adjacent pair until none applies."""
    sym = list(word) + [END]
    while len(sym) > 1:
        pairs = [(ranks.get((sym[i], sym[i + 1])), i)
                 for i in range(len(sym) - 1)]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        r, _ = min(pairs)
        a, b = None, None
        for (l, rr), rk in ranks.items():
            if rk == r:
                a, b = l, rr
                break
        sym = _merge(sym, a, b)
    return sym


def encode_texts(texts, merges):
    """Per text: total learned-BPE token count + distinct symbol count.
    merges: output of train()."""
    ranks = {(l, r): rank for rank, l, r, _m, _c in merges}
    out = []
    for t in texts:
        n, seen = 0, set()
        for w in _WS.split(t or ""):
            if not w:
                continue
            sym = encode_word(w.lower(), ranks)
            n += len(sym)
            seen.update(sym)
        out.append((n, len(seen)))
    return out
