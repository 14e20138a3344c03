"""URL-seen layer, cuckoo variant — partitioned cuckoo-filter segments.

The north-star names a "partitioned bloom/cuckoo URL-seen filter"
replacing the reference's in-memory visited map (colly.go:452 default
InMemoryStorage; storage.Storage IsVisited/Visited keyed by FNV-64a
uint64, colly.go:1484-1498). ``operators/seen.py`` is the Bloom half;
this module is the cuckoo half (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014) with the
one capability Bloom cannot offer: **deletion**. That is what makes
revisit scheduling cheap at 10^10 keys — when ``recrawl_schedule``
(operators/politeness.py) declares a URL due, ``Crawler.forget_visited``
removes exactly those k fingerprints from their co-partitioned segments
in O(k), where the Bloom layer must rebuild all segments from the exact
visited table in O(n).

Same distribution discipline as the Bloom segments:

- the 64-bit hash space is split into ``P`` partitions by
  ``pmod(url_hash, P)``; each partition owns one cuckoo table persisted
  as a file. Probe/update/delete tasks are co-partitioned with the
  candidate batch (``groupBy(pid).applyInPandas``) — a task touches
  ONLY its own segment, nothing is broadcast or shuffled beyond the
  one pid exchange (which the crawler fuses with its within-batch
  claim, exactly like ``seen.bloom_probe``).
- segments are a pure function of the visited set: a resume rebuilds
  them (plans/crawler.py resume path), so they are never part of the
  manifest commit point.

Table layout (standard partial-key cuckoo hashing): ``n_buckets``
buckets (power of two) × 4 slots of 16-bit fingerprints, 0 = empty.
For key hash h:

    fp  = splitmix64(h) & 0xFFFF      (0 remapped to 0xFFFF)
    i1  = (splitmix64(h) >> 16) mod n_buckets
    i2  = i1 XOR (splitmix64(fp) mod n_buckets)

(i1 uses the mix's high bits, disjoint from the fingerprint's low 16
and uncorrelated with the pid partitioning — see _buckets.)

``i2`` depends on (i1, fp) only and the XOR is self-inverse, so any
resident fingerprint can be kicked to its alternate bucket — and any
key can be deleted — without the original key. At 4 slots/bucket the
table holds ~95% load; ~12 bits/key for the same ~0.1% false-positive
rate Bloom needs ~14 bits for, and O(k) deletes.

Deletion soundness: removing a key that was actually inserted can
never false-negative another key — two inserted keys sharing a
(bucket, fingerprint) pair occupy two slots, so one copy remains.
Deleting a key that was NEVER inserted is the classic unsound case;
``Crawler.forget_visited`` guards it by semi-joining the due set
against the exact visited table first.

Overflow honesty: an insert that still holds an orphan after
``MAX_KICKS`` evictions goes to a small per-segment stash (probed and
deletable like the table). A full stash raises — the filter is
undersized for the corpus; size ``n_buckets ≈ n_keys / (4 · 0.95 · P)``
at deployment (the same sizing exercise as Bloom bits/key).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from colly_spark.operators.seen import _splitmix64

DEFAULT_PARTITIONS = 16
# 2^14 buckets × 4 slots × 2 B = 128 KiB per segment (sandbox sizing —
# ~1M keys across 16 segments at 95% load); at 10^10 keys deploy with
# n_buckets = 10^10 / (4 * 0.95 * P) per segment.
DEFAULT_BUCKETS = 1 << 14
SLOTS = 4
MAX_KICKS = 500
STASH_MAX = 256

_FP_MASK = np.uint64(0xFFFF)


def _fingerprint(h_u64: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from the FNV-64a key hashes."""
    fp = (_splitmix64(h_u64) & _FP_MASK).astype(np.uint16)
    return np.where(fp == 0, np.uint16(0xFFFF), fp)


def _buckets(h_u64: np.ndarray, fp: np.ndarray, n_buckets: int):
    """(i1, i2) bucket indices, both uint64 < n_buckets (power of 2).

    i1 comes from the HIGH bits of the splitmix-mixed hash, never the
    raw hash: the caller partitions keys by ``pmod(hash, P)`` (P a
    power of two), so every key in a segment shares its low log2(P)
    bits — a raw ``h mod n_buckets`` would alias onto every P-th
    bucket and overload them P-fold. The fingerprint uses the mix's
    low 16 bits, disjoint from the bucket bits."""
    nb = np.uint64(n_buckets)
    i1 = (_splitmix64(h_u64) >> np.uint64(16)) % nb
    alt = _splitmix64(fp.astype(np.uint64)) % nb
    return i1, i1 ^ alt


def _alt_bucket(bucket: int, fp: int, n_buckets: int) -> int:
    nb = np.uint64(n_buckets)
    alt = int(_splitmix64(np.array([fp], dtype=np.uint64))[0] % nb)
    return int(np.uint64(bucket) ^ np.uint64(alt))


def new_table(n_buckets: int = DEFAULT_BUCKETS) -> np.ndarray:
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def new_stash() -> np.ndarray:
    """Stash of orphaned (bucket, fp) pairs packed as uint64
    (bucket << 16 | fp) — an evictee only knows its current bucket and
    fingerprint, which is also all probe/delete need."""
    return np.zeros(0, dtype=np.uint64)


def _stash_pack(bucket: int, fp: int) -> np.uint64:
    return np.uint64((int(bucket) << 16) | int(fp))


def probe_table(table: np.ndarray, stash: np.ndarray,
                hashes_i64: np.ndarray) -> np.ndarray:
    """bool[n]: True = maybe-seen, False = definitely new.

    No false negatives for inserted keys: the fingerprint is either in
    bucket i1, bucket i2 (kicked), or the stash (orphaned)."""
    n = len(hashes_i64)
    if n == 0:
        return np.zeros(0, dtype=bool)
    h = hashes_i64.view(np.uint64)
    fp = _fingerprint(h)
    i1, i2 = _buckets(h, fp, table.shape[0])
    fpc = fp[:, None]
    found = ((table[i1.astype(np.int64)] == fpc).any(axis=1)
             | (table[i2.astype(np.int64)] == fpc).any(axis=1))
    if len(stash):
        # stash entry matches if its fp equals ours and its bucket is
        # one of our two buckets (i2 = i1 ^ alt(fp) is self-inverse, so
        # this covers the evictee seen from either side)
        p1 = (i1 << np.uint64(16)) | fp.astype(np.uint64)
        p2 = (i2 << np.uint64(16)) | fp.astype(np.uint64)
        found |= np.isin(p1, stash) | np.isin(p2, stash)
    return found


def add_table(table: np.ndarray, stash: np.ndarray,
              hashes_i64: np.ndarray):
    """Insert all hashes (duplicates insert one copy each — the
    crawler's within-batch claim already deduplicates). Returns the
    (table, stash) pair; raises on stash overflow (undersized filter).

    Vectorized bulk path: keys that fit a free slot in bucket i1 or i2
    place in two numpy scatter rounds (the overwhelming majority below
    ~95% load — this is the hot per-batch marks fold, the cuckoo
    counterpart of seen.add_bits); only keys whose both buckets are
    full walk the per-item eviction loop. Deterministic: bulk placement
    is order-independent set insertion, the eviction victim slot
    rotates with the kick counter — no RNG."""
    n_buckets = table.shape[0]
    h_all = np.asarray(hashes_i64, dtype=np.int64).view(np.uint64)
    if len(h_all) == 0:
        return table, stash
    fp = _fingerprint(h_all)
    i1, i2 = _buckets(h_all, fp, n_buckets)
    targets = (i1.astype(np.int64), i2.astype(np.int64))
    occ = (table != 0).sum(axis=1).astype(np.int64)
    pending = np.arange(len(h_all))
    for tgt in targets:
        if not len(pending):
            break
        b = tgt[pending]
        u, inv, counts = np.unique(b, return_inverse=True,
                                   return_counts=True)
        # compact occupied slots to the front of each affected row so
        # slots occ[b]..3 are free (slot order carries no meaning)
        rows = table[u]
        order = np.argsort(rows == 0, axis=1, kind="stable")
        table[u] = np.take_along_axis(rows, order, axis=1)
        # rank within same-bucket group
        sort_idx = np.argsort(inv, kind="stable")
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ranks = np.empty(len(inv), dtype=np.int64)
        ranks[sort_idx] = np.arange(len(inv)) - np.repeat(starts, counts)
        cap = SLOTS - occ[u]
        ok = ranks < cap[inv]
        put = pending[ok]
        table[b[ok], occ[b[ok]] + ranks[ok]] = fp[put]
        occ[u] += np.minimum(counts, cap)
        pending = pending[~ok]
    # leftover: both buckets full → per-item eviction walk
    stash_list = list(stash)
    for j in pending:
        cur_b, cur_fp, placed = int(i2[j]), int(fp[j]), False
        for kick in range(MAX_KICKS):
            slot = (kick + cur_fp) % SLOTS
            victim = int(table[cur_b, slot])
            table[cur_b, slot] = cur_fp
            cur_fp = victim
            cur_b = _alt_bucket(cur_b, cur_fp, n_buckets)
            free = np.flatnonzero(table[cur_b] == 0)
            if len(free):
                table[cur_b, free[0]] = cur_fp
                placed = True
                break
        if not placed:
            stash_list.append(_stash_pack(cur_b, cur_fp))
            if len(stash_list) > STASH_MAX:
                raise RuntimeError(
                    f"cuckoo segment over capacity ({n_buckets} buckets, "
                    f"stash {len(stash_list)} > {STASH_MAX}): size "
                    "n_buckets = n_keys / (4 * 0.95 * P) for the corpus")
    return table, np.array(stash_list, dtype=np.uint64)


def _delete_one(table, stash_list, i1, i2, fp) -> int:
    """Per-item fallback: remove one copy at i1/i2/stash."""
    for b in (i1, i2):
        hit = np.flatnonzero(table[b] == fp)
        if len(hit):
            table[b, hit[0]] = 0
            return 1
    for p in (_stash_pack(i1, fp), _stash_pack(i2, fp)):
        if p in stash_list:
            stash_list.remove(p)
            return 1
    return 0


def delete_table(table: np.ndarray, stash: np.ndarray,
                 hashes_i64: np.ndarray):
    """Remove ONE fingerprint copy per hash (caller guarantees each
    hash was inserted — sound per the module docstring). Returns
    (table, stash, n_deleted); hashes not found are counted out (the
    caller treats that as a bug upstream, not here).

    Vectorized bulk path mirroring add_table: keys whose fingerprint
    matches a UNIQUE (bucket, slot) target in bucket i1 or i2 clear in
    two numpy scatter rounds; keys colliding on the same target (two
    due keys sharing a bucket+fingerprint — each owns one copy) and
    stash residents fall back to the per-item walk, which re-reads the
    post-scatter table so every copy is accounted once."""
    n_buckets = table.shape[0]
    h_all = np.asarray(hashes_i64, dtype=np.int64).view(np.uint64)
    stash_list = list(stash)
    if len(h_all) == 0:
        return table, np.array(stash_list, dtype=np.uint64), 0
    fp = _fingerprint(h_all)
    i1, i2 = _buckets(h_all, fp, n_buckets)
    n_del = 0
    pending = np.arange(len(h_all))
    for tgt in (i1.astype(np.int64), i2.astype(np.int64)):
        if not len(pending):
            break
        b = tgt[pending]
        match = table[b] == fp[pending, None]          # (m, SLOTS) bool
        has = match.any(axis=1)
        slot = match.argmax(axis=1)
        packed = b * SLOTS + slot                      # candidate targets
        # clear only targets claimed by exactly one pending key
        _u, first_idx, counts = np.unique(packed[has], return_index=True,
                                          return_counts=True)
        uniq_rows = np.flatnonzero(has)[first_idx[counts == 1]]
        table[b[uniq_rows], slot[uniq_rows]] = 0
        n_del += len(uniq_rows)
        done = np.zeros(len(pending), dtype=bool)
        done[uniq_rows] = True
        pending = pending[~done]
    for j in pending:
        n_del += _delete_one(table, stash_list, int(i1[j]), int(i2[j]),
                             np.uint16(fp[j]))
    return table, np.array(stash_list, dtype=np.uint64), n_del


def _load_seg(seg_dir: str, pid: int, n_buckets: int):
    """Load one segment file (fresh empty segment when absent) — a
    module function so executor closures ship it without pickling a
    CuckooSegments instance."""
    path = os.path.join(seg_dir, f"seg_{pid:04d}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["table"].copy(), z["stash"].copy()
    return new_table(n_buckets), new_stash()


def _save_seg(seg_dir: str, pid: int, table, stash) -> None:
    """Write one segment via atomic rename."""
    path = os.path.join(seg_dir, f"seg_{pid:04d}.npz")
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, table=table, stash=stash)
    os.replace(tmp, path)


class CuckooSegments:
    """Per-partition cuckoo segment files under ``dir_path``.

    Layout: ``{dir}/seg_{pid:04d}.npz`` holding ``table`` (n_buckets×4
    uint16) + ``stash`` (uint64). Drop-in peer of seen.BloomSegments —
    plans/crawler.py dispatches on the segment type."""

    def __init__(self, dir_path: str, n_partitions: int = DEFAULT_PARTITIONS,
                 n_buckets: int = DEFAULT_BUCKETS):
        self.dir = dir_path
        self.p = n_partitions
        self.n_buckets = n_buckets
        os.makedirs(dir_path, exist_ok=True)

    def seg_path(self, pid: int) -> str:
        return os.path.join(self.dir, f"seg_{pid:04d}.npz")

    def load(self, pid: int):
        return _load_seg(self.dir, pid, self.n_buckets)

    def save(self, pid: int, table: np.ndarray, stash: np.ndarray) -> None:
        _save_seg(self.dir, pid, table, stash)


def cuckoo_probe(df, segments: CuckooSegments, hash_col: str = "url_hash",
                 claim: bool = False):
    """Append ``maybe_seen:boolean`` (and ``_claim:int`` when asked) —
    identical contract and shuffle shape to seen.bloom_probe: one pid
    exchange, per-segment tasks, within-batch claim fused in."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (BooleanType, IntegerType, StructField,
                                   StructType)

    df = df.withColumn(
        "pid", F.pmod(F.col(hash_col), F.lit(segments.p)).cast("int"))
    extra = [StructField("maybe_seen", BooleanType())]
    if claim:
        extra.append(StructField("_claim", IntegerType()))
    out_schema = StructType(df.schema.fields + extra)
    seg_dir, nb = segments.dir, segments.n_buckets

    def _probe(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        table, stash = _load_seg(seg_dir, pid, nb)
        pdf = pdf.copy()
        if claim:
            pdf = pdf.sort_values([hash_col, "seq"], kind="mergesort")
            pdf["_claim"] = (pdf.groupby(hash_col).cumcount() + 1).astype("int32")
        hashes = pdf[hash_col].to_numpy(dtype=np.int64)
        pdf["maybe_seen"] = probe_table(table, stash, hashes)
        return pdf

    return df.groupBy("pid").applyInPandas(_probe, schema=out_schema)


def _apply_per_segment(spark, segments: CuckooSegments, hashes_df,
                       hash_col: str, op):
    """Executor-side segment mutation shared by update/delete: each
    per-pid task loads its own segment, applies ``op``, writes it back
    via atomic rename. Driver collects only (pid, n) stats."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    df = hashes_df.select(hash_col).withColumn(
        "pid", F.pmod(F.col(hash_col), F.lit(segments.p)).cast("int"))
    seg_dir, nb = segments.dir, segments.n_buckets
    out_schema = StructType([
        StructField("pid", IntegerType()),
        StructField("n", LongType()),
    ])

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        table, stash = _load_seg(seg_dir, pid, nb)
        hashes = np.sort(pdf[hash_col].to_numpy(dtype=np.int64))
        table, stash, n = op(table, stash, hashes)
        _save_seg(seg_dir, pid, table, stash)
        return pd.DataFrame({"pid": [pid], "n": [n]})

    rows = df.groupBy("pid").applyInPandas(_apply, schema=out_schema).collect()
    return [(r["pid"], r["n"]) for r in rows]


def cuckoo_update(spark, segments: CuckooSegments, hashes_df,
                  hash_col: str = "url_hash") -> list:
    """Fold new hashes into the segments — executor-side commit,
    (pid, n_added) stats only cross the driver (the seen.bloom_update
    contract). NOT idempotent under task retry the way Bloom's OR is
    (a replayed insert adds a second fingerprint copy) — semantics
    stay exact (a duplicate copy can only cause a false positive, which
    the exact anti-join backstop absorbs) and capacity loss is one slot
    per retried key."""

    def _op(table, stash, hashes):
        table, stash = add_table(table, stash, hashes)
        return table, stash, len(hashes)

    return _apply_per_segment(spark, segments, hashes_df, hash_col, _op)


def cuckoo_delete(spark, segments: CuckooSegments, hashes_df,
                  hash_col: str = "url_hash") -> list:
    """Delete hashes from the segments in O(k) — the Bloom-impossible
    operation that makes revisit re-admission cheap. Caller must
    guarantee every hash was inserted (Crawler.forget_visited
    semi-joins against the exact visited table first)."""
    return _apply_per_segment(spark, segments, hashes_df, hash_col,
                              delete_table)
