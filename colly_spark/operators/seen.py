"""URL-seen layer — partitioned Bloom segments + exact anti-join backstop.

Replaces the reference's in-memory visited map (colly.go:452 default
InMemoryStorage; storage.Storage interface IsVisited/Visited keyed by
FNV-64a uint64, colly.go:1484-1498) with the distributed design from
SURVEY.md §2.4/D1:

- **Bloom segments**: the 64-bit URL-hash space is split into ``P``
  partitions by ``pmod(url_hash, P)``; each partition owns one Bloom
  bit-array segment persisted as a file. A probe/update task touches
  ONLY its own segment — tasks are co-partitioned with the candidate
  batch (``repartition(P, pmod(url_hash, P))`` + ``applyInPandas`` per
  pid), so no segment is ever broadcast or shuffled. At 10^10 URLs /
  10 bits-per-key the full filter is ~12.5 GB but each task reads a
  ~12.5/P GB segment from shared storage (object store / Iceberg blob
  table at deployment; local files in-sandbox — same access pattern).
- **Exact backstop**: Bloom-positive candidates (a tiny fraction:
  true dupes + ~0.8% false positives at 10 bits/key, k=7) are
  left-anti-joined against the exact ``visited`` table (parquet
  in-sandbox / bucketed Iceberg at deployment, bucketed by the same
  ``pmod(url_hash, P)`` so the join is storage-partitioned and
  shuffle-free). Bloom-negatives are *definitely new* and skip the
  join entirely — this is what makes dedup cheap at 10^10 scale.

Determinism: probe/update are pure functions of (hash set, segment
state); segments are snapshotted per batch for byte-identical resume
(see plans/crawler.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# 2^20 bits (128 KiB) per segment is sized for the sandbox corpus; at
# 10^10 keys deploy with bits_per_segment = 10 * 10^10 / P.
DEFAULT_PARTITIONS = 16
DEFAULT_BITS = 1 << 20
DEFAULT_K = 7

_SM1 = np.uint64(0x9E3779B97F4A7C15)
_SM2 = np.uint64(0xBF58476D1CE4E5B9)
_SM3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public splitmix64 finalizer — derives the second Bloom hash from
    the FNV-64a key (double hashing: idx_i = h1 + i*h2 mod m)."""
    with np.errstate(over="ignore"):
        x = x + _SM1
        x = (x ^ (x >> np.uint64(30))) * _SM2
        x = (x ^ (x >> np.uint64(27))) * _SM3
        return x ^ (x >> np.uint64(31))


def _indices(hashes_u64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing."""
    h1 = hashes_u64
    h2 = _splitmix64(hashes_u64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def probe_bits(bits: np.ndarray, hashes_i64: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """bool[n]: True = maybe-seen (all k bits set), False = definitely new."""
    if len(hashes_i64) == 0:
        return np.zeros(0, dtype=bool)
    idx = _indices(hashes_i64.view(np.uint64), len(bits) * 8, k)
    byte = (idx >> np.uint64(3)).astype(np.int64)
    bit = (idx & np.uint64(7)).astype(np.uint8)
    return (((bits[byte] >> bit) & 1) == 1).all(axis=1)


def add_bits(bits: np.ndarray, hashes_i64: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """Set the k bits of each hash; returns the mutated array."""
    if len(hashes_i64) == 0:
        return bits
    idx = _indices(hashes_i64.view(np.uint64), len(bits) * 8, k)
    byte = (idx >> np.uint64(3)).astype(np.int64).ravel()
    bit = (idx & np.uint64(7)).astype(np.uint8).ravel()
    np.bitwise_or.at(bits, byte, np.uint8(1) << bit)
    return bits


class BloomSegments:
    """Per-partition Bloom segment files under ``dir_path``.

    Layout: ``{dir}/seg_{pid:04d}.npy`` — one uint8 bit-array each.
    Snapshot/restore copies the directory (plans/crawler.py snapshots
    per batch for resume).
    """

    def __init__(self, dir_path: str, n_partitions: int = DEFAULT_PARTITIONS,
                 bits: int = DEFAULT_BITS, k: int = DEFAULT_K):
        self.dir = dir_path
        self.p = n_partitions
        self.m = bits
        self.k = k
        os.makedirs(dir_path, exist_ok=True)

    def seg_path(self, pid: int) -> str:
        return os.path.join(self.dir, f"seg_{pid:04d}.npy")

    def load(self, pid: int) -> np.ndarray:
        path = self.seg_path(pid)
        if os.path.exists(path):
            return np.load(path)
        return np.zeros(self.m // 8, dtype=np.uint8)

    def save(self, pid: int, bits: np.ndarray) -> None:
        tmp = self.seg_path(pid) + ".tmp"
        np.save(tmp, bits)
        os.replace(tmp + ".npy" if os.path.exists(tmp + ".npy") else tmp, self.seg_path(pid))


def with_pid(df, hash_col: str = "url_hash", p: int = DEFAULT_PARTITIONS):
    from pyspark.sql import functions as F

    return df.withColumn("pid", F.pmod(F.col(hash_col), F.lit(p)).cast("int"))


def bloom_probe(df, segments: BloomSegments, hash_col: str = "url_hash",
                claim: bool = False):
    """Append ``maybe_seen:boolean`` — co-partitioned probe.

    ``applyInPandas`` over ``groupBy(pid)``: each task loads only its
    own segment file. No broadcast, no shuffle beyond the pid
    repartition (which doubles as the layout the exact visited table is
    bucketed by).

    ``claim=True`` additionally appends ``_claim:int`` — the within-
    batch first-claim rank (1 = lowest ``seq`` per hash). pid is a pure
    function of the hash, so every duplicate of a hash lands in the
    same task and the rank is exact — this fuses the crawler's
    within-batch dedup window into the probe's ONE exchange instead of
    shuffling by url_hash and again by pid."""
    from pyspark.sql.types import (BooleanType, IntegerType, StructField,
                                   StructType)

    df = with_pid(df, hash_col, segments.p)
    extra = [StructField("maybe_seen", BooleanType())]
    if claim:
        extra.append(StructField("_claim", IntegerType()))
    out_schema = StructType(df.schema.fields + extra)
    seg_dir, m, k = segments.dir, segments.m, segments.k

    def _probe(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        path = os.path.join(seg_dir, f"seg_{pid:04d}.npy")
        bits = np.load(path) if os.path.exists(path) else np.zeros(m // 8, dtype=np.uint8)
        pdf = pdf.copy()
        if claim:
            pdf = pdf.sort_values([hash_col, "seq"], kind="mergesort")
            pdf["_claim"] = (pdf.groupby(hash_col).cumcount() + 1).astype("int32")
        hashes = pdf[hash_col].to_numpy(dtype=np.int64)
        pdf["maybe_seen"] = probe_bits(bits, hashes, k)
        return pdf

    return df.groupBy("pid").applyInPandas(_probe, schema=out_schema)


def bloom_update(spark, segments: BloomSegments, hashes_df,
                 hash_col: str = "url_hash") -> list:
    """Fold new hashes into the segments — **executor-side commit**.

    Each per-pid task loads its own segment, ORs the new bits in, and
    writes the result back itself via atomic rename (shared storage:
    local files in-sandbox, object store / Iceberg blob MERGE at
    deployment). The driver collects only (pid, n_added) stats — a few
    ints per partition, never filter bytes. At 10^10 keys the full
    filter is ~12.5 GB; the previous driver-side commit funneled all of
    it through one process per micro-batch, which this removes.

    Task-retry safe: the update is an idempotent monotone OR — a
    re-executed task re-reads the current segment and re-ORs the same
    hashes; rename keeps each write atomic.

    Returns the collected [(pid, n_added)] stats (tests assert nothing
    binary crosses the driver).
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    df = with_pid(hashes_df.select(hash_col), hash_col, segments.p)
    seg_dir, m, k = segments.dir, segments.m, segments.k
    out_schema = StructType([
        StructField("pid", IntegerType()),
        StructField("n_added", LongType()),
    ])

    def _update(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        path = os.path.join(seg_dir, f"seg_{pid:04d}.npy")
        bits = np.load(path) if os.path.exists(path) else np.zeros(m // 8, dtype=np.uint8)
        add_bits(bits, pdf[hash_col].to_numpy(dtype=np.int64), k)
        tmp = f"{path}.{os.getpid()}.tmp.npy"
        with open(tmp, "wb") as f:
            np.save(f, bits)
        os.replace(tmp, path)
        return pd.DataFrame({"pid": [pid], "n_added": [len(pdf)]})

    rows = df.groupBy("pid").applyInPandas(_update, schema=out_schema).collect()
    return [(r["pid"], r["n_added"]) for r in rows]
