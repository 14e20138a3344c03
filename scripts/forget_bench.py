#!/usr/bin/env python
"""A/B evidence for revisit re-admission cost: cuckoo O(k) segment
delete vs Bloom O(n) rebuild, at a visited set orders of magnitude
larger than the due set.

Protocol: build a visited set of N_KEYS hashes in segments of both
filter kinds, then time forgetting K_DUE of them from the
probabilistic layer alone (the exact-store rewrite is identical for
both filters and excluded — it is the shared Iceberg MERGE-DELETE
cost). Medians of REPEATS runs. Prints one JSON line; paste into
BENCH.md.

Env: FB_KEYS (default 2_000_000), FB_DUE (default 10_000),
FB_REPEATS (default 3), FB_PARTS (default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from colly_spark.operators import cuckoo, seen  # noqa: E402

N_KEYS = int(os.environ.get("FB_KEYS", "2000000"))
K_DUE = int(os.environ.get("FB_DUE", "10000"))
REPEATS = int(os.environ.get("FB_REPEATS", "3"))
PARTS = int(os.environ.get("FB_PARTS", "16"))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main():
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(-2**63, 2**63 - 1, size=N_KEYS,
                                  dtype=np.int64))
    due = keys[:: max(1, len(keys) // K_DUE)][:K_DUE]
    keep_probe = keys[1:: max(1, len(keys) // K_DUE)][:K_DUE]
    pid = (keys.view(np.uint64) % np.uint64(PARTS)).astype(np.int64)
    due_pid = (due.view(np.uint64) % np.uint64(PARTS)).astype(np.int64)

    # size the cuckoo segments for the key count at ~85% load
    per_seg = len(keys) / PARTS
    n_buckets = 1 << int(np.ceil(np.log2(per_seg / (4 * 0.85))))
    bloom_bits = 1 << int(np.ceil(np.log2(per_seg * 12)))

    root = tempfile.mkdtemp(prefix="forget_bench_")
    ck = cuckoo.CuckooSegments(os.path.join(root, "ck"), PARTS, n_buckets)
    bl = seen.BloomSegments(os.path.join(root, "bl"), PARTS, bloom_bits)

    t0 = time.time()
    for p in range(PARTS):
        t, s = ck.load(p)
        t, s = cuckoo.add_table(t, s, keys[pid == p])
        ck.save(p, t, s)
    build_ck = time.time() - t0
    t0 = time.time()
    for p in range(PARTS):
        bits = bl.load(p)
        seen.add_bits(bits, keys[pid == p])
        bl.save(p, bits)
    build_bl = time.time() - t0

    # cuckoo forget: delete exactly the due fingerprints (per-segment),
    # measured per repeat on a fresh copy of the touched segments
    ck_times, bl_times = [], []
    for _ in range(REPEATS):
        # pristine copies: delete_table mutates its table IN PLACE, so
        # restoring the same arrays would persist the deleted state and
        # repeats 2+ would time a different (not-found) workload
        snap = {p: ck.load(p) for p in range(PARTS)}
        work = {p: (t.copy(), s.copy()) for p, (t, s) in snap.items()}
        t0 = time.time()
        for p in np.unique(due_pid):
            t, s = work[int(p)]
            t, s, _n = cuckoo.delete_table(t, s, due[due_pid == p])
            ck.save(int(p), t, s)
        ck_times.append(time.time() - t0)
        # restore the pristine pre-delete segments
        for p, (t, s) in snap.items():
            ck.save(p, t, s)

        # bloom forget: no deletion — rebuild every segment from the
        # remaining exact set (what Crawler.forget_visited must do)
        remaining = np.setdiff1d(keys, due)
        rem_pid = (remaining.view(np.uint64) % np.uint64(PARTS)).astype(np.int64)
        t0 = time.time()
        for p in range(PARTS):
            bits = np.zeros(bloom_bits // 8, dtype=np.uint8)
            seen.add_bits(bits, remaining[rem_pid == p])
            bl.save(p, bits)
        bl_times.append(time.time() - t0)

    # correctness spot-checks
    t, s = ck.load(int(due_pid[0]))
    assert cuckoo.probe_table(t, s, keep_probe[
        (keep_probe.view(np.uint64) % np.uint64(PARTS)).astype(np.int64)
        == due_pid[0]]).all()

    out = {
        "metric": "revisit re-admission (forget) cost, probabilistic layer only",
        "n_keys": int(len(keys)), "k_due": int(len(due)),
        "partitions": PARTS, "cuckoo_buckets_per_seg": int(n_buckets),
        "bloom_bits_per_seg": int(bloom_bits),
        "build_cuckoo_sec": round(build_ck, 2),
        "build_bloom_sec": round(build_bl, 2),
        "forget_cuckoo_sec_median": round(_median(ck_times), 3),
        "forget_bloom_rebuild_sec_median": round(_median(bl_times), 3),
        "speedup": round(_median(bl_times) / max(_median(ck_times), 1e-9), 1),
        "runs": {"cuckoo": [round(x, 3) for x in ck_times],
                 "bloom": [round(x, 3) for x in bl_times]},
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
