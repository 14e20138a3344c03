#!/usr/bin/env python
"""Pinned N-vs-4N scaling evidence (the north_rule ≥0.8 criterion).

The sandbox has no multi-node cluster, so the two-cluster-size
criterion is evidenced by the same drain at two parallelism levels on
the same input — with the CPU sets **pinned via taskset** so the
4-core run genuinely has 4 cores (an unpinned local[4] on a 32-core
host still spreads JVM GC/compiler/shuffle threads over every core,
overstating small-N throughput and understating efficiency).

Protocol (per judge VERDICT r01): cgroup/affinity-pinned 4-core vs
16-core processes, ≥5 measured repeats each after one warm-up drain,
medians reported. Prints one JSON line:

  {"n": {...}, "four_n": {...}, "scaling_efficiency": E}

  E = (median_tput@4N / median_tput@N) / 4

Usage: python scripts/scaling_evidence.py [n_pages] [n_seeds] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N_SMALL, N_BIG = 4, 16


def run_level(cpus: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, os.path.join(_HERE, "scaling_bench.py"),
        str(cpus), str(N_PAGES), str(N_SEEDS), str(REPEATS),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    # last stdout line is the JSON
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    small = run_level(N_SMALL)
    big = run_level(N_BIG)
    eff = (big["median_urls_per_sec"] / small["median_urls_per_sec"]) / (N_BIG / N_SMALL)
    print(json.dumps(dict(
        n=small, four_n=big,
        n_cpus=N_SMALL, four_n_cpus=N_BIG,
        scaling_efficiency=round(eff, 3))))


if __name__ == "__main__":
    main()
