#!/usr/bin/env python
"""N-vs-4N *executor-process* scaling evidence.

The north rule's criterion is N → 4N **executors** on a cluster. A
single-JVM local[4]→local[16] pair (scripts/scaling_evidence.py)
under-states that: all 16 threads share one JVM, one driver, and one
memory bus — resources each real executor brings for itself. This
harness runs K independent, CPU-pinned 4-core engine processes
concurrently (K=1 vs K=4) — the closest one box gets to "K executors,
each with its own JVM/driver/Python workers" — and reports aggregate
throughput + per-executor efficiency. Shared memory bandwidth remains
the one un-isolatable resource; the residual gap to 1.0 bounds it.

Usage: python scripts/executor_scaling.py [n_pages] [n_seeds] [repeats]
                                          [cores_per_exec] [order]
order = "ab" (default: solo then 4N) or "abba" (drift-bracketed:
solo, 4N, solo — the two solo arms' mean is the baseline, cancelling
host-speed drift between arms; the round-4 protocol of record).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CORES_PER_EXEC = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def launch(exec_idx: int):
    lo = exec_idx * CORES_PER_EXEC
    hi = lo + CORES_PER_EXEC - 1
    cmd = ["taskset", "-c", f"{lo}-{hi}", sys.executable,
           os.path.join(_HERE, "scaling_bench.py"),
           str(CORES_PER_EXEC), str(N_PAGES), str(N_SEEDS), str(REPEATS)]
    env = dict(os.environ)
    # each "executor" gets its own tmpfs scratch so shuffle dirs don't collide
    env["SPARK_GRAFT_LOCAL_SUFFIX"] = str(exec_idx)
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, env=env)


def run_level(k: int) -> dict:
    procs = [launch(i) for i in range(k)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate()
        line = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    agg = sum(o["median_urls_per_sec"] for o in outs)
    return dict(executors=k, per_executor=[o["median_urls_per_sec"] for o in outs],
                aggregate_urls_per_sec=round(agg, 1))


def main():
    order = sys.argv[5] if len(sys.argv) > 5 else "ab"
    if order == "abba":
        # drift-bracketed protocol: solo, 4N, solo — host-speed drift
        # between arms (the round-4 confound: solo arms harvesting
        # spare host cycles a minute before/after a depressed 4N
        # window) is averaged out by bracketing the 4N arm with TWO
        # solo measurements and using their mean as the baseline.
        one_a = run_level(1)
        four = run_level(4)
        one_b = run_level(1)
        base = (one_a["aggregate_urls_per_sec"]
                + one_b["aggregate_urls_per_sec"]) / 2.0
        eff = four["aggregate_urls_per_sec"] / (4 * base)
        print(json.dumps(dict(n=one_a, n_after=one_b,
                              n_bracket_mean=round(base, 1), four_n=four,
                              cores_per_executor=CORES_PER_EXEC,
                              executor_scaling_efficiency=round(eff, 3))))
        return
    one = run_level(1)
    four = run_level(4)
    eff = four["aggregate_urls_per_sec"] / (4 * one["aggregate_urls_per_sec"])
    print(json.dumps(dict(n=one, four_n=four,
                          cores_per_executor=CORES_PER_EXEC,
                          executor_scaling_efficiency=round(eff, 3))))


if __name__ == "__main__":
    main()
