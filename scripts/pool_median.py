#!/usr/bin/env python
"""Recompute the round-4 pooled scaling-pair median from the raw run JSONs.

The official round-4 scaling statistic (BENCH/BASELINE.md) is the UNWEIGHTED
median over every `efficiency_per_pair` value in every BENCH/scaling_r4_run*.json
— all completed runs stay pooled regardless of ambient load. This script is the
single source of truth for that number so the BASELINE.md table and the commit
messages can't drift from the raw JSONs.

Usage: python scripts/pool_median.py
"""
import glob
import json
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "..", "BENCH")


def load_pairs():
    runs = []
    for f in sorted(
        glob.glob(os.path.join(BENCH, "scaling_r4_run*.json")),
        key=lambda p: int(re.search(r"run(\d+)", p).group(1)),
    ):
        d = json.load(open(f))
        eff = d.get("efficiency_per_pair")
        pairs = eff if isinstance(eff, list) else [d["scaling_efficiency_2_to_8"]]
        runs.append((os.path.basename(f), pairs))
    return runs


def main():
    runs = load_pairs()
    pool = [p for _, pairs in runs for p in pairs]
    pool_sorted = sorted(pool)
    med = statistics.median(pool)
    below = sum(1 for p in pool if p < 0.84)
    print(f"runs: {len(runs)}   pairs: {len(pool)}")
    print(f"pooled median: {med:.4f}")
    print(f"pairs < 0.84: {below}   pairs >= 0.84: {len(pool) - below}")
    need = 0
    while statistics.median(pool_sorted + [0.85] * need) < 0.84:
        need += 1
    print(f"net pairs >= 0.84 still needed for pooled median >= 0.84: {need}")
    # secondary view, disclosed alongside the all-runs pool in
    # BENCH/BASELINE.md: the final-protocol pool (runs >= 36 — JIT
    # warmup, 24g heap at both levels, chaining + groups) measures the
    # protocol the round ends on, while the all-runs pool above keeps
    # every completed run regardless of protocol vintage or ambient load
    final = [
        p
        for name, pairs in runs
        if int(re.search(r"run(\d+)", name).group(1)) >= 36
        for p in pairs
    ]
    if final:
        fmed = statistics.median(final)
        print(
            f"final-protocol pool (runs >= 36): {len(final)} pairs, "
            f"median {fmed:.4f}"
        )
    for name, pairs in runs[-3:]:
        print(f"  {name}: {sorted(pairs)} (median {statistics.median(pairs):.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
