#!/usr/bin/env python
"""Record a scaling run: extract the last JSON line of a bench.py stdout
capture, pretty-print it to BENCH/scaling_r4_runN.json, and print the
updated pooled median (via scripts/pool_median.py logic).

Usage: python scripts/record_scaling_run.py <N> <stdout-file>
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import pool_median  # noqa: E402


def main(n, stdout_file):
    last = None
    with open(stdout_file) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                last = line
    if last is None:
        print(f"no JSON line found in {stdout_file}", file=sys.stderr)
        return 1
    d = json.loads(last)
    out = os.path.join(HERE, "..", "BENCH", f"scaling_r4_run{n}.json")
    if os.path.exists(out):
        print(f"refusing to overwrite existing {out}", file=sys.stderr)
        return 1
    with open(out, "w") as fh:
        json.dump(d, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out}")
    print("pairs:", d.get("efficiency_per_pair"))
    print("loads:", d.get("ambient_load1_per_pair"))
    print("chained:", d.get("chained_per_pair"))
    return pool_median.main()


if __name__ == "__main__":
    usage = "usage: python scripts/record_scaling_run.py <N> <stdout-file>"
    if len(sys.argv) != 3:
        print(usage, file=sys.stderr)
        sys.exit(2)
    try:
        run_n = int(sys.argv[1])
    except ValueError:
        print(f"<N> must be an integer, got {sys.argv[1]!r}\n{usage}",
              file=sys.stderr)
        sys.exit(2)
    sys.exit(main(run_n, sys.argv[2]))
