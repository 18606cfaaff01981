#!/usr/bin/env python3
"""Fold one or more CLEAN bench runs' full per-query maps into
tools/bench_clean_medians.tsv (the trend-gate baseline).

Usage: tools/update_medians.py <sfDir> <full_map.json> [more.json ...]
Each input file holds ONE JSON object {shortKey: seconds} — the payload
of a `[bench-full]` diag line from a run whose stdout line had
canary_dev <= 0.10. With several inputs the per-query median is kept.
"""
import json
import statistics
import sys

def main() -> None:
    sf = sys.argv[1]
    maps = [json.load(open(p)) for p in sys.argv[2:]]
    keys = sorted(set().union(*maps))
    out = ["sf " + sf]
    for k in keys:
        vals = [m[k] for m in maps if k in m]
        out.append(f"{k} {statistics.median(vals):.2f}")
    path = "tools/bench_clean_medians.tsv"
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {len(keys)} medians from {len(maps)} clean runs to {path}")

if __name__ == "__main__":
    main()
