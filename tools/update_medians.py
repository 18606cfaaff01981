#!/usr/bin/env python3
"""Fold one or more CLEAN bench runs' full per-query maps into
tools/bench_clean_medians.tsv (the trend-gate baseline).

Usage: tools/update_medians.py <sfDir> <full_map.json> [more.json ...]
Each input file holds ONE JSON object {shortKey: seconds} — the payload
of a `[bench-full]` diag line from a run whose stdout line had
canary_dev <= 0.10. With several inputs the per-query median is kept.

MERGE semantics: the existing tsv is read first and baselines for keys
absent from every input are KEPT (an input run with errored queries must
not silently drop their trend gate); a previously-baselined key that
disappears from all inputs is warned about, never deleted. Keys present
in both take the new median.
"""
import json
import os
import statistics
import sys

def main() -> None:
    sf = sys.argv[1]
    maps = [json.load(open(p)) for p in sys.argv[2:]]
    path = "tools/bench_clean_medians.tsv"
    prior = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                k, _, v = line.strip().partition(" ")
                if k == "sf" and v and v != sf:
                    # merging would relabel the prior file's cross-scale
                    # baselines under the new sf, corrupting the trend
                    # gate — refuse instead of silently mixing scales
                    sys.exit(f"error: existing {path} is for sf '{v}', "
                             f"not '{sf}'; delete it first to rebase")
                if k and k != "sf":
                    prior[k] = v
    new_keys = set().union(*maps) if maps else set()
    stale = sorted(set(prior) - new_keys)
    for k in stale:
        print(f"warning: '{k}' absent from every input; keeping prior "
              f"baseline {prior[k]}", file=sys.stderr)
    merged = dict(prior)
    for k in new_keys:
        vals = [m[k] for m in maps if k in m]
        merged[k] = f"{statistics.median(vals):.2f}"
    out = ["sf " + sf] + [f"{k} {merged[k]}" for k in sorted(merged)]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {len(merged)} baselines ({len(new_keys)} updated from "
          f"{len(maps)} clean runs, {len(stale)} kept) to {path}")

if __name__ == "__main__":
    main()
