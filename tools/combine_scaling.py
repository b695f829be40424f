"""Combine per-pair bench_scaling JSONs into BENCH_scaling.json.

The committed artifact keeps the 2->8 pair's fields at top level (the
pair where the shared-memory box itself can still scale, see
BASELINE.md) and carries every pair under "pairs".

Usage: python tools/combine_scaling.py out.json pair1.json [pair2.json ...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *pair_paths = sys.argv[1:]
    pairs = []
    for p in pair_paths:
        with open(p) as f:
            pairs.append(json.load(f))
    pairs.sort(key=lambda d: d["small_cores"])
    combined = dict(pairs[0])
    combined["pairs"] = [
        {k: d[k] for k in (
            "small_cores", "large_cores", "speedup", "scaling_efficiency",
            "explore_scaling_efficiency", "hardware_calibration",
            "small", "large") if k in d}
        for d in pairs
    ]
    with open(out_path, "w") as f:
        json.dump(combined, f, indent=1)
    for d in pairs:
        print(f"{d['small_cores']}->{d['large_cores']}: "
              f"eff={d['scaling_efficiency']} "
              f"explore={d['explore_scaling_efficiency']} "
              f"ceiling={d['hardware_calibration'].get('hardware_ceiling_efficiency')}")


if __name__ == "__main__":
    main()
