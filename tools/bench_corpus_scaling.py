"""Two-parallelism scaling evidence for the COMPOSED corpus pipeline
(VERDICT r04, next-round item 4): run jobs/corpus_job.py (features →
exact dedup → MinHash CC → canonical docs + embedding clusters) at two
local core counts in SEPARATE JVMs on the SAME sf input, same epoch,
and report wall time at both plus scaling efficiency against the
same-epoch hardware ceiling — the same methodology as
tools/bench_scaling.py. The constituents (dedup, LSH, CC) each have
scale arguments; this measures the COMPOSITION, where CC rounds and
the join chain could hide a serial surprise.

Usage: python tools/bench_corpus_scaling.py [--small 8] [--large 32]
       [--sf /root/testdata/sf0.1] [--repeat 3]
       [--json BENCH_corpus_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from crawler_spark.plans.session import get_spark
from jobs.corpus_job import run_corpus

spark = get_spark("corpus-scaling", cores={cores},
                  shuffle_partitions={cores})
out_dir = "/tmp/crawler_spark_bench/corpus_scaling_{cores}"
# JIT/codegen prewarm at the smallest sf (per-JVM constant, identical
# at both core counts; the timed runs measure the steady-state job)
warm_sf = {warm_sf!r}
if os.path.isdir(warm_sf):
    shutil.rmtree(out_dir, ignore_errors=True)
    run_corpus(spark, os.path.join(warm_sf, "documents.parquet"), out_dir,
               embeddings=os.path.join(warm_sf, "embeddings.parquet"),
               cosine_threshold=0.4)
walls = []
stats = None
for _ in range({repeat}):
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    stats = run_corpus(spark, os.path.join({sf!r}, "documents.parquet"),
                       out_dir,
                       embeddings=os.path.join({sf!r}, "embeddings.parquet"),
                       cosine_threshold=0.4)
    walls.append(round(time.time() - t0, 2))
print("RESULT " + json.dumps({{"walls": walls, "stats": stats}}))
"""


def run_one(cores: int, sf: str, warm_sf: str, repeat: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, sf=sf, warm_sf=warm_sf,
                        repeat=repeat)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, check=False)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child (cores={cores}) failed:\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from tools.bench_scaling import run_calibration

    calibration = run_calibration(args.small, args.large)
    small = run_one(args.small, args.sf, args.warm_sf, args.repeat)
    large = run_one(args.large, args.sf, args.warm_sf, args.repeat)
    t_s, t_l = min(small["walls"]), min(large["walls"])
    med_s = statistics.median(small["walls"])
    med_l = statistics.median(large["walls"])
    ratio = args.large / args.small
    # fixed input, so throughput ratio = wall ratio
    out = {
        "small_cores": args.small, "large_cores": args.large,
        "sf": args.sf,
        "small_walls_sec": small["walls"], "large_walls_sec": large["walls"],
        "small_sec": t_s, "large_sec": t_l,
        "stats": large["stats"],
        "speedup": round(t_s / t_l, 3),
        "ideal_ratio": ratio,
        "scaling_efficiency": round(t_s / (ratio * t_l), 3),
        "scaling_efficiency_median": round(med_s / (ratio * med_l), 3),
        "hardware_calibration": calibration,
        "note": ("min-of-N headline (noisy-neighbor sandbox), median "
                 "alongside; children prewarm JIT/codegen at --warm-sf "
                 "before timing; same-epoch hardware_calibration = the "
                 "pair efficiency of a perfectly-parallel shuffle-free "
                 "Spark workload on this shared-memory box"),
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
