"""Fixpoint-resolve cost at web scale (VERDICT r04, next-round item 2):
explore the bench web once, then time the distributed Jacobi
full-recompute fixpoint resolve against the skeleton sweep on the SAME
checkpoint, and certify both produce the identical visit set.

Why this matters: past the C kernel's int32 dense-id ceiling
(2^31 nodes, core/dfs_kernel.py) the fixpoint strategy is the ONLY
implemented exact path — its worst-case-linear-rounds cost at a scale
where it would actually be mandatory was unmeasured before this
artifact. The JSON reports rounds, per-round deltas, wall seconds, and
the skeleton-vs-fixpoint visit checksum equality.

Usage: python tools/bench_fixpoint.py [--pages 16000000] [--cores 32]
       [--depth 8] [--json BENCH_fixpoint16M.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _visit_sig(visits):
    from pyspark.sql import functions as F

    row = visits.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("url", "prio", "visit_rank",
                             "batch_id")).alias("chk")).collect()[0]
    return int(row["n"]), int(row["chk"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--max-iters", type=int, default=0,
                    help="fixpoint round cap (0 = engine default)")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_BENCH_PAGES"] = str(args.pages)
    from bench import ensure_bench_web
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt
    from crawler_spark.plans.session import get_spark

    spark = get_spark("fixpoint-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    web = ensure_bench_web()
    cfg = CrawlConfig(max_depth=args.depth,
                      rate_limit=max(50_000, args.pages // 20),
                      batch_window_ms=1000)
    ck_base = ("/dev/shm/crawler_spark_bench"
               if os.path.isdir("/dev/shm") else "/tmp/crawler_spark_bench")
    ck = fresh_ckpt(os.path.join(ck_base, "ckpt_fixpoint"))
    eng = FrontierEngine(spark, cfg, web, ck, enforce_politeness=True,
                         bucketed_web_dir=web.rstrip("/") + "-bucketed64",
                         web_buckets=64)
    t0 = time.time()
    eng.explore()
    explore_sec = round(time.time() - t0, 2)
    print(f"# explore: {explore_sec}s", file=sys.stderr)

    out = {"pages": args.pages, "cores": args.cores,
           "depth": args.depth, "explore_sec": explore_sec}

    t0 = time.time()
    sk = _visit_sig(eng.resolve(strategy="skeleton"))
    out["skeleton"] = {"resolve_sec": round(time.time() - t0, 2),
                       "visits": sk[0], "steps": dict(eng.timings)}
    print(f"# skeleton: {out['skeleton']['resolve_sec']}s "
          f"visits={sk[0]}", file=sys.stderr)

    t0 = time.time()
    fp = _visit_sig(eng.resolve(strategy="fixpoint",
                                max_iters=args.max_iters or None))
    fp_sec = round(time.time() - t0, 2)
    deltas = list(eng.resolve_deltas)
    out["fixpoint"] = {
        "resolve_sec": fp_sec, "visits": fp[0],
        "rounds": eng.last_resolve_iters,
        "sec_per_round": round(fp_sec / max(1, eng.last_resolve_iters), 2),
        "deltas_head": deltas[:12], "deltas_tail": deltas[-12:],
        "steps": dict(eng.timings)}
    print(f"# fixpoint: {fp_sec}s rounds={eng.last_resolve_iters}",
          file=sys.stderr)

    out["visits_equal"] = sk == fp
    out["slowdown_vs_skeleton"] = round(
        fp_sec / max(1e-9, out["skeleton"]["resolve_sec"]), 1)
    assert sk == fp, (sk, fp)
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
