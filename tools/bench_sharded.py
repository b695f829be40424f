"""Parallel sharded-resolve evidence at web scale: explore the 16M-page
bench web once, then run the seed-branch-sharded exact resolve twice on
the same checkpoint — sequential (shard_procs=1) and parallel
(shard_procs=auto) — and report the per-shard sweep walls vs the total
dfs_sweep wall for both.

The claim this artifact certifies (VERDICT r03, next-round item 1):
with independent seed branches the parallel path's sweep wall collapses
from ~sum(shard sweeps) to ~max(shard sweep), while the visit count
(and, pinned separately by tests/test_crawl_golden.py, the row-for-row
visit order) is identical to the sequential path.

Usage: python tools/bench_sharded.py [--pages 16000000] [--cores 32]
       [--depth 8] [--shards 8] [--json BENCH_sharded16M.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--clusters", type=int, default=0,
                    help="generate the PARTITIONABLE web variant "
                    "(cross links stay in-cluster, per-cluster seed "
                    "blocks) — the disjoint-branch shape the parallel "
                    "optimistic sweep targets; 0 = the standard "
                    "fully-cross-linked bench web")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_BENCH_PAGES"] = str(args.pages)
    from bench import ensure_bench_web
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt
    from crawler_spark.plans.session import get_spark

    spark = get_spark("sharded-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    if args.clusters:
        from crawler_spark.sources.synth_web import generate_bench_web
        web = (f"/tmp/crawler_spark_bench/web-{args.pages}"
               f"-s1024-c{args.clusters}")
        if not os.path.exists(os.path.join(web, "seeds.parquet")):
            print("# generating clustered bench web…", file=sys.stderr)
            print(f"# {generate_bench_web(web, args.pages, n_hosts=1024, n_seeds=1024, n_clusters=args.clusters)}",
                  file=sys.stderr)
    else:
        web = ensure_bench_web()
    cfg = CrawlConfig(max_depth=args.depth,
                      rate_limit=max(50_000, args.pages // 20),
                      batch_window_ms=1000)
    ck_base = ("/dev/shm/crawler_spark_bench"
               if os.path.isdir("/dev/shm") else "/tmp/crawler_spark_bench")
    ck = fresh_ckpt(os.path.join(ck_base, "ckpt_sharded"))
    eng = FrontierEngine(spark, cfg, web, ck, enforce_politeness=True,
                         bucketed_web_dir=web.rstrip("/") + "-bucketed64",
                         web_buckets=64)
    t0 = time.time()
    eng.explore()
    explore_sec = round(time.time() - t0, 2)
    print(f"# explore: {explore_sec}s", file=sys.stderr)

    out = {"pages": args.pages, "cores": args.cores,
           "n_shards": args.shards, "explore_sec": explore_sec}
    counts = {}
    for label, procs in (("sequential", 1), ("parallel", None)):
        eng.timings = {}
        t0 = time.time()
        n = eng.resolve(strategy="sharded", n_shards=args.shards,
                        shard_procs=procs).count()
        wall = round(time.time() - t0, 2)
        counts[label] = n
        steps = dict(eng.timings)
        shard = steps.get("shard_sweeps", [])
        out[label] = {
            "resolve_sec": wall, "visits": n, "steps": steps,
            "sweep_wall_sec": steps.get("dfs_sweep"),
            "shard_sweep_sum_sec": round(sum(shard), 2),
            "shard_sweep_max_sec": (round(max(shard), 2) if shard
                                    else None)}
        print(f"# {label}: resolve {wall}s sweep "
              f"{steps.get('dfs_sweep')}s shards={shard} "
              f"impl={steps.get('sweep_impl')}", file=sys.stderr)
    assert counts["sequential"] == counts["parallel"], counts
    out["visits_equal"] = True
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
