"""Spilled politeness-cursor evidence at scale (VERDICT r03, next-round
item 2): a deferral-heavy synthetic web where >10^6 distinct hosts all
freeze URLs in the same round, crawled twice on identical input —

  * spilled mode (the DEFAULT 500k-row cap): the per-(host, salt)
    freeze cursor transitions to parquet + small Spark aggs the first
    time it outgrows the cap; driver RSS stays flat afterwards;
  * pandas mode (cap forced above the host count): the round-3 code
    path that kept the whole cursor driver-resident.

Reports per-run peak driver RSS (the Python driver process; the JVM is
separate), the cursor row count and mode, and certifies SCHEDULE
IDENTITY: an order-insensitive xxhash64 digest + count over every
(round, sel, url, depth) the two crawls scheduled must match exactly.

The web: 64 seed hubs (one host each) each link a slice of `--hosts`
single-host sites, `--per-host` leaf pages per site, all at depth 1.
With rate_limit=4 and 9 pages/host: round 1 fetches 4 and defers 5;
in round 2 the deferred rows satisfy depth <= bound (the previous
batch's min depth — the can-never-be-overtaken freeze criterion), so
4 fetch and 1 freezes → >10^6 frozen (host, salt) groups in one
round, drained by cursor pops in the rounds after.

Usage: python tools/bench_cursor_spill.py [--hosts 1100000]
       [--per-host 9] [--cores 32] [--json BENCH_cursor_spill.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMG_T = pa.list_(pa.struct([("src", pa.string()), ("alt", pa.string())]))
N_HUBS = 64


def _pages_table(url, host, links_href, links_off):
    """One parquet-file batch in the bench web schema (no images)."""
    n = len(url)
    href = pa.array(links_href, pa.string())
    li = pa.array(
        np.concatenate([np.arange(links_off[i + 1] - links_off[i],
                                  dtype=np.int32)
                        for i in range(n)]) if len(links_href)
        else np.array([], np.int32))
    link_struct = pa.StructArray.from_arrays(
        [href, pa.array(["a"] * len(links_href), pa.string()), li],
        names=["href", "element_type", "link_index"])
    links = pa.ListArray.from_arrays(pa.array(links_off, pa.int32()),
                                     link_struct)
    empty_imgs = pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, np.int32)),
        pa.StructArray.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string())],
            names=["src", "alt"])).cast(IMG_T)
    return pa.table({
        "url": pa.array(url, pa.string()),
        "host": pa.array(host, pa.string()),
        "status_code": pa.array(np.full(n, 200, np.int32)),
        "title": pa.array(["t"] * n, pa.string()),
        "links": links,
        "images": empty_imgs,
        "load_time_ms": pa.array(np.full(n, 100, np.int32)),
    })


def generate_deferral_web(out_dir: str, n_hosts: int,
                          per_host: int) -> dict:
    """64 hub pages (one per hub host, one parquet file each so round
    0's explode fans out) -> n_hosts single-host sites with per_host
    leaf pages each, all depth 1. Vectorized per 62.5k-host chunks."""
    os.makedirs(out_dir, exist_ok=True)
    web_dir = os.path.join(out_dir, "web_pages.parquet")
    os.makedirs(web_dir, exist_ok=True)

    # hub pages: hub j links every page of hosts k ≡ j (mod N_HUBS)
    hub_urls = [f"http://hub{j}.dfr.org/r" for j in range(N_HUBS)]
    for j in range(N_HUBS):
        k = np.arange(j, n_hosts, N_HUBS, dtype=np.int64)
        ck = np.repeat(k, per_host)
        ci = np.tile(np.arange(per_host, dtype=np.int64), len(k))
        hrefs = pc.binary_join_element_wise(
            "http://h", pc.cast(pa.array(ck), pa.string()), ".dfr.org/c",
            pc.cast(pa.array(ci), pa.string()), "").to_pylist()
        pq.write_table(
            _pages_table([hub_urls[j]], [f"hub{j}.dfr.org"], hrefs,
                         [0, len(hrefs)]),
            os.path.join(web_dir, f"part-hub{j:03d}.parquet"))

    hosts_per_file = 62_500
    fno = 0
    for a in range(0, n_hosts, hosts_per_file):
        b = min(a + hosts_per_file, n_hosts)
        k = np.arange(a, b, dtype=np.int64)
        ck = np.repeat(k, per_host)
        ci = np.tile(np.arange(per_host, dtype=np.int64), b - a)
        urls = pc.binary_join_element_wise(
            "http://h", pc.cast(pa.array(ck), pa.string()), ".dfr.org/c",
            pc.cast(pa.array(ci), pa.string()), "")
        hosts = pc.binary_join_element_wise(
            "h", pc.cast(pa.array(ck), pa.string()), ".dfr.org", "")
        pq.write_table(
            _pages_table(urls.to_pylist(), hosts.to_pylist(),
                         [], np.zeros(len(ck) + 1, np.int64)),
            os.path.join(web_dir, f"part-c{fno:05d}.parquet"))
        fno += 1

    pq.write_table(pa.table({
        "url": pa.array(hub_urls),
        "seed_rank": pa.array(list(range(N_HUBS)), pa.int32()),
    }), os.path.join(out_dir, "seeds.parquet"))
    # robots: empty dim with the right schema — no crawl-delay rows, so
    # every host gets the rate_limit cap (the freeze pressure source)
    pq.write_table(pa.table({
        "host": pa.array([], pa.string()),
        "disallow_prefixes": pa.array([], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([], pa.int64()),
    }), os.path.join(out_dir, "robots.parquet"))
    return {"hosts": n_hosts, "per_host": per_host,
            "pages": N_HUBS + n_hosts * per_host}


class RssSampler(threading.Thread):
    def __init__(self, period: float = 0.5):
        super().__init__(daemon=True)
        self.period = period
        self.samples: list[tuple[float, int]] = []
        self._halt = threading.Event()

    @staticmethod
    def rss_mb() -> int:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
        return -1

    def run(self):
        while not self._halt.is_set():
            self.samples.append((time.time(), self.rss_mb()))
            self._halt.wait(self.period)

    def stop(self) -> dict:
        self._halt.set()
        self.join()
        vals = [v for _, v in self.samples]
        return {"peak_mb": max(vals), "start_mb": vals[0],
                "end_mb": vals[-1], "n_samples": len(vals)}


def crawl(spark, web: str, ck: str, spill_rows: int) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt

    cfg = CrawlConfig(max_depth=8, rate_limit=4, batch_window_ms=1000)
    ck = fresh_ckpt(ck)
    samp = RssSampler()
    samp.start()
    t0 = time.time()
    eng = FrontierEngine(spark, cfg, web, ck, enforce_politeness=True,
                         cursor_spill_rows=spill_rows)
    eng.explore()
    wall = round(time.time() - t0, 2)
    rss = samp.stop()
    # cursor facts straight from the engine
    if eng._cursor_spark:
        n_cursor = eng._parquet_rows(eng._cursor_sdf_path)
    else:
        n_cursor = 0 if eng._cursor is None else len(eng._cursor)
    # schedule digest: order-insensitive hash + count over everything
    # scheduled (round and sel are partition columns of the ckpt table)
    fr = spark.read.parquet(os.path.join(ck, "frontier"))
    h = F.xxhash64("round", "sel", "url", "depth")
    row = fr.agg(
        F.count("*").alias("n"),
        # order-insensitive, overflow-free digest: xor of the row
        # hashes plus a modded sum (the sum catches xor's pairwise
        # cancellation; 2^31 · row-count stays far under int64)
        F.bit_xor(h).alias("digest_xor"),
        F.sum(F.pmod(h, F.lit(2147483647))).alias("digest_sum")
    ).collect()[0]
    return {"wall_sec": wall, "rss": rss,
            "cursor_spilled": bool(eng._cursor_spark),
            "cursor_rows": int(n_cursor),
            "rounds": len(fr.select("round").distinct().collect()),
            "scheduled_rows": int(row["n"]),
            "schedule_digest": [int(row["digest_xor"]),
                                int(row["digest_sum"])]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=1_100_000)
    ap.add_argument("--per-host", type=int, default=9)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--spill-rows", type=int, default=500_000,
                    help="spill cap for the spilled-mode run (the "
                    "engine default; lower only for smoke tests)")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from crawler_spark.plans.session import get_spark

    web = f"/tmp/crawler_spark_bench/dfrv2-{args.hosts}-{args.per_host}"
    if not os.path.exists(os.path.join(web, "seeds.parquet")):
        print("# generating deferral web…", file=sys.stderr)
        print(f"# {generate_deferral_web(web, args.hosts, args.per_host)}",
              file=sys.stderr)
    spark = get_spark("cursor-spill", cores=args.cores,
                      shuffle_partitions=args.cores)
    ck_base = ("/dev/shm/crawler_spark_bench"
               if os.path.isdir("/dev/shm") else "/tmp/crawler_spark_bench")
    out = {"hosts": args.hosts, "per_host": args.per_host,
           "cores": args.cores, "rate_limit": 4,
           "spill_rows": args.spill_rows}
    out["spilled"] = crawl(spark, web, os.path.join(ck_base, "ck_spill"),
                           spill_rows=args.spill_rows)
    print(f"# spilled: {out['spilled']}", file=sys.stderr)
    out["pandas"] = crawl(spark, web, os.path.join(ck_base, "ck_pandas"),
                          spill_rows=1 << 40)
    print(f"# pandas: {out['pandas']}", file=sys.stderr)
    s, p = out["spilled"], out["pandas"]
    assert s["cursor_spilled"] and not p["cursor_spilled"]
    out["schedule_identical"] = (
        s["scheduled_rows"] == p["scheduled_rows"]
        and s["schedule_digest"] == p["schedule_digest"])
    assert out["schedule_identical"], (s, p)
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
