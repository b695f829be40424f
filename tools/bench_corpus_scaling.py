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


def ensure_scaled_corpus(sf: str, scale: int, scale_vec: int,
                         dup_variants: int = 4,
                         salad_words: int = 120) -> str:
    """Deterministically inflate the sf corpus so the pair has real
    distributed work to scale: each doc gets `scale` variants
    (id*1000+k). The first `dup_variants` are NEAR-DUPLICATES (a
    short ' v{k}' suffix — distinct fingerprints, high MinHash
    similarity, so the near-dup CC sees clusters of ~dup_variants);
    the rest are DISTINCT deterministic word-salad of ~salad_words
    tokens (Jaccard ~0 to everything, so candidate pairs stay linear
    in n — making ALL variants near-dups grew the in-cluster pair set
    quadratically in `scale` and the verify join swamped the bench).
    Each embedding gets `scale_vec` perturbed variants (tiny
    deterministic per-dim noise, cosine within a variant group ~1).
    At sf0.1 the raw corpus (5k docs) finishes in ~12 s at EIGHT
    cores — pure job-scheduling constants, which no core count can
    speed up; the measured pair must run where the work, not the
    overhead, dominates. Generated once with pyarrow/numpy (no Spark,
    no RNG), cached under /tmp."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join("/tmp/crawler_spark_bench",
                       f"corpus_input_m{scale}x{scale_vec}")
    if os.path.exists(os.path.join(out, "embeddings.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(os.path.join(sf, "documents.parquet"))
    n = len(docs)
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    text = docs["text"].to_pylist()
    cols = {c: docs[c].to_pylist() for c in ("lang", "source")}
    nchars = docs["n_chars"].to_numpy(zero_copy_only=False)
    vocab = np.array([f"t{i:04x}" for i in range(1 << 16)])
    mask = np.uint64((1 << 64) - 1)
    parts = []
    for k in range(scale):
        if k < dup_variants:
            sfx = f" v{k:02d}"
            ktext = [t + sfx for t in text]
            klen = nchars + len(sfx)
        else:
            # word-salad: per-(doc, k, position) mixed hash → vocab
            # (uint64 wrap-around is the hash — silence the warning)
            with np.errstate(over="ignore"):
                h0 = (ids.astype(np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15)
                      + np.uint64(k) * np.uint64(0xC2B2AE3D27D4EB4F)) & mask
            idx = ((h0[:, None]
                    + np.arange(salad_words, dtype=np.uint64)[None, :]
                    * np.uint64(0x165667B19E3779F9)) & mask)
            idx = ((idx ^ (idx >> np.uint64(29)))
                   * np.uint64(0xBF58476D1CE4E5B9)) & mask
            words = vocab[((idx >> np.uint64(40)).astype(np.int64)
                           & 0xFFFF)]
            ktext = [" ".join(row) for row in words]
            klen = np.full(n, salad_words * 6 - 1, np.int64)
        parts.append(pa.table({
            "doc_id": pa.array(ids * 1000 + k, pa.int64()),
            "text": pa.array(ktext),
            "lang": pa.array(cols["lang"]),
            "source": pa.array(cols["source"]),
            "n_chars": pa.array(klen, pa.int64())}))
    # small row groups: parquet parallelism is per ROW GROUP — one
    # default-sized group makes the scan+signature stage a single
    # task at any core count (measured: identical walls at 8 and 32
    # cores until this was split)
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out, "documents.parquet"),
                   row_group_size=2048)
    emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
    vid = emb["vec_id"].to_numpy(zero_copy_only=False)
    lab = emb["label"].to_numpy(zero_copy_only=False)
    mat = np.array(emb["embedding"].to_pylist(), np.float32)
    dim = mat.shape[1]
    vparts = []
    for k in range(scale_vec):
        noise = 1e-3 * (((k * 31 + np.arange(dim)) % 7) - 3)
        vparts.append(pa.table({
            "vec_id": pa.array(vid * 1000 + k, pa.int64()),
            "embedding": pa.array(
                (mat + noise.astype(np.float32)).tolist(),
                pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int32())}))
    pq.write_table(pa.concat_tables(vparts),
                   os.path.join(out, "embeddings.parquet"),
                   row_group_size=1024)
    return out


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
    ap.add_argument("--scale", type=int, default=40,
                    help="near-duplicate variants per doc (deterministic "
                    "inflation; 0 = run the raw sf input, which at "
                    "sf0.1 is overhead-bound and cannot show scaling)")
    ap.add_argument("--scale-vec", type=int, default=10,
                    help="perturbed variants per embedding (the exact "
                    "cosine stage is O(n^2) blocks — keep lower than "
                    "--scale)")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from tools.bench_scaling import run_calibration

    sf_in = (ensure_scaled_corpus(args.sf, args.scale, args.scale_vec)
             if args.scale else args.sf)
    calibration = run_calibration(args.small, args.large)
    small = run_one(args.small, sf_in, args.warm_sf, args.repeat)
    large = run_one(args.large, sf_in, args.warm_sf, args.repeat)
    t_s, t_l = min(small["walls"]), min(large["walls"])
    med_s = statistics.median(small["walls"])
    med_l = statistics.median(large["walls"])
    ratio = args.large / args.small
    # fixed input, so throughput ratio = wall ratio
    out = {
        "small_cores": args.small, "large_cores": args.large,
        "sf": args.sf, "scale": args.scale, "scale_vec": args.scale_vec,
        "input": sf_in,
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
