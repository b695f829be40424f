"""Regenerate the golden-parquet oracles for the five queries whose
semantics DuckDB SQL cannot express (hash-seeded sketches, exact DFS
crawl order, IVF clustering). NO SPARK IMPORTS — every value comes
from the independent pure-Python oracles (crawler_spark.oracle.*,
numpy for the IVF BLAS twin), the same generators the pytest golden
suite trusts. `oracle_sql()` then serves each table back to the
driver via DuckDB `read_parquet`, the pattern `image_thumbnail`
already uses for its precomputed luma.

Inputs are the driver's fixed seed-42 tables (`TESTDATA.md`: sf0.01,
read-only) and the committed t-smoke fixture — both immutable, so the
goldens are stable.

Arrow schemas are pinned to the Spark queries' exact output types
(verified by tools/check_oracle.py) so the driver's type-aware value
hash matches.

Usage: python tools/gen_golden_oracles.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_spark.core.xxhash64 import spark_xxhash64_str
from crawler_spark.oracle import text_oracle as to

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "oracle")


def _docs(sf: str):
    t = pq.read_table(os.path.join(sf, "documents.parquet"),
                      columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


def gen_winnow(sf: str) -> pa.Table:
    ids, ns = [], []
    for doc_id, text in _docs(sf):
        ids.append(doc_id)
        ns.append(len(to.winnow(text, k=5, window=8)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "n_fingerprints": pa.array(ns, pa.int64())})


def gen_simhash_pairs(sf: str, max_hamming: int = 3) -> pa.Table:
    """All pairs with hamming ≤ 3 — equal to the Spark 16-bit-band
    candidate set by pigeonhole (4 bands, ≤3 differing bits must leave
    one band intact). Docs with zero tokens have no simhash row."""
    sigs = []
    for doc_id, text in _docs(sf):
        if not to.tokens(text, distinct=True):
            continue
        sigs.append((doc_id, to.simhash(text) & 0xFFFFFFFFFFFFFFFF))
    sigs.sort()
    ia, ib, hm = [], [], []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i][1] ^ sigs[j][1]).count("1")
            if h <= max_hamming:
                ia.append(sigs[i][0])
                ib.append(sigs[j][0])
                hm.append(h)
    return pa.table({"id_a": pa.array(ia, pa.int64()),
                     "id_b": pa.array(ib, pa.int64()),
                     "hamming": pa.array(hm, pa.int32())})


def gen_minhash_lsh(sf: str, threshold: float = 0.5, num_hashes: int = 64,
                    bands: int = 16) -> pa.Table:
    """Banded MinHash-LSH candidates (16 bands × 4 rows), verified by
    the signature Jaccard estimate — the exact operator recipe of
    operators/dedup.py:minhash_lsh_pairs, driven by the shared
    bit-exact pure-Python xxhash64."""
    rows = num_hashes // bands
    sigs = {}
    for doc_id, text in _docs(sf):
        if not to.ngrams(text, 3):
            continue
        sigs[doc_id] = to.minhash_signature(text, num_hashes, 3)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            digest = to.band_digest(sig[b * rows:(b + 1) * rows])
            buckets.setdefault((b, digest), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    ia, ib, est = [], [], []
    for a, b in sorted(cand):
        eq = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        e = eq / num_hashes
        if e >= threshold:
            ia.append(a)
            ib.append(b)
            est.append(e)  # k/64 is exact in ≤6 decimals: round6 == id
    return pa.table({"id_a": pa.array(ia, pa.int64()),
                     "id_b": pa.array(ib, pa.int64()),
                     "est_jaccard": pa.array(est, pa.float64())})


# ---------------- IVF ANN (numpy twin of operators/similarity.py) ----------

def _embeddings(sf: str):
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float64)
            for v in t.column("embedding").to_pylist()]
    return ids, vecs


def _assign(q: np.ndarray, cm: np.ndarray, nprobe: int) -> np.ndarray:
    # mirrors similarity._assign_clusters: row-normalize, BLAS matmul,
    # stable argsort — same numpy calls, same machine, same results
    qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
    sims = qn @ cm.T
    return np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _seq_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


def gen_ivf_ann(sf: str, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
                iters: int = 2) -> pa.Table:
    ids, vecs = _embeddings(sf)
    q = np.stack(vecs)
    # seed centroids: smallest xxhash64(str(vec_id)) — no RNG
    order = sorted(range(len(ids)),
                   key=lambda i: spark_xxhash64_str(str(ids[i])))
    cm = np.stack([vecs[i] for i in order[:n_centroids]])
    cm = cm / np.sqrt((cm * cm).sum(axis=1, keepdims=True))
    for _ in range(iters):
        assigned = _assign(q, cm, 1)[:, 0]
        # order-independent integer-exact means (2^-30 quantization),
        # the same math as similarity.ivf_centroids
        for c in range(n_centroids):
            members = [vecs[i] for i in range(len(ids)) if assigned[i] == c]
            if not members:
                continue
            cnt = len(members)
            mean = np.asarray([
                sum(math.floor(v[d] * 1073741824.0) for v in members)
                / (cnt * 1073741824.0)
                for d in range(q.shape[1])])
            n = np.sqrt((mean * mean).sum())
            if n > 0:
                cm[c] = mean / n
    corpus_cluster = _assign(q, cm, 1)[:, 0]
    probe_clusters = _assign(q, cm, nprobe)
    lists: dict[int, list[int]] = {}
    for i, c in enumerate(corpus_cluster):
        lists.setdefault(int(c), []).append(i)
    norms = [_seq_norm(v) for v in vecs]
    qid_o, nid_o, rank_o, cos_o = [], [], [], []
    for i in range(len(ids)):
        cands = []
        for c in probe_clusters[i]:
            for j in lists.get(int(c), []):
                if j == i:
                    continue
                cos = _seq_dot(vecs[i], vecs[j]) / (norms[i] * norms[j])
                cands.append((math.floor(cos * 10000 + 0.5), ids[j]))
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (e4, nid) in enumerate(cands[:k], start=1):
            qid_o.append(ids[i])
            nid_o.append(nid)
            rank_o.append(rank)
            cos_o.append(e4)
    return pa.table({"qid": pa.array(qid_o, pa.int64()),
                     "nid": pa.array(nid_o, pa.int64()),
                     "rank": pa.array(rank_o, pa.int64()),
                     "cos_e4": pa.array(cos_o, pa.int64())})


def gen_image_phash_dedup(max_hamming: int = 10) -> pa.Table:
    """Union-find connected components over all phash pairs with
    hamming ≤ max_hamming (the banded candidate join's recall is
    EXACT for ≤ n_bands-1 = 15, so the pair set is identical), over
    the committed t-smoke image fixture's generation-time phash."""
    t = pq.read_table(os.path.join(REPO, "fixtures", "t-smoke",
                                   "images.parquet"),
                      columns=["image_id", "phash"])
    ids = t.column("image_id").to_pylist()
    ph = [p & 0xFFFFFFFFFFFFFFFF for p in t.column("phash").to_pylist()]
    parent = list(range(len(ids)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(ph[i] ^ ph[j]).count("1") <= max_hamming:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    n_clusters = len({find(i) for i in range(len(ids))})
    return pa.table({
        "n_images": pa.array([len(ids)], pa.int64()),
        "n_clusters": pa.array([n_clusters], pa.int64()),
        "n_dups": pa.array([len(ids) - n_clusters], pa.int64())})


def gen_session_pacing(sf: str) -> pa.Table:
    """P2+P3 fused driver query twin: actions derived from events
    exactly as __spark_entry__.q_session_pacing derives them
    (session u<user_id>, action_index event_id, signup → a `type`
    action over its props json), paced and identity-assigned by the
    pure-Python xxhash64 replicas (crawler_spark/oracle/
    pacing_oracle.py — Spark↔twin bit-parity pinned in
    tests/test_pacing_parity.py)."""
    from crawler_spark.oracle.pacing_oracle import (USER_AGENTS,
                                                    session_pacing_rows)

    t = pq.read_table(os.path.join(sf, "events.parquet"),
                      columns=["event_id", "user_id", "event_type",
                               "props"])
    actions = []
    for eid, uid, typ, props in zip(t.column("event_id").to_pylist(),
                                    t.column("user_id").to_pylist(),
                                    t.column("event_type").to_pylist(),
                                    t.column("props").to_pylist()):
        actions.append((f"u{uid}", int(eid),
                        "type" if typ == "signup" else typ,
                        props if typ == "signup" else None))
    rows = session_pacing_rows(actions, USER_AGENTS)
    rows.sort(key=lambda r: (r["session_id"], r["action_index"]))
    return pa.table({
        "session_id": pa.array([r["session_id"] for r in rows],
                               pa.string()),
        "action_index": pa.array([r["action_index"] for r in rows],
                                 pa.int64()),
        "delay_ms": pa.array([r["delay_ms"] for r in rows], pa.int64()),
        "type_ms": pa.array([r["type_ms"] for r in rows], pa.int64()),
        "start_offset_ms": pa.array([r["start_offset_ms"] for r in rows],
                                    pa.int64()),
        "user_agent": pa.array([r["user_agent"] for r in rows],
                               pa.string()),
        "viewport_w": pa.array([r["viewport_w"] for r in rows],
                               pa.int64()),
        "viewport_h": pa.array([r["viewport_h"] for r in rows],
                               pa.int64()),
    })


def gen_frontier_crawl() -> pa.Table:
    """Sequential reference-simulator crawl of the t-smoke fixture at
    the contract config (max_depth=3, rate_limit=100, 60 s batch
    window) — the same goldens tests/test_crawl_golden.py pins."""
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.oracle.simulator import run_oracle

    res = run_oracle(os.path.join(REPO, "fixtures", "t-smoke"),
                     CrawlConfig(max_depth=3, rate_limit=100,
                                 batch_window_ms=60_000))
    return pa.table({
        "visit_rank": pa.array([v.rank for v in res.visits], pa.int64()),
        "url": pa.array([v.url for v in res.visits], pa.string()),
        "depth": pa.array([v.depth for v in res.visits], pa.int32()),
        "status_code": pa.array([v.status_code for v in res.visits],
                                pa.int32()),
        "batch_id": pa.array([v.batch_id for v in res.visits], pa.int64()),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    for name, tbl in [
        ("winnow", gen_winnow(args.sf)),
        ("simhash_pairs", gen_simhash_pairs(args.sf)),
        ("minhash_lsh", gen_minhash_lsh(args.sf)),
        ("ivf_ann", gen_ivf_ann(args.sf)),
        ("session_pacing", gen_session_pacing(args.sf)),
        ("image_phash_dedup", gen_image_phash_dedup()),
        ("frontier_crawl", gen_frontier_crawl()),
    ]:
        path = os.path.join(OUT, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}  rows={tbl.num_rows}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
