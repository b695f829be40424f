"""Sequential exact-DFS claiming kernel (dense-id variant).

The reference's crawl order is sequential DFS preorder with the
URL-seen set claimed at schedule time
(/root/reference/lib/crawler/crawler-engine.ts:556,673-695) —
lexicographic-first claiming is P-complete, so this one step of the
engine is inherently a sequential sweep (everything expensive —
fetch, parse, canonicalize, admission — is distributed upstream; see
crawler_spark/engine/frontier.py).

Because it is the engine's only sequential constant, it must be as
small as possible: a scaling-efficiency measurement divides by it.
Nodes are DENSE int32 ids (the engine dictionary-encodes url-hashes
against a Spark-sorted node table, then `np.searchsorted` maps the
edge arrays — all linear scans). Dense ids turn the sweep's two hash
tables into direct-indexed arrays: the random-access working set for
N nodes is ~4.125N bytes (a 4 B/node CSR index + a 1-bit/node claimed
bitmap, mostly L3-resident) instead of the ~64N-byte open-addressing
walk of the round-1 kernel, which was memory-bound at 3-25 s per 10M
edges. At >2^31 nodes the ids outgrow int32 — past
that scale the engine's implemented exact path is the distributed
fixpoint strategy (engine/frontier.py:resolve), not this kernel.

Two interchangeable implementations of the same sweep:

  * ``sweep_c`` — dependency-free C99, compiled on first use with the
    system C compiler into a content-addressed cache and loaded via
    ctypes. ~20 ns/edge.
  * ``sweep_py`` — pure-Python explicit-stack DFS, same contract.
    ~1 µs/edge. Always available; the unit tests pin the two equal.

``sweep()`` picks the C kernel when a compiler is present and falls
back silently otherwise.

Inputs (all numpy, C-contiguous):
  c_sorted  int32[n_edges]  child node-id, grouped by parent with each
                            parent's children in link order; -1 marks
                            a child outside the node table (dead edge
                            beyond the BFS depth cap — never claimable,
                            see frontier._resolve_skeleton)
  i_sorted  int32[n_edges]  link index, same order
  uniq_p    int32[m]        distinct parent ids (any order, no dups)
  starts    int64[m+1]      CSR bounds: children of uniq_p[j] are
                            rows starts[j]..starts[j+1]
  seeds     int32[s]        seed node-ids in seed-rank order
  n_nodes   int             id-space size
  max_depth int

Returns (n_claims, id, depth, parent_rank, li): parallel arrays in
exact visit order; parent_rank is the claiming parent's visit rank
(-1 for seeds).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct { int32_t id; int32_t depth; int64_t parent_rank; int32_t li; } frame;

#define CLAIM_GET(b, i) ((b[(int64_t)(i) >> 3] >> ((i) & 7)) & 1)
#define CLAIM_SET(b, i) (b[(int64_t)(i) >> 3] |= (uint8_t)(1u << ((i) & 7)))

/* Resumable sweep: claimed[] is CALLER-owned persistent claim state —
   a BITMAP of ceil(n_nodes/8) bytes (init to 0 once; survives across
   shard calls so seed-branch shards sweep against the claims of
   earlier shards). The sweep only ever needs claim MEMBERSHIP (ranks
   are assigned from the running counter and parent ranks always point
   into the same call's output), so 1 bit/node replaces the former
   4 B/node rank array — 32x less driver state at the 10^10-node
   posture, and denser = more cache-resident for the random probes.
   rank0 is the global rank of this call's first claim. Returns the
   number of claims made BY THIS CALL (outputs are call-local arrays;
   parent_rank is the GLOBAL rank). -2 on allocation failure.
   seed_counts (optional, NULL to skip): cumulative claim count after
   each seed's subtree — the per-seed segment boundaries the
   optimistic parallel-shard validator needs to accept a
   conflict-free seed prefix. */
int64_t dfs_sweep_dense_resume(
    int64_t n_edges, const int32_t *c, const int32_t *li,
    int64_t m, const int32_t *uniq_p, const int64_t *starts,
    int64_t n_seeds, const int32_t *seeds, int32_t maxd,
    int64_t n_nodes, uint8_t *claimed, int64_t rank0,
    int32_t *out_id, int32_t *out_depth, int64_t *out_parent_rank,
    int32_t *out_li, int64_t *seed_counts)
{
    /* csr_of[id] = row into uniq_p/starts or -1: shard-local, built
       per call from this call's (shard's) CSR */
    int32_t *csr_of = (int32_t *)malloc((size_t)n_nodes * 4);
    frame *st = (frame *)malloc((size_t)(n_edges + n_seeds + 1) * sizeof(frame));
    if (!csr_of || !st) { free(csr_of); free(st); return -2; }
    memset(csr_of, 0xff, (size_t)n_nodes * 4);
    for (int64_t j = 0; j < m; j++) csr_of[uniq_p[j]] = (int32_t)j;

    int64_t sp = 0, rank = rank0, n_out = 0;
    for (int64_t sidx = 0; sidx < n_seeds; sidx++) {
        frame f0 = {seeds[sidx], 0, -1, -1};
        st[sp++] = f0;
        while (sp > 0) {
            frame f = st[--sp];
            if (CLAIM_GET(claimed, f.id)) continue;    /* already claimed */
            CLAIM_SET(claimed, f.id);
            out_id[n_out] = f.id; out_depth[n_out] = f.depth;
            out_parent_rank[n_out] = f.parent_rank; out_li[n_out] = f.li;
            int64_t my_rank = rank++;
            n_out++;
            if (f.depth >= maxd) continue;
            int32_t pj = csr_of[f.id];
            if (pj < 0) continue;                      /* leaf */
            for (int64_t k = starts[pj + 1] - 1; k >= starts[pj]; k--) {
                int32_t ch = c[k];
                if (ch < 0) continue;                  /* dead edge */
                if (CLAIM_GET(claimed, ch)) continue;  /* already claimed */
                frame nf = {ch, f.depth + 1, my_rank, li[k]};
                st[sp++] = nf;
            }
        }
        if (seed_counts) seed_counts[sidx] = n_out;
    }
    free(csr_of); free(st);
    return n_out;
}

int64_t dfs_sweep_dense(
    int64_t n_edges, const int32_t *c, const int32_t *li,
    int64_t m, const int32_t *uniq_p, const int64_t *starts,
    int64_t n_seeds, const int32_t *seeds, int32_t maxd,
    int64_t n_nodes,
    int32_t *out_id, int32_t *out_depth, int64_t *out_parent_rank,
    int32_t *out_li)
{
    uint8_t *claimed = (uint8_t *)calloc((size_t)((n_nodes + 7) >> 3), 1);
    if (!claimed) return -1;
    int64_t n = dfs_sweep_dense_resume(
        n_edges, c, li, m, uniq_p, starts, n_seeds, seeds, maxd,
        n_nodes, claimed, 0, out_id, out_depth, out_parent_rank, out_li,
        (int64_t *)0);
    free(claimed);
    return n < 0 ? -1 : n;
}

/* Bulk-mark ids claimed in the bitmap — the parallel-shard
   validator's accept path (ids are a validated shard's claims; a
   numpy scatter can't OR into shared bytes without ufunc.at, which
   is an order of magnitude slower than this loop). */
void mark_claimed(int64_t n, const int32_t *ids, uint8_t *claimed)
{
    for (int64_t k = 0; k < n; k++) CLAIM_SET(claimed, ids[k]);
}

/* dictionary-encode int64 keys against a sorted table: out[k] = index
   of keys[k] in table, or -1 when absent. Called from Python threads
   over chunks — ctypes releases the GIL for the duration of the call,
   so the encode scales with cores (np.searchsorted holds the GIL). */
void encode_ids(int64_t n, const int64_t *keys, int64_t n_nodes,
                const int64_t *table, int32_t *out)
{
    for (int64_t k = 0; k < n; k++) {
        int64_t key = keys[k];
        int64_t lo = 0, hi = n_nodes;
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (table[mid] < key) lo = mid + 1; else hi = mid;
        }
        out[k] = (lo < n_nodes && table[lo] == key) ? (int32_t)lo : -1;
    }
}

/* CSR run-length boundaries over a parent-contiguous id column: one
   linear branch-predictable pass. Writes run-start offsets into
   starts[0..m-1], the run's parent id into uniq[0..m-1], returns m.
   (The numpy flatnonzero/fancy-index formulation of the same pass
   cost 4-17 s at 58M edges; this is ~0.1 s.) */
int64_t csr_bounds(int64_t n, const int32_t *p,
                   int32_t *uniq, int64_t *starts)
{
    int64_t m = 0;
    int32_t prev = 0;
    for (int64_t k = 0; k < n; k++) {
        int32_t v = p[k];
        if (k == 0 || v != prev) {
            uniq[m] = v;
            starts[m++] = k;
            prev = v;
        }
    }
    return m;
}

/* Emit the priority-vector hex strings for a claims batch in ONE
   forward pass: prio(claim) = prio(parent) ++ hex4(link_index).
   Rows arrive in visit order and a claim's parent is always an
   earlier row of the SAME batch (DFS parents lie on the path from
   the call's seeds), so the parent's bytes are complete before its
   children copy them — and recently-claimed parents are cache-warm.
   Seed rows (parent_rank < 0) take their 4-byte prio from seed_prio
   via seed_ord[row]. offsets[n+1] = cumsum of 4*(depth+1); data is
   caller-allocated at offsets[n] bytes. Replaces a numpy build whose
   padded (n x maxw) staging matrix and per-depth gathers touched
   ~6x the payload in fresh pages.

   Returns 0 on success, or 1 + the first row whose parent rank falls
   outside this batch (0 <= pr - rank0 < r is the same-batch-parent
   invariant the sweep guarantees; a violated invariant — corrupted
   claims batch, future resume bug — must fail loud, not read or
   write out of bounds). The two compares are always-false in a valid
   batch, so the hot path stays branch-predictable. */
int64_t emit_prios(int64_t n, const int64_t *parent_rank, const int32_t *li,
                   int64_t rank0, const uint8_t *seed_prio,
                   const int32_t *seed_ord, const int64_t *offsets,
                   uint8_t *data)
{
    static const char hexd[] = "0123456789abcdef";
    for (int64_t r = 0; r < n; r++) {
        uint8_t *dst = data + offsets[r];
        int64_t pr = parent_rank[r];
        if (pr < 0) {
            memcpy(dst, seed_prio + (int64_t)seed_ord[r] * 4, 4);
        } else {
            int64_t p = pr - rank0;
            if (p < 0 || p >= r) return r + 1;
            int64_t plen = offsets[p + 1] - offsets[p];
            memcpy(dst, data + offsets[p], (size_t)plen);
            uint32_t v = (uint32_t)li[r];
            dst += plen;
            dst[0] = hexd[(v >> 12) & 0xF];
            dst[1] = hexd[(v >> 8) & 0xF];
            dst[2] = hexd[(v >> 4) & 0xF];
            dst[3] = hexd[v & 0xF];
        }
    }
    return 0;
}
"""

_lib = None
_lib_tried = False


def _cache_dir() -> str:
    d = os.environ.get("SPARK_GRAFT_KERNEL_CACHE",
                       os.path.join(tempfile.gettempdir(),
                                    "crawler_spark_kernels"))
    os.makedirs(d, exist_ok=True)
    return d


def _load_lib():
    """Compile (once, content-addressed cache) and dlopen the kernel.
    Returns None when no working C toolchain exists."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    digest = hashlib.sha1(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"dfs_kernel_{digest}.so")
    try:
        if not os.path.exists(so_path):
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".c", delete=False) as f:
                f.write(_C_SRC)
                c_path = f.name
            try:
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o",
                     so_path + ".tmp", c_path],
                    check=True, capture_output=True, timeout=120)
                os.replace(so_path + ".tmp", so_path)
            finally:
                os.unlink(c_path)
        lib = ctypes.CDLL(so_path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.dfs_sweep_dense.restype = ctypes.c_int64
        lib.dfs_sweep_dense.argtypes = [
            ctypes.c_int64, i32p, i32p,
            ctypes.c_int64, i32p, i64p,
            ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int64,
            i32p, i32p, i64p, i32p]
        u8p_ = ctypes.POINTER(ctypes.c_uint8)
        lib.dfs_sweep_dense_resume.restype = ctypes.c_int64
        lib.dfs_sweep_dense_resume.argtypes = [
            ctypes.c_int64, i32p, i32p,
            ctypes.c_int64, i32p, i64p,
            ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int64, u8p_, ctypes.c_int64,
            i32p, i32p, i64p, i32p, i64p]
        lib.mark_claimed.restype = None
        lib.mark_claimed.argtypes = [ctypes.c_int64, i32p, u8p_]
        lib.encode_ids.restype = None
        lib.encode_ids.argtypes = [ctypes.c_int64, i64p,
                                   ctypes.c_int64, i64p, i32p]
        lib.csr_bounds.restype = ctypes.c_int64
        lib.csr_bounds.argtypes = [ctypes.c_int64, i32p, i32p, i64p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.emit_prios.restype = ctypes.c_int64
        lib.emit_prios.argtypes = [ctypes.c_int64, i64p, i32p,
                                   ctypes.c_int64, u8p, i32p, i64p, u8p]
        _lib = lib
    except Exception:  # noqa: BLE001 — no cc / sandboxed: fall back
        _lib = None
    return _lib


def sweep_c(c_sorted, i_sorted, uniq_p, starts, seeds, n_nodes, max_depth):
    lib = _load_lib()
    if lib is None:
        return None
    n_edges = len(c_sorted)
    n_seeds = len(seeds)
    out_n = int(n_nodes)  # claims ≤ nodes by construction
    out_id = np.empty(out_n, np.int32)
    out_depth = np.empty(out_n, np.int32)
    out_parent = np.empty(out_n, np.int64)
    out_li = np.empty(out_n, np.int32)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    c_sorted = np.ascontiguousarray(c_sorted, np.int32)
    i_sorted = np.ascontiguousarray(i_sorted, np.int32)
    uniq_p = np.ascontiguousarray(uniq_p, np.int32)
    starts = np.ascontiguousarray(starts, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int32)
    n = lib.dfs_sweep_dense(n_edges, p32(c_sorted), p32(i_sorted),
                            len(uniq_p), p32(uniq_p), p64(starts),
                            n_seeds, p32(seeds), max_depth,
                            int(n_nodes),
                            p32(out_id), p32(out_depth), p64(out_parent),
                            p32(out_li))
    if n < 0:  # allocation failure inside the kernel
        return None
    return (int(n), out_id[:n], out_depth[:n], out_parent[:n], out_li[:n])


def sweep_py(c_sorted, i_sorted, uniq_p, starts, seeds, n_nodes, max_depth):
    """Pure-Python twin of sweep_c — identical contract, used as the
    fallback and as the oracle for the kernel-parity unit test."""
    c_l = np.asarray(c_sorted, np.int64).tolist()
    i_l = np.asarray(i_sorted, np.int64).tolist()
    bounds = np.asarray(starts, np.int64)
    child_idx = dict(zip(np.asarray(uniq_p, np.int64).tolist(),
                         zip(bounds[:-1].tolist(), bounds[1:].tolist())))
    claimed: dict[int, int] = {}
    out_id: list[int] = []
    out_depth: list[int] = []
    out_parent: list[int] = []
    out_li: list[int] = []
    stack: list[tuple] = []
    push = stack.append
    pop = stack.pop
    for sh in np.asarray(seeds, np.int64).tolist():
        push((sh, 0, -1, -1))
        while stack:
            nid, depth, parent_rank, li = pop()
            if nid in claimed:
                continue
            rank = len(out_id)
            claimed[nid] = rank
            out_id.append(nid)
            out_depth.append(depth)
            out_parent.append(parent_rank)
            out_li.append(li)
            if depth < max_depth:
                ci = child_idx.get(nid)
                if ci is not None:
                    lo, hi = ci
                    d1 = depth + 1
                    for k in range(hi - 1, lo - 1, -1):
                        ch = c_l[k]
                        if ch >= 0 and ch not in claimed:
                            push((ch, d1, rank, i_l[k]))
    n = len(out_id)
    return (n, np.array(out_id, np.int32), np.array(out_depth, np.int32),
            np.array(out_parent, np.int64), np.array(out_li, np.int32))


def encode_ids(keys, table, n_threads: int = 16):
    """Vectorized dictionary-encode: positions of int64 `keys` in the
    sorted int64 `table`, -1 for misses. C kernel + thread-chunked
    (ctypes drops the GIL per call) when a toolchain exists;
    np.searchsorted fallback otherwise. Contract pinned against the
    numpy path in tests. (The engine's skeleton encode moved into
    distributed Spark joins — engine/frontier.py:_resolve_skeleton —
    this stays as the driver-side utility for ad-hoc kernels.)"""
    keys = np.ascontiguousarray(keys, np.int64)
    table = np.ascontiguousarray(table, np.int64)
    n, n_nodes = len(keys), len(table)
    out = np.empty(n, np.int32)
    if n == 0:
        return out
    if n_nodes == 0:
        out.fill(-1)
        return out
    lib = _load_lib()
    if lib is None:
        pos = np.minimum(np.searchsorted(table, keys), n_nodes - 1)
        return np.where(table[pos] == keys, pos, -1).astype(np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def enc(lo, hi):
        lib.encode_ids(
            hi - lo,
            keys[lo:hi].ctypes.data_as(i64p),
            n_nodes, table.ctypes.data_as(i64p),
            out[lo:hi].ctypes.data_as(i32p))

    chunk = max(1 << 18, n // (n_threads * 4) + 1)
    spans = [(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]
    if len(spans) == 1:
        enc(*spans[0])
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(n_threads, len(spans))) as ex:
            list(ex.map(lambda s: enc(*s), spans))
    return out


def csr_runlength(p):
    """Run-length CSR boundaries over a parent-contiguous int32 id
    column: (uniq_p int32[m], bounds int64[m+1]) with bounds[j]..
    bounds[j+1] spanning parent uniq_p[j]'s rows. C single-pass when a
    toolchain exists (the numpy formulation cost 4-17 s at 58M edges),
    vectorized numpy fallback otherwise; both pinned equal in tests."""
    p = np.ascontiguousarray(p, np.int32)
    n = len(p)
    if n == 0:
        return np.empty(0, np.int32), np.zeros(1, np.int64)
    lib = _load_lib()
    if lib is None:
        brk = np.flatnonzero(p[1:] != p[:-1]) + 1
        starts = np.concatenate(([0], brk))
        return (np.ascontiguousarray(p[starts], np.int32),
                np.append(starts, n).astype(np.int64))
    uniq = np.empty(n, np.int32)
    starts = np.empty(n + 1, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    m = lib.csr_bounds(n, p.ctypes.data_as(i32p),
                       uniq.ctypes.data_as(i32p),
                       starts.ctypes.data_as(i64p))
    starts[m] = n
    return uniq[:m].copy(), starts[:m + 1].copy()


def claimed_mask(bits, ids):
    """Vectorized claim-membership test against a claimed bitmap:
    returns uint8[len(ids)] with 1 where ids[k] is set in `bits`."""
    ids = np.asarray(ids)
    return (bits[ids >> 3] >> (ids & 7).astype(np.uint8)) & 1


def mark_claimed(bits, ids):
    """Bulk-set ids in the claimed bitmap in place. C loop when a
    toolchain exists; np.bitwise_or.at fallback (a plain fancy-index
    OR would silently drop ids sharing a byte)."""
    ids = np.ascontiguousarray(ids, np.int32)
    if not len(ids):
        return
    lib = _load_lib()
    if lib is not None:
        lib.mark_claimed(
            len(ids),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    else:
        np.bitwise_or.at(
            bits, ids >> 3,
            (np.uint8(1) << (ids & 7).astype(np.uint8)))


_HEX_W = 4  # hex digits per priority-vector level (file format)


def emit_prios(depth, parent_rank, li, rank0, seed_prio, seed_ord):
    """Build the claims batch's priority-vector byte blob in visit
    order: (offsets int64[n+1], data uint8[total]) where row r's prio
    is data[offsets[r]:offsets[r+1]] — prio(parent) ++ hex4(li), and
    seed rows (parent_rank < 0) copy seed_prio[seed_ord[r]*4:][:4].

    One forward C pass when a toolchain exists (parents precede
    children within a sweep call, so the prefix copy reads
    just-written, cache-warm bytes); a per-depth vectorized numpy
    twin otherwise — the twin stages rows in a padded (n x maxw)
    matrix, which at millions of claims touches ~6x the payload in
    fresh pages and measured 20-50 s next to a full JVM heap, which
    is why the C pass exists. Both pinned equal in tests."""
    n = len(depth)
    depth64 = np.asarray(depth, np.int64)
    parent_rank = np.ascontiguousarray(parent_rank, np.int64)
    li32 = np.ascontiguousarray(li, np.int32)
    seed_ord = np.ascontiguousarray(seed_ord, np.int32)
    seed_prio = np.ascontiguousarray(seed_prio, np.uint8)
    lens = _HEX_W * (depth64 + 1)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.empty(int(offsets[-1]), np.uint8)
    if n == 0:
        return offsets, data
    lib = _load_lib()
    if lib is not None:
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        rc = lib.emit_prios(n, parent_rank.ctypes.data_as(i64p),
                            li32.ctypes.data_as(i32p),
                            ctypes.c_int64(rank0),
                            seed_prio.ctypes.data_as(u8p),
                            seed_ord.ctypes.data_as(i32p),
                            offsets.ctypes.data_as(i64p),
                            data.ctypes.data_as(u8p))
        if rc != 0:
            raise ValueError(
                f"emit_prios: claim row {rc - 1} has parent rank "
                f"{int(parent_rank[rc - 1])} outside its batch "
                f"(rank0={rank0}) — corrupted claims batch")
        return offsets, data
    # numpy twin: same guard (the clamp below would otherwise turn a
    # violated same-batch-parent invariant into silently wrong prios)
    bad = np.flatnonzero((parent_rank >= 0)
                         & ((parent_rank - rank0 < 0)
                            | (parent_rank - rank0
                               >= np.arange(n, dtype=np.int64))))
    if len(bad):
        r = int(bad[0])
        raise ValueError(
            f"emit_prios: claim row {r} has parent rank "
            f"{int(parent_rank[r])} outside its batch "
            f"(rank0={rank0}) — corrupted claims batch")
    local_pr = np.maximum(parent_rank - rank0, 0)
    max_d = int(depth64.max())
    W = _HEX_W * (max_d + 1)
    buf = np.zeros((n, W), np.uint8)
    hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
    li64 = li32.astype(np.int64)
    comp = np.empty((n, _HEX_W), np.uint8)
    for k in range(_HEX_W):
        comp[:, k] = hexd[(li64 >> (4 * (_HEX_W - 1 - k))) & 0xF]
    srows = np.flatnonzero(parent_rank < 0)
    buf[srows, :_HEX_W] = seed_prio.reshape(-1, _HEX_W)[seed_ord[srows]]
    for d in range(1, max_d + 1):
        rows = np.flatnonzero(depth64 == d)
        if not len(rows):
            continue
        w_par = _HEX_W * d
        buf[rows, :w_par] = buf[local_pr[rows], :w_par]
        buf[rows, w_par:w_par + _HEX_W] = comp[rows]
    for d in range(0, max_d + 1):
        rows = np.flatnonzero(depth64 == d)
        if not len(rows):
            continue
        w = _HEX_W * (d + 1)
        data[offsets[rows][:, None] + np.arange(w)[None, :]] = buf[rows, :w]
    return offsets, data


def sweep(c_sorted, i_sorted, uniq_p, starts, seeds, n_nodes, max_depth):
    """C kernel when available, Python otherwise. Also returns which
    implementation ran (for timings/diagnostics)."""
    res = sweep_c(c_sorted, i_sorted, uniq_p, starts, seeds, n_nodes,
                  max_depth)
    if res is not None:
        return res + ("c",)
    return sweep_py(c_sorted, i_sorted, uniq_p, starts, seeds, n_nodes,
                    max_depth) + ("py",)


class SweepState:
    """Persistent claim state for seed-branch-sharded sweeps: shards
    arrive in seed-rank order, each sweep claims against everything
    earlier shards claimed (DFS claims under seed rank r never depend
    on later seeds, so per-shard sweeps with shared state reproduce
    the global sweep exactly). State is 1 BIT/node (a claimed bitmap —
    the sweep only consumes claim membership, never a stored rank, so
    the former 4 B/node rank array was 32x oversized: at the
    10^10-node posture the bitmap is ~1.25 GB of driver RAM and
    nothing else node-indexed survives on the driver). The per-shard
    EDGE arrays — the memory hog at web scale — are bounded by the
    largest shard, not the web. Picks the C kernel or the pure-Python
    twin once per process (mixing them would be fine semantically —
    both implement the same contract — but keeping one makes `impl`
    reporting truthful)."""

    def __init__(self, n_nodes: int, claimed=None, rank: int = 0):
        """`claimed`/`rank` (optional): ADOPT an existing claim state
        instead of starting empty — the parallel-shard validator owns
        one shared claimed bitmap and hands it to a fresh state for
        each conflict re-sweep (C kernel only: the py fallback keeps
        claims in a dict, which an external bitmap can't seed
        cheaply)."""
        self.n_nodes = int(n_nodes)
        self.rank = int(rank)
        self._lib = _load_lib()
        if self._lib is not None:
            self.impl = "c"
            if claimed is not None:
                assert (claimed.dtype == np.uint8
                        and claimed.flags["C_CONTIGUOUS"]
                        and len(claimed) == (self.n_nodes + 7) // 8)
                self.claimed_bits = claimed
            else:
                self.claimed_bits = np.zeros((self.n_nodes + 7) // 8,
                                             np.uint8)
        else:
            self.impl = "py"
            if claimed is not None:
                raise ValueError(
                    "SweepState claim-state adoption requires the C kernel")
            self.claimed: dict[int, int] = {}

    def _sweep_shard_c(self, c_sorted, i_sorted, uniq_p, starts, seeds,
                       max_depth, seed_counts=None):
        lib = self._lib
        n_edges = len(c_sorted)
        out_n = self.n_nodes - self.rank  # claims left ≤ unclaimed nodes
        out_id = np.empty(out_n, np.int32)
        out_depth = np.empty(out_n, np.int32)
        out_parent = np.empty(out_n, np.int64)
        out_li = np.empty(out_n, np.int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)

        def p64(a):
            return a.ctypes.data_as(i64p)

        def p32(a):
            return a.ctypes.data_as(i32p)

        c_sorted = np.ascontiguousarray(c_sorted, np.int32)
        i_sorted = np.ascontiguousarray(i_sorted, np.int32)
        uniq_p = np.ascontiguousarray(uniq_p, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        seeds = np.ascontiguousarray(seeds, np.int32)
        n = lib.dfs_sweep_dense_resume(
            n_edges, p32(c_sorted), p32(i_sorted),
            len(uniq_p), p32(uniq_p), p64(starts),
            len(seeds), p32(seeds), max_depth,
            self.n_nodes,
            self.claimed_bits.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            self.rank,
            p32(out_id), p32(out_depth), p64(out_parent), p32(out_li),
            None if seed_counts is None else p64(seed_counts))
        if n < 0:
            raise MemoryError("dfs_sweep_dense_resume allocation failure")
        self.rank += int(n)
        return (int(n), out_id[:n], out_depth[:n], out_parent[:n],
                out_li[:n])

    def _sweep_shard_py(self, c_sorted, i_sorted, uniq_p, starts, seeds,
                        max_depth, seed_counts=None):
        c_l = np.asarray(c_sorted, np.int64).tolist()
        i_l = np.asarray(i_sorted, np.int64).tolist()
        bounds = np.asarray(starts, np.int64)
        child_idx = dict(zip(np.asarray(uniq_p, np.int64).tolist(),
                             zip(bounds[:-1].tolist(), bounds[1:].tolist())))
        claimed = self.claimed
        out_id: list[int] = []
        out_depth: list[int] = []
        out_parent: list[int] = []
        out_li: list[int] = []
        stack: list[tuple] = []
        push = stack.append
        pop = stack.pop
        rank0 = self.rank
        for sidx, sh in enumerate(np.asarray(seeds, np.int64).tolist()):
            push((sh, 0, -1, -1))
            while stack:
                nid, depth, parent_rank, li = pop()
                if nid in claimed:
                    continue
                rank = rank0 + len(out_id)
                claimed[nid] = rank
                out_id.append(nid)
                out_depth.append(depth)
                out_parent.append(parent_rank)
                out_li.append(li)
                if depth < max_depth:
                    ci = child_idx.get(nid)
                    if ci is not None:
                        lo, hi = ci
                        d1 = depth + 1
                        for k in range(hi - 1, lo - 1, -1):
                            ch = c_l[k]
                            if ch >= 0 and ch not in claimed:
                                push((ch, d1, rank, i_l[k]))
            if seed_counts is not None:
                seed_counts[sidx] = len(out_id)
        n = len(out_id)
        self.rank = rank0 + n
        return (n, np.array(out_id, np.int32),
                np.array(out_depth, np.int32),
                np.array(out_parent, np.int64),
                np.array(out_li, np.int32))

    def sweep_shard(self, c_sorted, i_sorted, uniq_p, starts, seeds,
                    max_depth, seed_counts=None):
        """One shard's sweep. Returns (n, id, depth, parent_rank, li)
        — call-local arrays, GLOBAL parent ranks. `seed_counts`
        (optional int64[n_seeds], filled in place): cumulative claim
        count after each seed's subtree — the per-seed segment
        boundaries the parallel-shard prefix validator consumes. Must
        be C-contiguous int64 (filled through its buffer)."""
        if seed_counts is not None:
            assert (seed_counts.dtype == np.int64
                    and seed_counts.flags["C_CONTIGUOUS"]
                    and len(seed_counts) >= len(seeds))
        if self.impl == "c":
            return self._sweep_shard_c(c_sorted, i_sorted, uniq_p, starts,
                                       seeds, max_depth, seed_counts)
        return self._sweep_shard_py(c_sorted, i_sorted, uniq_p, starts,
                                    seeds, max_depth, seed_counts)
