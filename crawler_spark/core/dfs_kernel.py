"""Sequential exact-DFS claiming kernel.

The reference's crawl order is sequential DFS preorder with the
URL-seen set claimed at schedule time
(/root/reference/lib/crawler/crawler-engine.ts:556,673-695) —
lexicographic-first claiming is P-complete, so this one step of the
engine is inherently a sequential sweep (everything expensive —
fetch, parse, canonicalize, admission — is distributed upstream; see
crawler_spark/engine/frontier.py).

Because it is the engine's only sequential constant, it must be as
small as possible: a scaling-efficiency measurement divides by it.
Two interchangeable implementations of the same sweep over the
int64-hash-encoded edge skeleton:

  * ``sweep_c`` — ~80 lines of dependency-free C99 (open-addressing
    hash tables + an explicit stack), compiled on first use with the
    system C compiler into a per-user cache and loaded via ctypes.
    ~50 ns/edge.
  * ``sweep_py`` — pure-Python explicit-stack DFS, same contract.
    ~1 µs/edge. Always available; the unit tests pin the two equal.

``sweep()`` picks the C kernel when a compiler is present and falls
back silently otherwise.

Inputs (all numpy, C-contiguous):
  c_sorted  int64[n_edges]  child url-hash, sorted by (parent, link)
  i_sorted  int32[n_edges]  link index, same order
  uniq_p    int64[m]        distinct parent hashes, ascending
  starts    int64[m+1]      CSR bounds: children of uniq_p[j] are
                            rows starts[j]..starts[j+1]
  seeds     int64[s]        seed url-hashes in seed-rank order
  max_depth int

Returns (n_claims, h, depth, parent_rank, li): parallel arrays in
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

typedef struct { int64_t key; int64_t val; } slot;   /* val<0 = empty */

static inline uint64_t mix(uint64_t x) {             /* splitmix64 finalizer */
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33; return x;
}

static slot *mk_table(int64_t cap) {
    slot *t = (slot *)malloc((size_t)cap * sizeof(slot));
    if (t) for (int64_t k = 0; k < cap; k++) t[k].val = -1;
    return t;
}

typedef struct { int64_t h; int64_t parent_rank; int32_t depth; int32_t li; } frame;

int64_t dfs_sweep(
    int64_t n_edges, const int64_t *c, const int32_t *li,
    int64_t m, const int64_t *uniq_p, const int64_t *starts,
    int64_t n_seeds, const int64_t *seeds, int32_t maxd,
    int64_t claim_cap, int64_t child_cap,          /* powers of two */
    int64_t *out_h, int32_t *out_depth, int64_t *out_parent_rank,
    int32_t *out_li)
{
    const uint64_t cmask = (uint64_t)claim_cap - 1;
    const uint64_t pmask = (uint64_t)child_cap - 1;
    slot *ct = mk_table(claim_cap);
    slot *pt = mk_table(child_cap);
    frame *st = (frame *)malloc((size_t)(n_edges + n_seeds + 1) * sizeof(frame));
    if (!ct || !pt || !st) { free(ct); free(pt); free(st); return -1; }

    for (int64_t j = 0; j < m; j++) {
        uint64_t s = mix((uint64_t)uniq_p[j]) & pmask;
        while (pt[s].val >= 0) s = (s + 1) & pmask;
        pt[s].key = uniq_p[j]; pt[s].val = j;
    }

    int64_t sp = 0, rank = 0;
    for (int64_t sidx = 0; sidx < n_seeds; sidx++) {
        frame f0 = {seeds[sidx], -1, 0, -1};
        st[sp++] = f0;
        while (sp > 0) {
            frame f = st[--sp];
            uint64_t s = mix((uint64_t)f.h) & cmask;
            int64_t found = -1;
            while (ct[s].val >= 0) {
                if (ct[s].key == f.h) { found = ct[s].val; break; }
                s = (s + 1) & cmask;
            }
            if (found >= 0) continue;
            ct[s].key = f.h; ct[s].val = rank;
            out_h[rank] = f.h; out_depth[rank] = f.depth;
            out_parent_rank[rank] = f.parent_rank; out_li[rank] = f.li;
            int64_t my_rank = rank++;
            if (f.depth >= maxd) continue;
            uint64_t q = mix((uint64_t)f.h) & pmask;
            int64_t pj = -1;
            while (pt[q].val >= 0) {
                if (pt[q].key == f.h) { pj = pt[q].val; break; }
                q = (q + 1) & pmask;
            }
            if (pj < 0) continue;
            for (int64_t k = starts[pj + 1] - 1; k >= starts[pj]; k--) {
                int64_t ch = c[k];
                uint64_t s2 = mix((uint64_t)ch) & cmask;
                int64_t f2 = -1;
                while (ct[s2].val >= 0) {
                    if (ct[s2].key == ch) { f2 = ct[s2].val; break; }
                    s2 = (s2 + 1) & cmask;
                }
                if (f2 >= 0) continue;       /* already claimed */
                frame nf = {ch, my_rank, f.depth + 1, li[k]};
                st[sp++] = nf;
            }
        }
    }
    free(ct); free(pt); free(st);
    return rank;
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
        lib.dfs_sweep.restype = ctypes.c_int64
        lib.dfs_sweep.argtypes = [
            ctypes.c_int64, i64p, i32p,
            ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, i64p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, i64p, i32p]
        _lib = lib
    except Exception:  # noqa: BLE001 — no cc / sandboxed: fall back
        _lib = None
    return _lib


def _pow2_at_least(n: int) -> int:
    return 1 << max(4, (int(n) - 1).bit_length())


def _claim_bound(c_sorted: np.ndarray, n_seeds: int) -> int:
    """Upper bound on claims. Cheap bound (edges+seeds) when small;
    exact distinct-child count (one numpy sort) when the cheap bound
    would oversize the hash table."""
    bound = len(c_sorted) + n_seeds
    if bound > 30_000_000:
        bound = int(np.unique(c_sorted).size) + n_seeds
    return bound


def sweep_c(c_sorted, i_sorted, uniq_p, starts, seeds, max_depth):
    lib = _load_lib()
    if lib is None:
        return None
    n_edges = len(c_sorted)
    n_seeds = len(seeds)
    out_n = _claim_bound(c_sorted, n_seeds)
    claim_cap = _pow2_at_least(2 * out_n)
    child_cap = _pow2_at_least(2 * max(len(uniq_p), 1))
    out_h = np.empty(out_n, np.int64)
    out_depth = np.empty(out_n, np.int32)
    out_parent = np.empty(out_n, np.int64)
    out_li = np.empty(out_n, np.int32)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    c_sorted = np.ascontiguousarray(c_sorted, np.int64)
    i_sorted = np.ascontiguousarray(i_sorted, np.int32)
    uniq_p = np.ascontiguousarray(uniq_p, np.int64)
    starts = np.ascontiguousarray(starts, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = lib.dfs_sweep(n_edges, p64(c_sorted), p32(i_sorted),
                      len(uniq_p), p64(uniq_p), p64(starts),
                      n_seeds, p64(seeds), max_depth,
                      claim_cap, child_cap,
                      p64(out_h), p32(out_depth), p64(out_parent),
                      p32(out_li))
    if n < 0:  # allocation failure inside the kernel
        return None
    return (int(n), out_h[:n], out_depth[:n], out_parent[:n], out_li[:n])


def sweep_py(c_sorted, i_sorted, uniq_p, starts, seeds, max_depth):
    """Pure-Python twin of sweep_c — identical contract, used as the
    fallback and as the oracle for the kernel-parity unit test."""
    c_l = np.asarray(c_sorted, np.int64).tolist()
    i_l = np.asarray(i_sorted, np.int64).tolist()
    bounds = np.asarray(starts, np.int64)
    child_idx = dict(zip(np.asarray(uniq_p, np.int64).tolist(),
                         zip(bounds[:-1].tolist(), bounds[1:].tolist())))
    claimed: dict[int, int] = {}
    out_h: list[int] = []
    out_depth: list[int] = []
    out_parent: list[int] = []
    out_li: list[int] = []
    stack: list[tuple] = []
    push = stack.append
    pop = stack.pop
    for sh in np.asarray(seeds, np.int64).tolist():
        push((sh, 0, -1, -1))
        while stack:
            h, depth, parent_rank, li = pop()
            if h in claimed:
                continue
            rank = len(out_h)
            claimed[h] = rank
            out_h.append(h)
            out_depth.append(depth)
            out_parent.append(parent_rank)
            out_li.append(li)
            if depth < max_depth:
                ci = child_idx.get(h)
                if ci is not None:
                    lo, hi = ci
                    d1 = depth + 1
                    for k in range(hi - 1, lo - 1, -1):
                        ch = c_l[k]
                        if ch not in claimed:
                            push((ch, d1, rank, i_l[k]))
    n = len(out_h)
    return (n, np.array(out_h, np.int64), np.array(out_depth, np.int32),
            np.array(out_parent, np.int64), np.array(out_li, np.int32))


def sweep(c_sorted, i_sorted, uniq_p, starts, seeds, max_depth):
    """C kernel when available, Python otherwise. Also returns which
    implementation ran (for timings/diagnostics)."""
    res = sweep_c(c_sorted, i_sorted, uniq_p, starts, seeds, max_depth)
    if res is not None:
        return res + ("c",)
    return sweep_py(c_sorted, i_sorted, uniq_p, starts, seeds,
                    max_depth) + ("py",)
