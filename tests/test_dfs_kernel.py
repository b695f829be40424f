"""Parity of the C DFS-claiming kernel with its pure-Python twin.

The sweep is the engine's one sequential step (exact-order contract;
see crawler_spark/core/dfs_kernel.py) — these tests pin the compiled
kernel to the Python reference on randomized graphs so the fast path
can never drift. Dense-id contract: nodes are 0..n_nodes-1, dead
edges carry child id -1. No Spark involved.
"""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.core.dfs_kernel import sweep_c, sweep_py


def _random_skeleton(rng, n_nodes, n_edges, n_seeds, dead_frac=0.1):
    """Random (parent, link_index, child) skeleton in CSR form over
    dense ids 0..n_nodes-1; dead_frac of edges point outside the node
    table (child id -1)."""
    p = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    c = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    c[rng.random(n_edges) < dead_frac] = -1
    i = rng.integers(0, 50, n_edges).astype(np.int32)
    order = np.lexsort((i, p))
    p, i, c = p[order], i[order], c[order]
    uniq_p, starts = np.unique(p, return_index=True)
    bounds = np.append(starts, len(p)).astype(np.int64)
    seeds = rng.integers(0, n_nodes, n_seeds).astype(np.int32)
    return c, i, uniq_p, bounds, seeds, n_nodes


def _assert_same(res_a, res_b):
    na, ha, da, pa_, la = res_a
    nb, hb, db, pb, lb = res_b
    assert na == nb
    np.testing.assert_array_equal(ha, hb)
    np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(pa_, pb)
    np.testing.assert_array_equal(la, lb)


@pytest.fixture(scope="module")
def c_available():
    c, i, up, b, s, nn = _random_skeleton(
        np.random.default_rng(0), 10, 20, 2)
    if sweep_c(c, i, up, b, s, nn, 3) is None:
        pytest.skip("no C toolchain in this environment")


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_c_matches_python_random(c_available, seed):
    rng = np.random.default_rng(seed)
    c, i, up, b, s, nn = _random_skeleton(
        rng, n_nodes=400, n_edges=3000, n_seeds=5)
    for maxd in (0, 1, 3, 8):
        _assert_same(sweep_c(c, i, up, b, s, nn, maxd),
                     sweep_py(c, i, up, b, s, nn, maxd))


def test_c_matches_python_dense(c_available):
    # dense graph: heavy already-claimed skipping + duplicate edges
    rng = np.random.default_rng(99)
    c, i, up, b, s, nn = _random_skeleton(
        rng, n_nodes=50, n_edges=5000, n_seeds=50)
    _assert_same(sweep_c(c, i, up, b, s, nn, 6),
                 sweep_py(c, i, up, b, s, nn, 6))


def test_python_semantics_tiny():
    # hand-checked DFS preorder with claim-at-pop: seed 1 visits
    # 1 → 2 (li 0) → 3 (li 0, via 2) → 4; 3 NOT re-claimed via
    # 1's li=1 edge; second seed 2 already claimed.
    #   1 -(0)-> 2, 1 -(1)-> 3, 2 -(0)-> 3, 3 -(0)-> 4
    p = np.array([1, 1, 2, 3], np.int32)
    i = np.array([0, 1, 0, 0], np.int32)
    c = np.array([2, 3, 3, 4], np.int32)
    order = np.lexsort((i, p))
    uniq_p, starts = np.unique(p[order], return_index=True)
    bounds = np.append(starts, len(p)).astype(np.int64)
    n, h, d, pr, li = sweep_py(c[order], i[order], uniq_p, bounds,
                               np.array([1, 2], np.int32), 5, 8)
    assert h.tolist() == [1, 2, 3, 4]
    assert d.tolist() == [0, 1, 2, 3]
    assert pr.tolist() == [-1, 0, 1, 2]
    assert li.tolist() == [-1, 0, 0, 0]


def test_depth_cap_claims_but_does_not_expand():
    # at max_depth the node is claimed but its children are not pushed
    p = np.array([1, 2], np.int32)
    i = np.array([0, 0], np.int32)
    c = np.array([2, 3], np.int32)
    uniq_p, starts = np.unique(p, return_index=True)
    bounds = np.append(starts, len(p)).astype(np.int64)
    n, h, d, pr, li = sweep_py(c, i, uniq_p, bounds,
                               np.array([1], np.int32), 4, 1)
    assert h.tolist() == [1, 2]  # 3 is beyond the depth cap


def test_encode_ids_matches_searchsorted():
    rng = np.random.default_rng(7)
    table = np.unique(rng.integers(-(2**62), 2**62, 5000, dtype=np.int64))
    keys = np.concatenate([
        rng.choice(table, 200_000),                      # hits
        rng.integers(-(2**62), 2**62, 200_000, dtype=np.int64),  # mostly miss
        table[:1], table[-1:],                            # boundaries
    ])
    from crawler_spark.core.dfs_kernel import encode_ids
    got = encode_ids(keys, table)
    pos = np.minimum(np.searchsorted(table, keys), len(table) - 1)
    exp = np.where(table[pos] == keys, pos, -1).astype(np.int32)
    np.testing.assert_array_equal(got, exp)
    assert encode_ids(keys[:0], table).shape == (0,)
    assert (encode_ids(keys[:5], table[:0]) == -1).all()


def test_dead_edges_skipped():
    # id -1 children (outside the node table) are never claimed
    p = np.array([0, 0], np.int32)
    i = np.array([0, 1], np.int32)
    c = np.array([-1, 1], np.int32)
    uniq_p = np.array([0], np.int32)
    bounds = np.array([0, 2], np.int64)
    n, h, d, pr, li = sweep_py(c, i, uniq_p, bounds,
                               np.array([0], np.int32), 2, 8)
    assert h.tolist() == [0, 1]
    assert li.tolist() == [-1, 1]


def test_csr_runlength_matches_numpy():
    import numpy as np

    from crawler_spark.core.dfs_kernel import _load_lib, csr_runlength

    rng = np.random.default_rng(7)
    # parent-contiguous column with variable run lengths, incl. runs
    # of 1 and a repeat of an earlier id later (distinct runs)
    p = np.repeat(rng.integers(0, 500, 200).astype(np.int32),
                  rng.integers(1, 9, 200))
    uniq, bounds = csr_runlength(p)
    brk = np.flatnonzero(p[1:] != p[:-1]) + 1
    starts = np.concatenate(([0], brk))
    assert (uniq == p[starts]).all()
    assert (bounds == np.append(starts, len(p))).all()
    assert bounds.dtype == np.int64 and uniq.dtype == np.int32
    # reconstruction: every run spans a constant id
    for j in range(len(uniq)):
        assert (p[bounds[j]:bounds[j + 1]] == uniq[j]).all()
    # empty input
    u0, b0 = csr_runlength(np.empty(0, np.int32))
    assert len(u0) == 0 and list(b0) == [0]
    # the C path must actually be exercised in this environment
    assert _load_lib() is not None


@pytest.mark.parametrize("seed,n_chunks", [(11, 2), (12, 3), (13, 7)])
def test_resume_sweep_matches_one_shot(seed, n_chunks):
    """SweepState (seed-branch-sharded sweeps with claim state carried
    across calls) concatenates to exactly the one-shot sweep — for
    both the C kernel and the pure-Python twin — when the seed list is
    split into chunks and every chunk sees the full edge set (the
    shard subgraph is a superset of what its DFS traverses, so passing
    the whole graph is the most conservative shard)."""
    from crawler_spark.core.dfs_kernel import SweepState, sweep

    rng = np.random.default_rng(seed)
    c, i, up, b, s, nn = _random_skeleton(rng, 3000, 20000, 12)
    ref = sweep(c, i, up, b, s, nn, 6)[:5]
    for impl in ("c", "py"):
        st = SweepState(nn)
        if impl == "py":
            st._lib = None
            st.impl = "py"
            st.claimed = {}
        elif st.impl != "c":
            pytest.skip("no C toolchain")
        chunks = np.array_split(s, n_chunks)
        parts = [st.sweep_shard(c, i, up, b, ch, 6)
                 for ch in chunks if len(ch)]
        n = sum(p[0] for p in parts)
        assert n == ref[0]
        for k in range(1, 5):
            got = np.concatenate([p[k] for p in parts])
            np.testing.assert_array_equal(got, ref[k], err_msg=f"{impl}:{k}")


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_emit_prios_c_matches_numpy_twin(seed):
    """The C one-pass prio emitter and the vectorized numpy twin build
    byte-identical (offsets, data) blobs on random claim forests, and
    both reproduce the direct per-row reference build."""
    import crawler_spark.core.dfs_kernel as dk

    rng = np.random.default_rng(seed)
    n = 5000
    depth = rng.choice(np.arange(7), n,
                       p=[.05, .1, .2, .25, .2, .12, .08]).astype(np.int32)
    depth.sort()
    depth[0] = 0
    by_d = {d: np.flatnonzero(depth == d) for d in range(7)}
    parent_rank = np.full(n, -1, np.int64)
    rank0 = 1000 * seed
    for d in range(1, 7):
        rows, parents = by_d[d], by_d[d - 1]
        if not len(rows) or not len(parents):
            continue
        parent_rank[rows] = rank0 + parents[
            (rng.random(len(rows)) * len(parents)).astype(np.int64)]
    li = rng.integers(0, 40, n).astype(np.int32)
    srows = np.flatnonzero(parent_rank < 0)
    seed_prio = rng.integers(97, 103, 4 * len(srows)).astype(np.uint8)
    seed_ord = np.zeros(n, np.int32)
    seed_ord[srows] = np.arange(len(srows), dtype=np.int32)

    assert dk._load_lib() is not None  # the C path must exist here
    off_c, data_c = dk.emit_prios(depth, parent_rank, li, rank0,
                                  seed_prio, seed_ord)
    # force the numpy twin
    saved, saved_tried = dk._lib, dk._lib_tried
    dk._lib, dk._lib_tried = None, True
    try:
        off_np, data_np = dk.emit_prios(depth, parent_rank, li, rank0,
                                        seed_prio, seed_ord)
    finally:
        dk._lib, dk._lib_tried = saved, saved_tried
    assert np.array_equal(off_c, off_np)
    assert np.array_equal(data_c, data_np)

    # per-row reference: prio = prio(parent) ++ hex4(li), seeds copy
    # their 4-byte seed prio
    prios = [None] * n
    for r in range(n):
        if parent_rank[r] < 0:
            prios[r] = bytes(seed_prio[4 * seed_ord[r]:
                                       4 * seed_ord[r] + 4])
        else:
            p = int(parent_rank[r]) - rank0
            prios[r] = prios[p] + f"{int(li[r]):04x}".encode()
        got = bytes(data_c[off_c[r]:off_c[r + 1]])
        assert got == prios[r], r

    # empty batch
    off0, data0 = dk.emit_prios(np.empty(0, np.int32),
                                np.empty(0, np.int64),
                                np.empty(0, np.int32), 0,
                                np.zeros(4, np.uint8),
                                np.empty(0, np.int32))
    assert list(off0) == [0] and len(data0) == 0
