"""Independent cross-check of the bench-web visit count at 10^7 scale.

Rebuilds the synthetic web's link graph directly from the generator's
closed-form arithmetic (sources/synth_web.py is a pure function of
(seed, shape) — the arithmetic is replicated here on integer arrays,
no parquet or Spark involved) and checks the engine's reported visit
count two ways:

  * ``--exact`` (default): run the sequential DFS-claim sweep
    (core/dfs_kernel.py — the same kernel the tests pin row-for-row
    against the pure-Python simulator and the pure-Python twin)
    directly on the closed-form CSR.  This recomputes the crawl's
    claim set WITHOUT the distributed pipeline — no Spark, no
    canonicalization joins, no bucketed fetch, no admission shuffles —
    so an exact count match certifies the whole explore+resolve
    pipeline end-to-end at a scale (10^7 pages / 10^8 links) the
    pure-Python simulator cannot replay.
  * ``--bfs``: a numpy BFS upper bound on the claim set (every claim
    is BFS-reachable at <= its claim depth).  The bound is LOOSE when
    the BFS frontier is still expanding at max_depth — DFS spends its
    depth budget walking chains, so it claims far fewer than BFS
    reaches (measured at 1M pages / depth 8: BFS 1,206,906 vs
    693K actual claims).  Useful as a sanity ceiling and for the
    per-level frontier profile, not as the primary check.

Engine semantics encoded (mirrors oracle/simulator.py, with reference
citations there):
  * status-0 (timeout) pages extract no links; 404 pages DO extract
    (the reference never gates extraction on status);
  * fragment suffixes strip and SHOUTING hosts lowercase under
    canonicalization, but an uppercased PATH stays uppercase — such
    hrefs point at URLs absent from the web (dead links), which ARE
    claimed/visited (as 404s, no out-links) keyed by target id;
  * depth cap: children are scheduled only from parents at
    depth < max_depth;
  * both "a" and "button" links are followed (DEFAULT_FOLLOW_TAGS).

Usage: python tools/reach_check.py [--pages 16000000] [--seeds 1024]
       [--depth 8] [--exact] [--bfs]

Prints one JSON line per requested mode; compare "claims" against the
"urls" field of the matching BENCH_scaling pair.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(_U64) + _U64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _lane(j: np.ndarray, salt: int) -> np.ndarray:
    mixed = (salt * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    return splitmix64(j.astype(_U64) ^ _U64(mixed))


def build_graph(n_pages: int, n_hosts: int = 1000, mega_pct: int = 30,
                seed: int = 42, n_seeds: int = 64):
    """Replicates generate_bench_web's arithmetic (same constants) but
    emits integer arrays instead of parquet: per-page CSR of link
    targets, a dead-link flag per link, per-page status, seed ids."""
    j = np.arange(n_pages, dtype=np.int64)
    h_pick = _lane(j, seed + 1)
    host_id = np.where((h_pick % _U64(100)) < mega_pct, 0,
                       1 + (_lane(j, seed + 2) % _U64(n_hosts - 1))
                       ).astype(np.int64)
    st = _lane(j, seed + 3) % _U64(100)
    status = np.where(st < 98, 200, np.where(st < 99, 0, 404)).astype(np.int32)

    n_links = (3 + (_lane(j, seed + 4) % _U64(5))).astype(np.int64)
    offsets = np.zeros(n_pages + 1, dtype=np.int64)
    np.cumsum(n_links, out=offsets[1:])
    total = int(offsets[-1])
    page_of = np.repeat(j, n_links)
    link_index = (np.arange(total, dtype=np.int64)
                  - np.repeat(offsets[:-1], n_links)).astype(np.int64)

    lh = splitmix64(page_of.astype(_U64) * _U64(0x100000001B3)
                    ^ link_index.astype(_U64) ^ _U64(seed + 7))
    same_host = (lh % _U64(100)) < 85
    order = np.argsort(host_id, kind="stable")
    sorted_hosts = host_id[order]
    host_starts = np.searchsorted(sorted_hosts, np.arange(n_hosts))
    host_ends = np.searchsorted(sorted_hosts, np.arange(n_hosts),
                                side="right")
    host_count = np.maximum(host_ends - host_starts, 1)
    link_host = host_id[page_of]
    pos = (splitmix64(lh ^ _U64(0xABCD)) %
           host_count[link_host].astype(_U64)).astype(np.int64)
    same_target = order[host_starts[link_host] + pos]
    cross_target = (splitmix64(lh ^ _U64(0x5555)) % _U64(n_pages)
                    ).astype(np.int64)
    target = np.where(same_host, same_target, cross_target)
    # SHOUTING href (lh%20==1): canonicalization lowercases the host
    # but keeps the uppercased path "/P<t>" — a URL outside the web.
    dead = (lh % _U64(20)) == 1

    seed_pages = np.empty(n_seeds, np.int64)
    for k in range(n_seeds):
        h = k % n_hosts
        off = (k // n_hosts) % int(host_count[h])
        seed_pages[k] = order[host_starts[h] + off]
    return offsets, target, dead, status, seed_pages, link_index


def exact_claims(n_pages: int, offsets, target, dead, status, seed_pages,
                 link_index, max_depth: int) -> dict:
    """Exact sequential DFS-claim count via core/dfs_kernel.sweep on
    the closed-form CSR. Dead URLs get their own node ids (claimable,
    no out-links); timeout parents contribute no edges."""
    from crawler_spark.core.dfs_kernel import sweep

    # dense ids for dead URLs: n_pages + rank(t among distinct targets)
    dead_targets = np.unique(target[dead])
    dead_ids = n_pages + np.searchsorted(dead_targets, target)
    child = np.where(dead, dead_ids, target)
    n_nodes = n_pages + len(dead_targets)

    # drop edges whose parent timed out (status 0 extracts nothing)
    page_of = np.repeat(np.arange(n_pages, dtype=np.int64),
                        np.diff(offsets))
    keep = status[page_of] != 0
    child_k = child[keep].astype(np.int32)
    li_k = link_index[keep].astype(np.int32)
    counts = np.zeros(n_pages, np.int64)
    np.add.at(counts, page_of[keep], 1)
    starts = np.zeros(n_pages + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    uniq_p = np.arange(n_pages, dtype=np.int32)

    # seeds stay in seed-rank order (duplicates fine: claim-checked)
    n, ids, depths, parents, lis, impl = sweep(
        np.ascontiguousarray(child_k), np.ascontiguousarray(li_k),
        uniq_p, starts, seed_pages.astype(np.int32), n_nodes, max_depth)
    live = int((ids < n_pages).sum())
    return {"claims": int(n), "live": live, "dead": int(n) - live,
            "max_claim_depth": int(depths.max()), "sweep_impl": impl}


def bfs_visits(n_pages: int, offsets, target, dead, status, seed_pages,
               max_depth: int) -> dict:
    seen = np.zeros(n_pages, bool)          # live pages reached
    dead_seen = np.zeros(n_pages, bool)     # dead URL "/P<t>" keyed by t
    frontier = np.unique(seed_pages)
    seen[frontier] = True
    levels = [int(len(frontier))]
    for _d in range(max_depth):
        # expand only live pages that actually extract (status != 0)
        src = frontier[status[frontier] != 0]
        if not len(src):
            levels.append(0)
            continue
        # gather each source page's link slice
        counts = (offsets[src + 1] - offsets[src])
        idx = np.repeat(offsets[src], counts) + (
            np.arange(int(counts.sum()))
            - np.repeat(np.cumsum(counts) - counts, counts))
        tgt = target[idx]
        is_dead = dead[idx]
        # dead URLs: claimed once per distinct target id, no expansion
        dt = tgt[is_dead]
        dead_seen[dt[~dead_seen[dt]]] = True
        # live targets not yet seen form the next frontier
        lt = np.unique(tgt[~is_dead])
        lt = lt[~seen[lt]]
        seen[lt] = True
        frontier = lt
        levels.append(int(len(lt)))
        if not len(lt):
            break
    return {"bfs_reachable": int(seen.sum() + dead_seen.sum()),
            "live": int(seen.sum()), "dead": int(dead_seen.sum()),
            "frontier_levels": levels}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16_000_000)
    ap.add_argument("--seeds", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--bfs", action="store_true",
                    help="also print the BFS upper bound")
    ap.add_argument("--no-exact", action="store_true",
                    help="skip the exact DFS sweep")
    args = ap.parse_args()
    offsets, target, dead, status, seed_pages, link_index = build_graph(
        args.pages, n_seeds=args.seeds)
    if not args.no_exact:
        print(json.dumps(exact_claims(
            args.pages, offsets, target, dead, status, seed_pages,
            link_index, max_depth=args.depth)))
    if args.bfs:
        print(json.dumps(bfs_visits(
            args.pages, offsets, target, dead, status, seed_pages,
            max_depth=args.depth)))


if __name__ == "__main__":
    main()
