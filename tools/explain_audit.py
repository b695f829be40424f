"""Plan-quality audit: runs `.explain("formatted")` over representative
contract queries and greps the physical plans for the properties a
100 TB deployment needs — parquet filter pushdown (`PushedFilters`),
column pruning (`ReadSchema` width), whole-stage codegen coverage,
and join-strategy choices (broadcast for small dims, shuffle-hash /
sort-merge where a broadcast would not fit). Prints one PASS/INFO
line per check plus the plan excerpts; writes PLANS.md when --write.

Usage: python tools/explain_audit.py [--sf /root/testdata/sf0.01]
       [--write]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, expectations) — substrings that must appear in the formatted
# physical plan, plus named checks evaluated on the text
AUDITS = {
    # pushdown + pruning: the politeness query reads 2 of 5+ customer
    # columns; canonicalize reads c_custkey/name only
    "url_canonicalize": dict(
        prune_max_cols=3,
        want=["codegen id"]),
    "seen_anti_join": dict(
        want=["codegen id"],
        any_join=["BroadcastHashJoin", "SortMergeJoin",
                  "ShuffledHashJoin"]),
    "region_rollup": dict(
        # 5-row region dim must broadcast, never shuffle
        want=["BroadcastHashJoin"], forbid=["SortMergeJoin"]),
    "first_match_scan": dict(want=["codegen id", "Window"]),
    "token_jaccard": dict(
        # prefix-filtered self-join: hot-key-free equi-joins
        any_join=["SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastHashJoin"]),
    "crawl_counters": dict(want=["HashAggregate"]),
    "lsh_ann": dict(any_join=["SortMergeJoin", "ShuffledHashJoin",
                              "BroadcastHashJoin"]),
    # Arrow-batched Python stages: the plan must cross into Python via
    # MapInPandas (vectorized), never BatchEvalPython (row-at-a-time)
    "extract_page": dict(want=["MapInPandas"],
                         forbid=["BatchEvalPython"]),
    "image_thumbnail": dict(want=["MapInPandas"],
                            forbid=["BatchEvalPython"]),
    # per-row caption/pixel stats: pure codegen projection, no Python
    "caption_stats": dict(want=["codegen id"],
                          forbid=["BatchEvalPython"]),
    # ≤max_depth iterative self-joins, all equi-joins
    "sitemap_tree": dict(any_join=["BroadcastHashJoin",
                                   "ShuffledHashJoin", "SortMergeJoin"]),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    from crawler_spark.plans.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("explain_audit", cores=8, shuffle_partitions=8)
    qs = entry.queries()
    report, failures = [], 0
    for name, exp in AUDITS.items():
        df = qs[name](spark, args.sf)
        # execute THIS DataFrame, then read the explain string off the
        # same QueryExecution: with AQE on, only the finalized
        # adaptive plan (isFinalPlan=true) carries codegen ids and the
        # join strategy the runtime actually picked
        df.collect()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        lines = [f"## {name}"]
        ok = True
        for s in exp.get("want", []):
            hit = s in plan
            ok &= hit
            lines.append(f"- want `{s}`: {'PASS' if hit else 'FAIL'}")
        for s in exp.get("forbid", []):
            hit = s not in plan
            ok &= hit
            lines.append(f"- forbid `{s}`: {'PASS' if hit else 'FAIL'}")
        if "any_join" in exp:
            hit = any(s in plan for s in exp["any_join"])
            ok &= hit
            lines.append(f"- equi-join present: {'PASS' if hit else 'FAIL'}")
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if scans:
            widths = [len(s.split(",")) for s in scans if s]
            lines.append(f"- scan column widths: {widths}")
            if "prune_max_cols" in exp:
                hit = max(widths) <= exp["prune_max_cols"]
                ok &= hit
                lines.append(
                    f"- pruned to ≤{exp['prune_max_cols']} cols: "
                    f"{'PASS' if hit else 'FAIL'}")
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if any(p.strip() for p in pushed):
            lines.append(f"- PushedFilters: {[p for p in pushed if p][:2]}")
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        lines.append(f"- whole-stage codegen spans: {n_codegen}")
        failures += 0 if ok else 1
        print(("PASS " if ok else "FAIL ") + name)
        report.append("\n".join(lines))
    print(f"done: {failures} failures")
    if args.write:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PLANS.md"), "w") as f:
            f.write("# Physical-plan audit (tools/explain_audit.py)\n\n"
                    "Checks that representative contract queries keep "
                    "the plan shape a 100 TB run needs: pushdown, "
                    "pruning, codegen, and the right join strategies.\n\n"
                    + "\n\n".join(report) + "\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
