"""J3 sitemap tree build — the reference's nested sitemap
(`/root/reference/lib/crawler/crawler-engine.ts:1760-1781`:
buildSitemap roots at config.startUrl and recursively attaches
children where `child.parent_url == node.url`, stopping past
maxDepth) re-expressed as a flattened node table built by ≤max_depth
iterative level joins.

Spark-first shape: each level is one shuffle join keyed by
parent_url (level_k ⋈ edges), i.e. a bounded-depth BFS — the classic
distributed tree materialization. At 10^10 pages each level join
partitions by parent_url; no driver-side recursion, no collect. The
nested JSON the reference renders is a render-time fold over this
table (SURVEY §2 allows reconstruct-at-render; the table IS the
tree: url, parent, depth, path, n_children)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sitemap_tree(pages: DataFrame, root_url: str,
                 max_depth: int = 10) -> DataFrame:
    """pages: (url, parent_url, title). Returns every node reachable
    from root_url through parent_url edges within max_depth:
    (url, title, tree_depth, path, n_children, first_child). The root
    row carries tree_depth 0, a NULL title (the reference's root node
    has no page row) and path == root_url; child paths are
    'parent_path > url' — a unique materialized path since a crawl
    tree has one parent per page. n_children/first_child is the fused
    J2 parent→children aggregation (nav-path building,
    crawler-engine.ts:1760-1781's children arrays) — the same
    per-parent groupBy either way, so J2 and J3 share one scan."""
    spark = pages.sparkSession
    edges = pages.select("url", "parent_url", "title")
    counts = (edges.groupBy(F.col("parent_url").alias("url"))
              .agg(F.count("*").alias("n_children"),
                   F.min("url").alias("first_child")))
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("tree_depth", T.IntegerType()),
        T.StructField("path", T.StringType()),
    ])
    level = spark.createDataFrame(
        [(root_url, None, 0, root_url)], schema)
    out = [level]
    for d in range(1, max_depth + 1):
        level = (edges.join(
            level.select(F.col("url").alias("parent_url"),
                         F.col("path").alias("parent_path")),
            "parent_url")
            .select("url", "title",
                    F.lit(d).cast("int").alias("tree_depth"),
                    F.concat(F.col("parent_path"), F.lit(" > "),
                             F.col("url")).alias("path"))
            .persist())
        if level.isEmpty():
            level.unpersist()
            break
        out.append(level)
    tree = out[0]
    for lv in out[1:]:
        tree = tree.unionByName(lv)
    # counts is one row per internal node — NOT broadcast-hinted (at
    # 10^10 pages it is web-sized); AQE picks broadcast when it fits
    return (tree.join(counts, "url", "left")
            .withColumn("n_children",
                        F.coalesce("n_children", F.lit(0)).cast("long"))
            .select("url", "title", "tree_depth", "path", "n_children",
                    "first_child"))
