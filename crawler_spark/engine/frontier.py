"""The distributed URL frontier + fetch scheduler — the engine core.

Re-expresses the reference's crawl loop
(/root/reference/lib/crawler/crawler-engine.ts:417-716) Spark-first.
The reference's crawl ORDER is sequential DFS preorder (parent awaits
each child chain before the next sibling, crawler-engine.ts:673-695)
with the URL-seen set claimed at schedule time (:556). Exact DFS is
P-complete — inherently sequential — so the engine splits it:

  1. EXPLORE — parallel speculative micro-batch exploration. Each
     round selects a politeness-budgeted batch from the frontier,
     "fetches" it (a join against the synthetic web table here; a
     `mapInPandas` HTTP stage on a real cluster), extracts + admits
     candidate links (tag filter → sample slice → hygiene → native
     canonicalization → domain/robots filters), and appends
     fetched/edges/errors/image-ref rows to the checkpoint. This
     fetches the BFS-reachable admissible superset of the DFS visit
     set (every DFS chain prefix is BFS-reachable at ≤ its chain
     depth), so all edges the DFS needs are discovered. Fetching —
     the expensive part at 10^10 URLs — is thereby fully parallel.

  2. RESOLVE — deterministic DFS-claim resolution: each URL is
     claimed by the lexicographically smallest priority vector
     (parent's vector ++ link_index, fixed-width hex so string
     comparison = lexicographic order) among calls from claimed
     pages, computed as an iterative full-recompute fixpoint of
     DataFrame joins (≈ max_depth + small-slack rounds; claims form
     chains of length ≤ max_depth rooted at the seeds, so the
     fixpoint is unique and equals the sequential DFS — verified
     against the oracle simulator in tests/test_crawl_golden.py).
     Sorting claims by priority vector reproduces the reference's
     visit order exactly; the claim set IS the reference's URL-seen
     set.

Scale posture (10^10 URLs / 1000 executors):
  * frontier/fetched/edges are hash-partitioned by xxhash64(url);
    the per-round anti-join (candidates ⋈ fetched) is the J1
    scale-critical join — AQE + optional bloom pre-filter
    (crawler_spark.operators.bloom) prune it.
  * robots and the allowed-host list are broadcast (small dims).
  * the per-host politeness window is skew-prone (mega-hosts);
    rows are salted by pmod(url_hash, S) inside a host before the
    per-host rank so no single task sees a whole mega-host
    (cfg.rate_limit budget is split across salts).
  * resolve is ~max_depth shuffles over the edge set — linear in
    |edges|, partitioned by child URL.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types

from ..functions.urls import canonicalize_url, url_hash, url_host, url_path
from ..sources.tables import SnapshotTable
from .config import PRIO_WIDTH, CrawlConfig

_HEX_W = PRIO_WIDTH


def _hex_prio(idx_col):
    """Fixed-width lowercase hex of an int column (prio component)."""
    return F.lpad(F.lower(F.hex(idx_col)), _HEX_W, "0")


def _read_parquet_dir(path: str, empty_schema):
    """Thread-pooled pyarrow read of a parquet dir (ctypes/pyarrow
    release the GIL, so the read scales with cores — a single-stream
    driver toPandas() collect here was 61 s of the committed 32-core
    bench). Explicit in-order concat: skeleton parts are
    parent-hash-partitioned (each parent contiguous and link-sorted —
    all the CSR pass needs); node rows carry their id explicitly, so
    their order is irrelevant."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from concurrent.futures import ThreadPoolExecutor

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))
    if not files:
        return pa.table(empty_schema)
    with ThreadPoolExecutor(min(16, len(files))) as ex:
        parts = list(ex.map(pq.read_table, files))
    return pa.concat_tables(parts)


_MONO_MASK = (1 << 33) - 1  # monotonically_increasing_id ordinal bits


def _node_offsets(path: str) -> tuple[dict[int, int], int]:
    """Per-write-partition dense-id offsets of a node table written
    with a `mono` = monotonically_increasing_id column, from parquet
    FOOTERS only (zero Spark jobs): each file was written by exactly
    one task, so every row shares the file's partition id (mono >>
    33); the file's row count comes from its footer and its pid from
    the mono column's row-group min statistic. Offsets accumulate in
    pid order — identical ids to a per-pid count pass + window."""
    import pyarrow.parquet as pq

    per_pid: dict[int, int] = {}
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index("mono")
        pid = md.row_group(0).column(idx).statistics.min >> 33
        per_pid[pid] = per_pid.get(pid, 0) + md.num_rows
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(per_pid):
        offs[pid] = acc
        acc += per_pid[pid]
    return offs, acc


def _shard_sweep_optimistic(args):
    """Process-pool worker for the PARALLEL sharded resolve: load one
    shard's skeleton and sweep it OPTIMISTICALLY (empty claim state —
    as if no earlier shard had claimed anything). Runs in a forked
    child: numpy + pyarrow + the C kernel only, no Spark (the py4j
    gateway talks to a separate JVM process, and forked pool children
    exit via os._exit, so the parent's JVM connection is untouched).

    Returns call-local claims in visit order plus per-seed cumulative
    claim boundaries (`seed_counts`). The parent validates each
    shard's optimistic result against the true global claim state in
    seed-rank order: if the optimistic claims are disjoint from every
    earlier shard's accepted claims, the optimistic sweep IS the true
    sweep (an optimistic run only diverges at the first pop of an
    already-claimed node, and any such node would itself appear in the
    optimistic claim set — so disjointness certifies the whole run);
    otherwise the longest conflict-free seed PREFIX is accepted (later
    seeds never influence earlier ones) and only the remaining seeds
    re-sweep sequentially against the true state."""
    sharded_path, s, seed_ids, n_nodes, max_depth = args
    import numpy as np
    import pyarrow as pa

    from ..core.dfs_kernel import SweepState, csr_runlength

    t0 = time.time()
    empty = {"p_id": pa.array([], pa.int32()),
             "i": pa.array([], pa.int32()),
             "c_id": pa.array([], pa.int32())}
    sdir = os.path.join(sharded_path, f"shard={s}")
    skel_t = (_read_parquet_dir(sdir, empty)
              if os.path.isdir(sdir) else pa.table(empty))
    p_ids = skel_t["p_id"].to_numpy(zero_copy_only=False)
    i_sorted = skel_t["i"].to_numpy(zero_copy_only=False)
    c_id = np.ascontiguousarray(
        skel_t["c_id"].to_numpy(zero_copy_only=False), np.int32)
    uniq_p, bounds = csr_runlength(p_ids)
    del skel_t, p_ids
    state = SweepState(n_nodes)
    seed_id = np.asarray(seed_ids, np.int32)
    seed_counts = np.zeros(len(seed_id), np.int64)
    n, out_id, out_depth, out_pr, out_li = state.sweep_shard(
        c_id, i_sorted, uniq_p, bounds, seed_id, max_depth, seed_counts)
    return (s, n, out_id, out_depth, out_pr, out_li, seed_counts,
            round(time.time() - t0, 2), state.impl)


# ---------------------------------------------------------------------------
# admission (F2-F5) as reusable native expressions
# ---------------------------------------------------------------------------

def admit(df: DataFrame, url_col: str, robots: DataFrame,
          allowed_hosts: list[str], cfg: CrawlConfig) -> DataFrame:
    """Filter *df* to admissible URLs (already canonical): http(s)
    scheme, domain restriction (F4), robots disallow prefixes (F5).
    Adds `host` and `path` columns. robots is broadcast (small dim)."""
    u = F.col(url_col)
    out = (
        df.filter(u.rlike(r"^https?://[^/?#]+"))
        .withColumn("host", url_host(u))
        .withColumn("path", url_path(u))
    )
    if cfg.restrict_domains:
        hosts = F.array(*[F.lit(h) for h in sorted(allowed_hosts)])
        cond = F.exists(hosts, lambda a: (F.col("host") == a) | (
            F.col("host").endswith(F.concat(F.lit("."), a))
            if cfg.include_subdomains else F.lit(False)))
        out = out.filter(cond)
    out = out.join(F.broadcast(robots.select("host", "disallow_prefixes")),
                   "host", "left")
    blocked = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes",
                 lambda p: (p != "") & F.col("path").startswith(p)),
    ).otherwise(F.lit(False))  # allow-all when robots missing (:481-485)
    return out.filter(~blocked).drop("disallow_prefixes", "path")


# ---------------------------------------------------------------------------
# link extraction (E2/E5 + F8/F9/F10) as native expressions
# ---------------------------------------------------------------------------

class ExtractPlan:
    """Column trees for the fused fetch+extract+admit pass, built ONCE
    per engine. Plan CONSTRUCTION is driver-side py4j chatter —
    measured ~0.45 s per round on a 95-round politeness crawl, pure
    Amdahl in the scaling-efficiency denominator — and Column objects
    are immutable, so every round reuses the same trees and `apply`
    costs a handful of py4j calls instead of hundreds.

    The pass itself: ONE generator over the joined (batch ⋈ web) rows
    yields, per page, a `kind='page'` marker row (status/title/images
    — the old `fetched` table) AND the admitted `kind='edge'` child
    rows. Trick: prepend one null element to the (tag-filtered,
    sampled) links array, then a single posexplode emits pos=0 → page
    row, pos≥1 → link row. Admission (scheme/domain/robots, reference
    crawler-engine.ts:1368-1412) filters only the link rows; page
    rows always survive. Robots is a broadcast dim keyed on the
    CHILD host."""

    def __init__(self, elem_dt, robots: DataFrame,
                 allowed_hosts: list[str], cfg: CrawlConfig):
        tags = F.array(*[F.lit(t) for t in cfg.follow_link_tags])
        links = F.filter("links",
                         lambda l: F.array_contains(tags, l["element_type"]))
        if cfg.sample_mode:
            links = F.slice(links, 1, 1)
        # status 0 (timeout) aborts extraction (goto throw, :1704) and
        # a null title means no parse — such pages emit ONLY their
        # marker. The null sentinel element is typed from the data's
        # own links schema (fixture link structs can carry extra
        # provenance fields).
        links = F.when((F.col("status_code") != 0)
                       & F.col("title").isNotNull(),
                       links).otherwise(
            F.array().cast(types.ArrayType(elem_dt)))
        marked = F.concat(F.array(F.lit(None).cast(elem_dt)), links)
        self.explode_cols = [
            F.col("url").alias("parent_url"), F.col("depth"),
            F.col("host"), F.col("status_code"),
            F.col("title"), F.col("images"),
            F.regexp_extract("url", r"^(https?://[^/]+)", 1).alias("origin"),
            F.posexplode(marked).alias("pos", "l")]
        href = F.trim(F.col("l.href"))
        abs_url = (
            F.when(href.rlike(r"^[hH][tT][tT][pP][sS]?://"), href)
            .when(href.startswith("/"), F.concat(F.col("origin"), href))
            .otherwise(F.lit(None)))
        self.child = F.when(F.col("pos") > 0, canonicalize_url(abs_url))
        self.child_host = url_host(F.col("child_url"))
        self.child_path = url_path(F.col("child_url"))
        ok = F.col("child_url").rlike(r"^https?://[^/?#]+")
        if cfg.restrict_domains:
            hosts = F.array(*[F.lit(h) for h in sorted(allowed_hosts)])
            ok = ok & F.exists(hosts, lambda a: (F.col("child_host") == a) | (
                F.col("child_host").endswith(F.concat(F.lit("."), a))
                if cfg.include_subdomains else F.lit(False)))
        blocked = F.when(
            F.col("disallow_prefixes").isNotNull(),
            F.exists("disallow_prefixes",
                     lambda p: (p != "") & F.col("child_path").startswith(p)),
        ).otherwise(F.lit(False))  # allow-all when robots missing (:481-485)
        self.keep = (F.col("pos") == 0) | (ok & ~blocked)
        self.robots_b = F.broadcast(robots.select(
            F.col("host").alias("child_host"), "disallow_prefixes"))
        self.out_cols = [
            F.when(F.col("pos") == 0, "page").otherwise("edge")
            .alias("kind"),
            F.col("parent_url"), F.col("depth"), F.col("host"),
            F.col("status_code"),
            F.when(F.col("pos") == 0, F.col("title")).alias("title"),
            F.when(F.col("pos") == 0, F.col("images")).alias("images"),
            F.when(F.col("pos") == 0, F.lit(-1))
            .otherwise(F.col("l.link_index")).alias("link_index"),
            F.col("child_url"), F.col("child_host")]

    def apply(self, pages: DataFrame) -> DataFrame:
        return (pages.select(*self.explode_cols)
                .withColumn("child_url", self.child)
                .withColumn("child_host", self.child_host)
                .withColumn("child_path", self.child_path)
                .join(self.robots_b, "child_host", "left")
                .filter(self.keep)
                .select(*self.out_cols))


def extract_round(pages: DataFrame, robots: DataFrame,
                  allowed_hosts: list[str], cfg: CrawlConfig) -> DataFrame:
    """One-shot convenience wrapper over ExtractPlan (the engine holds
    a cached plan instead; see ExtractPlan docstring)."""
    elem_dt = pages.schema["links"].dataType.elementType
    return ExtractPlan(elem_dt, robots, allowed_hosts, cfg).apply(pages)


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

class FrontierEngine:
    """Micro-batch crawl over a synthetic web table, checkpointed and
    resumable. ``web``/``robots``/``seeds`` are fixture DataFrames
    (sources generated by crawler_spark.sources.fixtures)."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig,
                 fixture_dir: str, ckpt_dir: str,
                 enforce_politeness: bool = False,
                 host_salts: int = 8,
                 use_bloom: bool = False,
                 use_cuckoo: bool = False,
                 bucketed_web_dir: str | None = None,
                 web_buckets: int = 64,
                 bucket_join_min: int = 250_000,
                 freeze_frontier: bool = True,
                 ingest_images: bool = False,
                 ingest_bloom: bool = False,
                 bucketed_images_dir: str | None = None,
                 bucketed_seen: bool = False,
                 seen_buckets: int = 64,
                 cursor_spill_rows: int = 500_000):
        self.spark = spark
        self.cfg = cfg
        self.fixture_dir = fixture_dir
        self.ckpt = ckpt_dir
        self.enforce_politeness = enforce_politeness
        self.host_salts = host_salts
        # freeze-and-cursor deferral store (politeness mode only):
        # deferred rows that can never be overtaken are written ONCE
        # and popped by cursor instead of re-ranked + rewritten every
        # window — see _write_frontier's scale note
        self.freeze_frontier = freeze_frontier
        self._cursor = None          # pandas (host, salt, salt_cap,
        self._fdirs = None           #   consumed, frozen_total) /
        #                                (dir, host, salt, max_frank)
        # past `cursor_spill_rows` frozen (host, salt) groups, the
        # cursor leaves the driver: it lives in per-round parquet and
        # every touch (take computation, pop join, round advance)
        # becomes a small Spark job — driver RSS stays flat no matter
        # how many hosts ever freeze. Below the cap it stays a pandas
        # dim with ZERO extra Spark jobs per round (the scaling
        # denominator). One-way transition, checked after each
        # advance; semantics identical (goldens pin both modes).
        self.cursor_spill_rows = cursor_spill_rows
        self._cursor_spark = False   # spilled mode active
        self._cursor_sdf_path = None  # current cursor parquet (spilled)
        # dirstats files of dirs retired THIS round — deleted only
        # after the round's snapshot commit (see _retire_dirs_spark)
        self._dirstats_dead: list[str] = []
        self.use_bloom = use_bloom
        # cuckoo is the deletion-capable alternative (operators/
        # cuckoo.py); both compose identically as certain-new
        # pre-filters, so the engine treats them interchangeably
        self.use_cuckoo = use_cuckoo
        self.web = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
        self.robots = spark.read.parquet(f"{fixture_dir}/robots.parquet")
        self.seeds_raw = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
        self.allowed_hosts = self._seed_hosts() if cfg.restrict_domains else []
        self.bucket_join_min = bucket_join_min
        self.web_table = (self._ensure_bucketed_web(bucketed_web_dir,
                                                    web_buckets)
                          if bucketed_web_dir else None)
        # snapshot tables over the checkpoint dirs (Iceberg-shaped
        # commit protocol, sources/tables.py): every micro-batch round
        # is committed as a fast-append snapshot with per-partition
        # lineage from the parquet footers; resume state and the
        # round history are read FROM the manifest, so a dir that was
        # being written when the driver died is invisible on restart.
        os.makedirs(self.ckpt, exist_ok=True)
        self.frontier_table = SnapshotTable(spark, self._paths("frontier"))
        self.crawl_table = SnapshotTable(spark, self._paths("crawl"))
        # bucketed seen-store (Iceberg bucket(N, url) analog over the
        # admission history): the J1 anti-join and the politeness
        # depth-correcting admit both key on the FULL frontier history
        # every round — as a plain parquet union that history crosses
        # a shuffle per round (at 10^10 URLs: the whole seen set
        # through an all-to-all exchange, every round — THE scale
        # killer of the naive design). Mirroring it into a catalog
        # table PARTITIONED BY round and CLUSTERED BY url makes the
        # history side of both joins exchange-free (scan reports
        # hash-partitioning; only the round's candidates shuffle) and
        # scans stay column-pruned + partition-pruned. Each partition
        # is a slim (url, depth) copy of one committed frontier round,
        # written right after that round's snapshot commit and
        # rebuilt idempotently on resume (INSERT OVERWRITE per
        # partition; _seen_store_heal), so the store is a derived
        # index — the frontier SnapshotTable stays the only source of
        # truth and exactness never depends on the store surviving.
        self._seen_buckets = seen_buckets
        self._seen_name = (self._ensure_seen_store(seen_buckets)
                           if bucketed_seen else None)
        # in-loop image ingest (north-star: fetched image bytes are
        # decoded/validated via Arrow UDFs with phash dedup INSIDE the
        # micro-batch loop, committed per round with lineage — see
        # _ingest_images). The byte dim is the sandbox's HTTP stand-in.
        self.ingest_images = ingest_images
        self.ingest_bloom = ingest_bloom
        if ingest_images:
            self.images_dim = spark.read.parquet(
                f"{fixture_dir}/images.parquet").select(
                "src", "image_id", "bytes", "w", "h", "fmt", "caption")
            # big-round byte fetches join against a src-bucketed copy
            # of the dim (the Iceberg bucket(N, src) analog) so ONLY
            # the refs side shuffles — the plain join either
            # sort-merge-shuffles the multi-GB byte dim every round or
            # pays a serial driver-side broadcast build of multi-
            # million-src ref sets (same failure modes the fetch join
            # solved; see _ensure_bucketed_web)
            self._images_dim_bucketed = (
                self._ensure_bucketed_dim(bucketed_images_dir,
                                          web_buckets)
                if bucketed_images_dir else None)
            self._img_buckets = web_buckets
            self.images_table = SnapshotTable(spark, self._paths("images"))
            # same bucketed-log treatment for the ingested-src history
            # (the per-round src-seen anti-join otherwise shuffles
            # every previously ingested src, every round — 10^9+ srcs
            # at target scale)
            self._imgseen_name = (self._ensure_imgseen_store(seen_buckets)
                                  if bucketed_seen else None)
        else:
            self._imgseen_name = None
        self.timings: dict = {}
        # per-round plan pieces built ONCE: Column trees and slim
        # projections are immutable, and rebuilding them every round
        # was ~1 s/round of driver-side py4j chatter — a core-count-
        # independent term in the scaling-efficiency denominator
        # (measured: 95-round politeness crawl spent 116 s of 148 s in
        # py4j socket reads before this cache)
        # raw-HTML fetch mode (E1 in the loop): a web table WITHOUT
        # pre-parsed `links` structs but WITH an `html` payload column
        # (sources.fixtures.write_html_web; a real cluster's fetch
        # stage returns exactly this shape) flips the engine to parse
        # title/links/images from markup per round via the Arrow-
        # batched HTML-parse stage — same narrow partitioning, one
        # extra Python crossing per fetched page, identical crawl
        # (golden test pins the visit order against the struct web).
        self.parse_from_html = "links" not in self.web.columns
        if self.parse_from_html:
            from ..operators.html_parse import IMG_T, LINK_T
            link_dt, img_dt = LINK_T.elementType, IMG_T
            self._web_slim = self.web.select("url", "status_code", "html")
            self._wt_slim = (self.web_table.select(
                "url", "status_code", "html")
                if self.web_table is not None else None)
        else:
            link_dt = self.web.schema["links"].dataType.elementType
            img_dt = self.web.schema["images"].dataType
            self._web_slim = self.web.select("url", "status_code", "title",
                                             "links", "images")
            self._wt_slim = (self.web_table.select(
                "url", "status_code", "title", "links", "images")
                if self.web_table is not None else None)
        self._extract_plan = ExtractPlan(
            link_dt, self.robots, self.allowed_hosts, cfg)
        # explicit file schemas: skip per-read footer inference, which
        # grows O(rounds) over a crawl (frontier history is re-read
        # every round)
        self._frontier_schema = types.StructType([
            types.StructField("url", types.StringType()),
            types.StructField("depth", types.IntegerType()),
            types.StructField("host", types.StringType())])
        # frozen rows carry their politeness salt and a dense per-
        # (host, salt) rank assigned at freeze time; b/d rows store
        # nulls in these two columns (RLE — costs ~nothing), so one
        # partitionBy(sel) write covers all three verdicts and every
        # history read just prunes to _frontier_schema
        self._freeze_schema = types.StructType([
            types.StructField("url", types.StringType()),
            types.StructField("depth", types.IntegerType()),
            types.StructField("host", types.StringType()),
            types.StructField("salt", types.IntegerType()),
            types.StructField("frank", types.LongType())])
        self._crawl_schema = types.StructType([
            types.StructField("parent_url", types.StringType()),
            types.StructField("depth", types.IntegerType()),
            types.StructField("host", types.StringType()),
            types.StructField("status_code",
                              self.web.schema["status_code"].dataType),
            types.StructField("title", types.StringType()),
            types.StructField("images", img_dt),
            types.StructField("link_index",
                              link_dt["link_index"].dataType),
            types.StructField("child_url", types.StringType()),
            types.StructField("child_host", types.StringType())])

    def _ensure_bucketed_web(self, path: str, buckets: int) -> DataFrame:
        """Bucket+sort the static web by url ONCE (hash-bucketed table,
        the Iceberg `bucket(N, url)` partition-transform analog). The
        per-round fetch join then plans as a sort-merge join where only
        the frontier side shuffles: no driver-side broadcast build —
        which is serial and was the round bottleneck at multi-million-
        row batches — and no re-sort of the web (buckets are written
        sorted). One-time cost, amortized over every round and every
        run sharing the cache dir."""
        # key the catalog name on the bucketed path: two engines in one
        # session with different fixture dirs must not silently share a
        # bucketed web (same-name reuse fetched pages from the wrong web)
        import hashlib

        digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
        name = f"web_bucketed_{digest}"
        if self.spark.catalog.tableExists(name):
            return self.spark.table(name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (self.web.repartition(buckets, F.col("url"))
             .write.mode("overwrite")
             .bucketBy(buckets, "url").sortBy("url")
             .option("path", path)
             .saveAsTable(name))
        else:  # data from a previous session: register it
            ddl = self.web.schema.toDDL()
            self.spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (url) SORTED BY (url) "
                f"INTO {buckets} BUCKETS LOCATION '{path}'")
        return self.spark.table(name)

    def _ensure_bucketed_dim(self, path: str, buckets: int) -> DataFrame:
        """Bucket+sort the images byte dim by src ONCE (same pattern
        and rationale as _ensure_bucketed_web; shared cache dir,
        path-keyed catalog name)."""
        import hashlib

        digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
        name = f"imgdim_bucketed_{digest}"
        if self.spark.catalog.tableExists(name):
            return self.spark.table(name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (self.images_dim.repartition(buckets, F.col("src"))
             .write.mode("overwrite")
             .bucketBy(buckets, "src").sortBy("src")
             .option("path", path)
             .saveAsTable(name))
        else:  # data from a previous session: register it
            ddl = self.images_dim.schema.toDDL()
            self.spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (src) SORTED BY (src) "
                f"INTO {buckets} BUCKETS LOCATION '{path}'")
        return self.spark.table(name)

    def _ensure_seen_store(self, buckets: int) -> str:
        """Create (or re-register on resume) the bucketed seen-store
        catalog table — see the constructor comment for why. Path-keyed
        name for the same reason as _ensure_bucketed_web."""
        import hashlib

        path = self._paths("seen_bucketed")
        digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
        name = f"seen_bkt_{digest}"
        # always re-register: fresh_ckpt reuses paths, so a catalog
        # entry from an earlier engine on this path may be stale
        # (wiped or rewritten location). DROP on an external (LOCATION)
        # table never touches the data files.
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        resuming = os.path.isdir(path)
        self.spark.sql(
            f"CREATE TABLE {name} (url STRING, depth INT, rnd INT) "
            f"USING PARQUET PARTITIONED BY (rnd) "
            f"CLUSTERED BY (url) INTO {buckets} BUCKETS "
            f"LOCATION '{path}'")
        if resuming:  # pick up partitions written by a prior session
            self.spark.sql(f"ALTER TABLE {name} RECOVER PARTITIONS")
        return name

    def _seen_store_write(self, rnd: int) -> None:
        """Mirror committed frontier round ``rnd`` into seen-store
        partition ``rnd`` (slim url+depth, bucket-shuffled once —
        O(round), not O(history)). INSERT OVERWRITE makes replays
        idempotent; called only AFTER the round's snapshot commit, so
        a crash between commit and mirror is healed by
        _seen_store_heal on the next resume."""
        if self._seen_name is None:
            return
        rdir = self._paths("frontier", rnd)
        sel_dirs = [os.path.join(rdir, d) for d in ("sel=b", "sel=d",
                                                    "sel=f")
                    if os.path.isdir(os.path.join(rdir, d))]
        if not sel_dirs:
            return
        rows = (self.spark.read.schema(self._frontier_schema)
                .parquet(*sel_dirs)
                .select("url", "depth")
                .repartition(self._seen_buckets, F.col("url")))
        view = f"{self._seen_name}_delta"
        rows.createOrReplaceTempView(view)
        self.spark.sql(
            f"INSERT OVERWRITE TABLE {self._seen_name} "
            f"PARTITION (rnd={rnd}) SELECT url, depth FROM {view}")

    def _seen_store_heal(self, completed_rounds: int) -> None:
        """Resume self-heal: rebuild any seen-store partition missing
        for a committed frontier round (crash window between a round's
        snapshot commit and its mirror write)."""
        if self._seen_name is None:
            return
        have = {int(r["partition"].split("=")[1]) for r in
                self.spark.sql(
                    f"SHOW PARTITIONS {self._seen_name}").collect()}
        for r in range(completed_rounds + 1):
            if r not in have:
                self._seen_store_write(r)

    def _seen_history(self, rnd: int):
        """The admission history for round ``rnd`` (frontier rounds
        0..rnd) as a DataFrame of (url, depth): the bucketed store
        when enabled (history side of every admit join is then
        exchange-free), else the plain frontier-table read."""
        if self._seen_name is not None:
            # the <= filter excludes a half-written partition rnd+1
            # left by a crashed prior attempt at the current round
            return (self.spark.table(self._seen_name)
                    .filter(F.col("rnd") <= rnd)
                    .select("url", "depth"))
        return (self.frontier_table.read(schema=self._frontier_schema)
                .select("url", "depth"))

    # ---- ingested-src seen store (image-ingest twin of the above) ----

    def _ensure_imgseen_store(self, buckets: int) -> str:
        """Bucketed catalog table over the ingested-src history — the
        image-ingest twin of _ensure_seen_store: one slim (src) copy
        of each committed images round, PARTITIONED BY round and
        CLUSTERED BY src, so the history side of the per-round
        src-seen anti-join (_ingest_images step 2) is exchange-free —
        only the round's new refs shuffle, never the 10^9+ previously
        ingested srcs. Derived index: the images SnapshotTable stays
        the source of truth and _imgseen_store_heal rebuilds any
        missing partition on resume, so exactness never depends on
        the store surviving."""
        import hashlib

        path = self._paths("imgseen_bucketed")
        digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
        name = f"imgseen_bkt_{digest}"
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        resuming = os.path.isdir(path)
        self.spark.sql(
            f"CREATE TABLE {name} (src STRING, rnd INT) "
            f"USING PARQUET PARTITIONED BY (rnd) "
            f"CLUSTERED BY (src) INTO {buckets} BUCKETS "
            f"LOCATION '{path}'")
        if resuming:
            self.spark.sql(f"ALTER TABLE {name} RECOVER PARTITIONS")
        return name

    def _imgseen_store_write(self, rnd: int) -> None:
        """Mirror committed images round ``rnd`` into store partition
        ``rnd`` (src only, bucket-shuffled once — O(round's new srcs),
        not O(history)). INSERT OVERWRITE keeps replays idempotent;
        called only AFTER the round's images snapshot commit, so a
        crash between commit and mirror is healed on resume."""
        if self._imgseen_name is None:
            return
        rdir = self._paths("images", rnd)
        if not os.path.isdir(rdir):
            return
        rows = (self.spark.read.schema("src string")
                .option("basePath", self._paths("images"))
                .parquet(rdir)
                .select("src")
                .repartition(self._seen_buckets, F.col("src")))
        view = f"{self._imgseen_name}_delta"
        rows.createOrReplaceTempView(view)
        self.spark.sql(
            f"INSERT OVERWRITE TABLE {self._imgseen_name} "
            f"PARTITION (rnd={rnd}) SELECT src FROM {view}")

    def _imgseen_store_heal(self) -> None:
        """Resume self-heal: rebuild any store partition missing for
        a committed images round (crash window between a round's
        images commit and its mirror write — or a wiped store dir)."""
        if self._imgseen_name is None or not self.images_table.exists():
            return
        have = {int(r["partition"].split("=")[1]) for r in
                self.spark.sql(
                    f"SHOW PARTITIONS {self._imgseen_name}").collect()}
        for m in self.images_table.lineage()[-1]["members"]:
            r = int(m.split("=")[1])
            if r not in have:
                self._imgseen_store_write(r)

    # ---- seeds ----

    def _seed_hosts(self) -> list[str]:
        rows = (self.seeds_raw
                .select(url_host(canonicalize_url(F.col("url"))).alias("h"))
                .filter(F.col("h") != "").distinct().collect())
        return [r["h"] for r in rows]

    def seed_claims(self) -> DataFrame:
        """Admissible seeds as depth-0 claims; duplicate canonical
        seeds keep the min seed_rank (first crawlPage wins, :556)."""
        s = self.seeds_raw.select(
            canonicalize_url(F.col("url")).alias("url"),
            F.col("seed_rank").cast("int").alias("seed_rank"))
        s = admit(s, "url", self.robots, self.allowed_hosts, self.cfg)
        return (s.groupBy("url")
                 .agg(F.min("seed_rank").alias("seed_rank"))
                 .select("url", _hex_prio(F.col("seed_rank")).alias("prio"),
                         F.lit(0).alias("depth"),
                         F.lit(None).cast("string").alias("parent_url"),
                         F.lit(-1).alias("link_index")))

    # ---- explore phase ----

    def _paths(self, name: str, rnd: int | None = None):
        if rnd is None:
            return os.path.join(self.ckpt, name)
        return os.path.join(self.ckpt, name, f"round={rnd:05d}")

    @staticmethod
    def _footer_rows(path: str) -> dict[str, int]:
        """Per-file row counts from parquet footers (driver-side, no
        Spark job): the written files ARE the partitions, so this is
        the per-partition lineage for free. Recursive (frontier rounds
        are partitioned by `sel`)."""
        import pyarrow.parquet as pq

        out: dict[str, int] = {}
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(root, f), path)
                    out[rel] = pq.ParquetFile(
                        os.path.join(root, f)).metadata.num_rows
        return out

    @staticmethod
    def _footer_min_depth(path: str) -> int | None:
        """Min of the `depth` column across a dir's parquet files,
        from row-group footer statistics (driver-side, no Spark job).
        This is the freeze bound: the previous batch's min depth."""
        import pyarrow.parquet as pq

        mn = None
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(os.path.join(root, f))
                try:
                    ci = pf.schema_arrow.names.index("depth")
                except ValueError:
                    continue
                md = pf.metadata
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is not None and st.has_min_max:
                        mn = st.min if mn is None else min(mn, st.min)
        return mn

    # ---- freeze-and-cursor deferral store (see _write_frontier) ----

    def _cursor_frames(self):
        import pandas as pd

        cur = pd.DataFrame({"host": pd.Series(dtype="str"),
                            "salt": pd.Series(dtype="int32"),
                            "salt_cap": pd.Series(dtype="int64"),
                            "consumed": pd.Series(dtype="int64"),
                            "frozen_total": pd.Series(dtype="int64")})
        fd = pd.DataFrame({"dir": pd.Series(dtype="str"),
                           "host": pd.Series(dtype="str"),
                           "salt": pd.Series(dtype="int32"),
                           "max_frank": pd.Series(dtype="int64")})
        return cur, fd

    def _cursor_paths(self, rnd: int) -> tuple[str, str]:
        d = os.path.join(self.ckpt, "cursor")
        return (os.path.join(d, f"round={rnd:05d}.parquet"),
                os.path.join(d, f"dirs={rnd:05d}.parquet"))

    @staticmethod
    def _parquet_rows(path: str) -> int:
        """Footer row count of a parquet file OR dir (no Spark job)."""
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            return sum(FrontierEngine._footer_rows(path).values())
        return pq.ParquetFile(path).metadata.num_rows

    @staticmethod
    def _parquet_cols(path: str) -> list[str]:
        """Schema column names of a parquet file OR dir, from the
        footer of one part (no Spark job)."""
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if f.endswith(".parquet"):
                    return pq.ParquetFile(
                        os.path.join(path, f)).schema_arrow.names
            return []
        return pq.ParquetFile(path).schema_arrow.names

    def _load_cursor(self, rnd: int) -> None:
        """Cursor state as persisted AFTER round ``rnd``'s frontier
        write (resume path; a pre-freeze checkpoint simply has no
        cursor files and no sel=f dirs — empty state is correct).

        Mode detection is by the PERSISTED STATE's shape, not by row
        count: the spilled-mode advance compacts the dirs registry to
        (dir, max_frank) while pandas mode always persists the full
        per-(dir, host, salt) registry — so a dirs parquet without a
        'host' column IS the spilled-mode marker. Row count alone was
        wrong both ways: a group-skewed bootstrap spill (one mega-host
        freezing >cap ROWS over few (host, salt) GROUPS) leaves a
        spilled cursor far below the cap, and raising
        cursor_spill_rows between runs shrinks the cap's meaning —
        either way a pandas-mode resume would merge the compact
        registry on ['host', 'salt'] and crash. The row-count check
        stays as a conservative fallback for pandas-written state that
        now exceeds the (possibly lowered) cap."""
        import pandas as pd

        cp, dp = self._cursor_paths(rnd)
        cur, fd = self._cursor_frames()
        spilled_state = (os.path.exists(dp)
                         and "host" not in self._parquet_cols(dp))
        if os.path.exists(cp) and (
                spilled_state
                or self._parquet_rows(cp) > self.cursor_spill_rows):
            self._cursor_spark = True
            self._cursor_sdf_path = cp
            self._cursor = None
            if os.path.exists(dp):
                fd = pd.read_parquet(dp)
                if "host" in fd.columns:   # pre-spill dirs registry
                    self._write_dirstats_pandas(fd)   # keep retirable
                    fd = (fd.groupby("dir", as_index=False)["max_frank"]
                          .max())
            else:
                fd = fd[["dir", "max_frank"]]
            self._fdirs = fd
            return
        if os.path.exists(cp):
            cur = pd.read_parquet(cp)
        if os.path.exists(dp):
            fd = pd.read_parquet(dp)
        self._cursor, self._fdirs = cur, fd

    def _save_cursor(self, rnd: int) -> None:
        cp, dp = self._cursor_paths(rnd)
        os.makedirs(os.path.dirname(cp), exist_ok=True)
        self._cursor.to_parquet(cp, index=False)
        self._fdirs.to_parquet(dp, index=False)

    def _dirstats_path(self, rel: str) -> str:
        """Per-freeze-dir group-stats parquet (dir, host, salt,
        max_frank) — the spilled mode's basis for PRECISE dir
        retirement: a dir is dead exactly when every group's consumed
        has reached its in-dir max frank. One file/dir so a retired
        dir's stats can be deleted outright."""
        name = rel.replace("/", "_").replace("=", "-")
        return os.path.join(self.ckpt, "cursor", "dirstats",
                            name + ".parquet")

    def _write_dirstats_pandas(self, fd) -> None:
        """Spill-transition export of the pandas dirs registry (which
        is per-(dir, host, salt)) into per-dir stats files, so dirs
        frozen BEFORE the spill stay precisely retirable after it."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if fd is None or not len(fd) or "host" not in fd.columns:
            return
        os.makedirs(os.path.join(self.ckpt, "cursor", "dirstats"),
                    exist_ok=True)
        for rel, g in fd.groupby("dir"):
            pq.write_table(pa.Table.from_pandas(
                g.assign(dir=rel)[["dir", "host", "salt", "max_frank"]],
                schema=pa.schema([
                    ("dir", pa.string()), ("host", pa.string()),
                    ("salt", pa.int32()), ("max_frank", pa.int64())]),
                preserve_index=False), self._dirstats_path(rel))

    def _retire_dirs_spark(self, fd, cp: str):
        """Spilled-mode dir retirement: join every live dir's group
        stats against the just-written cursor and keep a dir iff ANY
        of its groups still has unpopped franks (max_frank >
        consumed). One small Spark job, run only on pop rounds (the
        only rounds where consumed moves); dead dirs drop from the
        driver's live list AND their stats files are deleted (after
        the round's commit — see below), so both
        the list and the stats scan stay O(genuinely-live dirs) under
        perpetual freezing. Dirs with no stats file (pre-round-4
        checkpoints) are kept — conservative, backward compatible."""
        dirs = list(fd["dir"].unique())
        paths = {d: self._dirstats_path(d) for d in dirs}
        have = [p for p in paths.values() if os.path.exists(p)]
        if not have:
            return fd
        alive_rows = (self.spark.read.schema(
            "dir string, host string, salt int, max_frank long")
            .parquet(*have)
            .join(self.spark.read.parquet(cp)
                  .select("host", "salt", "consumed"),
                  ["host", "salt"], "left")
            .groupBy("dir")
            .agg(F.max(F.col("max_frank")
                       > F.coalesce("consumed", F.lit(0).cast("long")))
                 .alias("alive")).collect())
        dead = {r["dir"] for r in alive_rows if not r["alive"]}
        if not dead:
            return fd
        # deletion is DEFERRED past the round's snapshot commit: a
        # crash between an eager delete and commit_dir would roll the
        # registry back to a state listing dirs whose stats files are
        # gone, and the 'no stats file -> keep' rule would then pin
        # them live (and in every pop scan) forever. Queued paths are
        # flushed by _write_frontier right after commit; a crash in
        # between merely leaves unreferenced stats files on disk
        # (harmless: only registry-listed dirs are ever joined).
        self._dirstats_dead.extend(paths[d] for d in dead)
        return fd[~fd["dir"].isin(dead)].reset_index(drop=True)

    def _flush_dead_dirstats(self) -> None:
        """Post-commit deletion of retired dirs' stats files (see
        _retire_dirs_spark's crash-window note)."""
        for p in self._dirstats_dead:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)
        self._dirstats_dead = []

    def _maybe_spill_cursor(self, rnd: int) -> None:
        """One-way pandas → parquet transition once the cursor
        outgrows the driver cap (called right after a pandas-mode
        advance persisted round ``rnd``'s state, so the freshly
        written file IS the spilled store)."""
        if (self._cursor_spark or self._cursor is None
                or len(self._cursor) <= self.cursor_spill_rows):
            return
        cp, _dp = self._cursor_paths(rnd)
        self._cursor_spark = True
        self._cursor_sdf_path = cp
        self._cursor = None
        self._host_caps_ = None
        fd = self._fdirs
        self._write_dirstats_pandas(fd)
        self._fdirs = (fd.groupby("dir", as_index=False)["max_frank"]
                       .max() if fd is not None and len(fd)
                       else self._cursor_frames()[1][["dir", "max_frank"]])

    def _maybe_bootstrap_spill(self, rnd: int, counts: dict) -> None:
        """Pre-advance spill: when the round that is ABOUT to register
        its freezes would push the cursor past the cap, flip to
        spilled mode FIRST so the registration itself runs as the
        distributed advance — otherwise a single round that freezes
        10^8 hosts at once (a wide same-depth frontier) would still
        pay one unbounded pandas merge before _maybe_spill_cursor
        could react. The frozen ROW count from the footers is an upper
        bound on new groups, so the trigger is conservative (may spill
        one round early — harmless; the transition is one-way and
        semantics are pinned identical by the spill goldens)."""
        n_f = sum(v for k, v in counts.items() if k.startswith("sel=f"))
        cur_len = 0 if self._cursor is None else len(self._cursor)
        if cur_len + n_f <= self.cursor_spill_rows:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        cur = self._cursor if self._cursor is not None \
            else self._cursor_frames()[0]
        bp = os.path.join(self.ckpt, "cursor",
                          f"bootstrap={rnd:05d}.parquet")
        os.makedirs(os.path.dirname(bp), exist_ok=True)
        # explicit schema: an EMPTY pandas object column would infer
        # Arrow `null`, and Spark's join coercion on a null-typed key
        # miscasts the other side
        pq.write_table(pa.Table.from_pandas(cur, schema=pa.schema([
            ("host", pa.string()), ("salt", pa.int32()),
            ("salt_cap", pa.int64()), ("consumed", pa.int64()),
            ("frozen_total", pa.int64())]), preserve_index=False), bp)
        self._cursor_spark = True
        self._cursor_sdf_path = bp
        self._cursor = None
        self._host_caps_ = None
        fd = self._fdirs
        self._write_dirstats_pandas(fd)
        self._fdirs = (fd.groupby("dir", as_index=False)["max_frank"]
                       .max() if fd is not None and len(fd)
                       else self._cursor_frames()[1][["dir", "max_frank"]])

    def _host_salt_cap(self, host: str) -> int:
        """Driver twin of the plan's salt_cap expression (same
        formula, same truncation — asserted equal by the dense-frank
        invariant check in _advance_cursor)."""
        caps = getattr(self, "_host_caps_", None)
        if caps is None:
            caps = {r["host"]: self.cfg.host_cap(r["crawl_delay_ms"] or 0)
                    for r in self.robots.select(
                        "host", "crawl_delay_ms").collect()}
            self._host_caps_ = caps
        cap = caps.get(host, self.cfg.rate_limit)
        return cap // self.host_salts if cap >= self.host_salts else cap

    def _takes(self):
        """Per-(host, salt) cursor dim for this round's write: take =
        min(salt_cap, frozen_total - consumed), over EVERY group that
        has ever frozen — a drained group (take 0) must still ride
        along so a later re-freeze continues its frank sequence from
        ftot instead of restarting (the dense-frank invariant check
        in _advance_cursor caught exactly that). None when nothing
        has ever frozen (the hot no-deferral path pays zero
        overhead)."""
        import numpy as np

        cur = self._cursor
        if cur is None or not len(cur):
            return None
        m = cur["frozen_total"] > 0
        if not m.any():
            return None
        t = cur.loc[m, ["host", "salt", "consumed", "frozen_total"]].copy()
        t["take"] = np.minimum(
            cur.loc[m, "salt_cap"],
            cur.loc[m, "frozen_total"] - cur.loc[m, "consumed"])
        return t.rename(columns={"frozen_total": "ftot"})

    def _frozen_pops(self, takes) -> DataFrame:
        """This round's batch rows popped from the frozen store:
        frank in (consumed, consumed + take] per (host, salt). A scan
        over the LIVE freeze dirs (fully-consumed dirs were retired)
        with pushed global frank bounds — row groups are sorted by
        (host, salt, frank) at write, so footer stats prune the
        not-yet-reached tail — then a broadcast join against the
        cursor dim. No shuffle, no rewrite."""
        fd = self._fdirs
        live = sorted(fd["dir"].unique()) if fd is not None and len(fd) \
            else []
        kmin = int(takes["consumed"].min())
        kmax = int((takes["consumed"] + takes["take"]).max())
        dim = self.spark.createDataFrame(
            takes[["host", "salt", "consumed", "take"]])
        return (self.spark.read.schema(self._freeze_schema)
                .parquet(*[os.path.join(self.ckpt, d) for d in live])
                .filter((F.col("frank") > kmin) & (F.col("frank") <= kmax))
                .join(F.broadcast(dim), ["host", "salt"])
                .filter((F.col("frank") > F.col("consumed"))
                        & (F.col("frank") <= F.col("consumed")
                           + F.col("take")))
                .select("url", "depth", "host", "salt", "frank",
                        F.lit("b").alias("sel")))

    def _advance_cursor(self, rnd: int, takes, counts: dict) -> None:
        """Post-write cursor bookkeeping for round ``rnd``: consumed
        += take (pops are exactly take rows — franks are dense by
        construction), register newly frozen rows (one small agg job,
        only on rounds that actually froze), retire fully-consumed
        freeze dirs, persist for resume."""
        import pandas as pd

        cur = self._cursor if self._cursor is not None \
            else self._cursor_frames()[0]
        fd = self._fdirs if self._fdirs is not None \
            else self._cursor_frames()[1]
        if takes is not None:
            cur = cur.merge(takes[["host", "salt", "take"]],
                            on=["host", "salt"], how="left")
            cur["consumed"] = cur["consumed"] + cur["take"].fillna(0).astype(
                "int64")
            cur = cur.drop(columns=["take"])
        n_f = sum(v for k, v in counts.items() if k.startswith("sel=f"))
        if n_f:
            rel = os.path.join(f"frontier/round={rnd:05d}", "sel=f")
            fdir = os.path.join(self._paths("frontier", rnd), "sel=f")
            fc = (self.spark.read.schema(self._freeze_schema).parquet(fdir)
                  .groupBy("host", "salt")
                  .agg(F.count("*").alias("cnt"), F.max("frank").alias("mx"),
                       F.min("frank").alias("mn"))
                  .collect())
            fc = pd.DataFrame([(r["host"], r["salt"], r["cnt"], r["mx"],
                                r["mn"]) for r in fc],
                              columns=["host", "salt", "cnt", "mx", "mn"])
            cur = cur.merge(fc, on=["host", "salt"], how="outer")
            new = cur["consumed"].isna()
            if new.any():
                cur.loc[new, "consumed"] = 0
                cur.loc[new, "frozen_total"] = 0
                cur.loc[new, "salt_cap"] = [
                    self._host_salt_cap(h) for h in cur.loc[new, "host"]]
            froze = cur["cnt"].notna()
            # dense-frank invariant: the plan's frank base (ftot) must
            # equal the driver's frozen_total and the ranks must be
            # gapless — catches any driver/plan salt_cap drift
            bad = froze & ((cur["mn"] != cur["frozen_total"] + 1)
                           | (cur["mx"] != cur["frozen_total"]
                              + cur["cnt"]))
            if bad.any():
                raise AssertionError(
                    f"frozen rank not dense for "
                    f"{cur.loc[bad, ['host', 'salt']].values.tolist()}")
            cur.loc[froze, "frozen_total"] = cur.loc[froze, "mx"]
            fd = pd.concat(
                [fd, fc.assign(dir=rel)[["dir", "host", "salt", "mx"]]
                 .rename(columns={"mx": "max_frank"})],
                ignore_index=True)
            cur = cur.drop(columns=["cnt", "mx", "mn"])
        for c in ("salt_cap", "consumed", "frozen_total"):
            cur[c] = cur[c].astype("int64")
        cur["salt"] = cur["salt"].astype("int32")
        if len(fd):
            alive = (fd.merge(cur[["host", "salt", "consumed"]],
                              on=["host", "salt"], how="left")
                     .assign(live=lambda x: x["max_frank"]
                             > x["consumed"].fillna(0))
                     .groupby("dir")["live"].any())
            fd = fd[fd["dir"].isin(alive[alive].index)].reset_index(
                drop=True)
        self._cursor, self._fdirs = cur, fd
        self._save_cursor(rnd)

    # ---- spilled-cursor mode: the same cursor, Spark-side ----

    def _cursor_salt_cap_col(self):
        """Plan-side twin of _host_salt_cap for NEW groups entering a
        spilled cursor — byte-identical formula to the politeness
        plan's cap/salt_cap expressions (the dense-frank invariant
        cross-checks plan vs cursor every freezing round)."""
        cap = F.coalesce(
            F.when(F.col("crawl_delay_ms") > 0,
                   F.greatest(F.lit(1), F.least(
                       F.lit(self.cfg.rate_limit),
                       (F.lit(self.cfg.batch_window_ms)
                        / F.col("crawl_delay_ms")).cast("int")))),
            F.lit(self.cfg.rate_limit))
        return (F.when(cap >= self.host_salts,
                       (cap / self.host_salts).cast("int"))
                .otherwise(cap))

    def _takes_spark(self):
        """Spilled-mode twin of _takes: the per-(host, salt) take dim
        as a localCheckpointed DataFrame (three consumers: the mark
        join, the pop join, the advance) plus the driver-side scalars
        the round needs — ONE small agg job, O(1) rows collected.
        Returns (takes_sdf, stats); takes_sdf is None when nothing has
        ever frozen."""
        cur = self.spark.read.parquet(self._cursor_sdf_path)
        t = (cur.filter(F.col("frozen_total") > 0)
             .select("host", "salt", "consumed",
                     F.col("frozen_total").alias("ftot"),
                     F.least(F.col("salt_cap"),
                             F.col("frozen_total") - F.col("consumed"))
                     .cast("long").alias("take"))
             .localCheckpoint())
        pop = F.col("take") > 0
        row = t.agg(
            F.count("*").alias("n_groups"),
            F.coalesce(F.sum("take"), F.lit(0)).alias("total_take"),
            F.min(F.when(pop, F.col("consumed"))).alias("kmin"),
            F.max(F.when(pop, F.col("consumed") + F.col("take")))
            .alias("kmax")).collect()[0]
        if not row["n_groups"]:
            return None, {"total_take": 0}
        return t, {"total_take": int(row["total_take"]),
                   "kmin": (int(row["kmin"])
                            if row["kmin"] is not None else 0),
                   "kmax": (int(row["kmax"])
                            if row["kmax"] is not None else 0)}

    def _frozen_pops_spark(self, takes_sdf, stats) -> DataFrame:
        """Spilled-mode twin of _frozen_pops: same pushed global frank
        bounds + per-group range filter, but the cursor dim joins via
        shuffle-hash instead of broadcast (it no longer fits the
        driver by definition of the spill)."""
        fd = self._fdirs
        live = sorted(fd["dir"].unique()) if fd is not None and len(fd) \
            else []
        dim = (takes_sdf.filter(F.col("take") > 0)
               .select("host", "salt", "consumed", "take"))
        return (self.spark.read.schema(self._freeze_schema)
                .parquet(*[os.path.join(self.ckpt, d) for d in live])
                .filter((F.col("frank") > stats["kmin"])
                        & (F.col("frank") <= stats["kmax"]))
                .join(dim.hint("shuffle_hash"), ["host", "salt"])
                .filter((F.col("frank") > F.col("consumed"))
                        & (F.col("frank") <= F.col("consumed")
                           + F.col("take")))
                .select("url", "depth", "host", "salt", "frank",
                        F.lit("b").alias("sel")))

    def _advance_cursor_spark(self, rnd: int, takes_sdf,
                              counts: dict) -> None:
        """Spilled-mode twin of _advance_cursor: consumed += take,
        register new freezes (salt_cap from a robots join using the
        plan's exact formula), dense-frank invariant as a distributed
        count, next cursor parquet written by all cores. The dirs
        registry stays driver-side but COMPACT (one row per freeze
        dir, global max frank) — retirement becomes conservative
        (dir max ≤ global min consumed), which only delays retiring a
        dir, never breaks pops: frank-bound pushdown already prunes
        consumed row groups via footer stats."""
        import pandas as pd

        cur = self.spark.read.parquet(self._cursor_sdf_path)
        if takes_sdf is not None:
            cur = (cur.join(takes_sdf.select("host", "salt", "take")
                            .hint("shuffle_hash"), ["host", "salt"],
                            "left")
                   .withColumn("consumed",
                               (F.col("consumed")
                                + F.coalesce("take", F.lit(0)))
                               .cast("long"))
                   .drop("take"))
        n_f = sum(v for k, v in counts.items() if k.startswith("sel=f"))
        cp, dp = self._cursor_paths(rnd)
        fd = self._fdirs if self._fdirs is not None \
            else self._cursor_frames()[1][["dir", "max_frank"]]
        if n_f:
            rel = os.path.join(f"frontier/round={rnd:05d}", "sel=f")
            fdir = os.path.join(self._paths("frontier", rnd), "sel=f")
            fc = (self.spark.read.schema(self._freeze_schema)
                  .parquet(fdir)
                  .groupBy("host", "salt")
                  .agg(F.count("*").alias("cnt"),
                       F.max("frank").alias("mx"),
                       F.min("frank").alias("mn")))
            froze = F.col("cnt").isNotNull()
            ft0 = F.coalesce("frozen_total", F.lit(0).cast("long"))
            out = (cur.join(fc, ["host", "salt"], "full_outer")
                   .join(self.robots.select("host", "crawl_delay_ms")
                         .hint("shuffle_hash"), "host", "left")
                   .select(
                       "host", "salt",
                       F.coalesce(F.col("salt_cap"),
                                  self._cursor_salt_cap_col()
                                  .cast("long")).alias("salt_cap"),
                       F.coalesce("consumed", F.lit(0).cast("long"))
                       .alias("consumed"),
                       F.when(froze, F.col("mx")).otherwise(ft0)
                       .cast("long").alias("frozen_total"),
                       froze.alias("_froze"),
                       (froze & ((F.col("mn") != ft0 + 1)
                                 | (F.col("mx") != ft0 + F.col("cnt"))))
                       .alias("_bad"))
                   .localCheckpoint())
            row = out.agg(
                F.coalesce(F.sum(F.col("_bad").cast("long")),
                           F.lit(0)).alias("nbad"),
                F.max(F.when(F.col("_froze"), F.col("frozen_total")))
                .alias("dir_max")).collect()[0]
            if row["nbad"]:
                raise AssertionError(
                    f"frozen rank not dense for {int(row['nbad'])} "
                    f"(host, salt) groups at round {rnd}")
            (out.drop("_froze", "_bad")
             .write.mode("overwrite").parquet(cp))
            # per-dir group stats off the same checkpointed frame —
            # the retirement join's input (no re-agg of the freeze dir)
            (out.filter("_froze")
             .select(F.lit(rel).alias("dir"), "host", "salt",
                     F.col("frozen_total").alias("max_frank"))
             .write.mode("overwrite").parquet(self._dirstats_path(rel)))
            fd = pd.concat(
                [fd, pd.DataFrame({"dir": [rel],
                                   "max_frank": [int(row["dir_max"])]})],
                ignore_index=True)
        else:
            out = cur.localCheckpoint()
            out.write.mode("overwrite").parquet(cp)
        if takes_sdf is not None and len(fd):
            # pops are the only rounds where consumed moves, so only
            # they can kill a dir — precise retirement via the stats
            # join keeps the live-dir list bounded by the drain depth,
            # not the crawl length, under perpetual freezing
            fd = self._retire_dirs_spark(fd, cp)
        self._fdirs = fd
        self._cursor_sdf_path = cp
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        fd.to_parquet(dp, index=False)

    def _state(self) -> dict:
        """Resume state derived from the frontier table's snapshot
        manifest (NOT a side file): completed_rounds = highest
        committed frontier round; done = a crawl-complete marker
        snapshot exists. A round whose frontier dir was mid-write at
        a crash never committed, so resume replays it idempotently
        (round writes are mode=overwrite)."""
        lineage = self.frontier_table.lineage()
        rounds = [s["round"] for s in lineage if s["op"] == "round"]
        return {"completed_rounds": max(rounds) if rounds else 0,
                "done": any(s["op"] == "complete" for s in lineage)}

    def _politeness_mark(self, frontier: DataFrame,
                         takes_sdf: DataFrame | None = None,
                         bound: int | None = None,
                         broadcast_takes: bool = True) -> DataFrame:
        """Tag each ACTIVE frontier row with its politeness verdict for
        the NEXT round: sel='b' (within the per-host budget, fetch
        now), sel='f' (frozen — can never be overtaken, goes to the
        append-only store), or sel='d' (deferred, re-ranked next
        round). Mega-host skew: rank within (host, salt) with the
        budget split across salts so no task scans a whole host.

        ``takes_sdf`` (host, salt, take, ftot): how many slots this
        round's frozen-store pops already occupy per (host, salt) —
        they precede every active row in (depth, url) order, so the
        active budget shrinks to salt_cap - take. ``ftot`` is the
        frozen-rank base for NEW freezes. ``bound``: rows beyond the
        budget with depth <= bound are frozen (see _write_frontier for
        why that is exact). Column trees are built once (lazily) and
        reused — plan construction is per-round driver py4j chatter
        otherwise; the per-round bits (bound literal, takes join) are
        a handful of Column objects."""
        p = getattr(self, "_polite_plan", None)
        if p is None:
            cap_col = F.coalesce(
                F.when(F.col("crawl_delay_ms") > 0,
                       F.greatest(F.lit(1), F.least(
                           F.lit(self.cfg.rate_limit),
                           (F.lit(self.cfg.batch_window_ms) /
                            F.col("crawl_delay_ms")).cast("int")))),
                F.lit(self.cfg.rate_limit))
            # Salted per-host ranking for mega-host skew: only hosts
            # whose cap covers all salts are split (budget divides
            # exactly, stays an upper bound); small-cap hosts rank
            # unsalted.
            salt = (F.when(F.col("cap") >= self.host_salts,
                           F.pmod(url_hash(F.col("url")),
                                  F.lit(self.host_salts)))
                    .otherwise(F.lit(0)))
            salt_cap = (F.when(F.col("cap") >= self.host_salts,
                               (F.col("cap") / self.host_salts).cast("int"))
                        .otherwise(F.col("cap")))
            w = Window.partitionBy("host", "salt").orderBy("depth", "url")
            p = {
                "robots_b": F.broadcast(
                    self.robots.select("host", "crawl_delay_ms")),
                "cap": cap_col, "salt": salt, "salt_cap": salt_cap,
                "rn": F.row_number().over(w),
                "w_run": w.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow),
            }
            self._polite_plan = p
        df = (frontier.join(p["robots_b"], "host", "left")
              .withColumn("cap", p["cap"])
              .withColumn("salt", p["salt"].cast("int"))
              .withColumn("salt_cap", p["salt_cap"]))
        if takes_sdf is not None:
            # spilled-cursor mode joins the take dim via shuffle-hash:
            # past the spill cap it no longer fits a driver broadcast
            t = (F.broadcast(takes_sdf) if broadcast_takes
                 else takes_sdf.hint("shuffle_hash"))
            df = df.join(t, ["host", "salt"], "left")
            eff_cap = F.col("salt_cap") - F.coalesce("take", F.lit(0))
            base = F.coalesce("ftot", F.lit(0)).cast("long")
        else:
            eff_cap = F.col("salt_cap")
            base = F.lit(0).cast("long")
        df = df.withColumn("rn", p["rn"])
        if self.freeze_frontier and bound is not None:
            is_f = (F.col("rn") > eff_cap) & (F.col("depth") <= bound)
            # dense frozen rank: base + running count of f-rows in
            # (depth, url) order — same window spec as rn, one shuffle
            df = df.withColumn("runf",
                               F.sum(is_f.cast("long")).over(p["w_run"]))
            sel = (F.when(F.col("rn") <= eff_cap, F.lit("b"))
                   .when(is_f, F.lit("f")).otherwise(F.lit("d")))
            frank = F.when(is_f, base + F.col("runf")).cast("long")
        else:
            sel = (F.when(F.col("rn") <= eff_cap, F.lit("b"))
                   .otherwise(F.lit("d")))
            frank = F.lit(None).cast("long")
        return df.select("url", "depth", "host", "salt",
                         frank.alias("frank"), sel.alias("sel"))

    def _write_frontier(self, frontier: DataFrame, rnd: int) -> None:
        """Write a frontier round partitioned by the politeness
        verdict. Fusing the budget window into the frontier WRITE
        (instead of a separate cache+count selection job at the start
        of the next round) keeps a politeness round at the same three
        Spark jobs as a non-politeness one — the per-round fixed cost
        is the scaling-efficiency denominator, so every job counts.

        Scale note (write amplification): naively a deferred row is
        rewritten once per window it waits, so a host with queue depth
        Q and per-window cap c costs ~Q²/(2c) extra row-writes over
        its drain — quadratic, and a mega-host's drain would dominate
        I/O at 10^10 URLs. The FREEZE-AND-CURSOR store removes it
        while keeping the selection policy bit-identical:

          * a round's new arrivals always have depth >= 1 + (global
            min batch depth), and the global min pending depth is
            non-decreasing, so any pending row with depth <= the
            PREVIOUS round's batch-min-depth (``bound``, read from
            parquet footer stats — no job) can never be overtaken by
            a future arrival under the (depth, url) per-(host, salt)
            rank. Such rows are written ONCE to the round's sel=f
            partition with a dense per-(host, salt) rank ``frank``
            and never re-ranked or rewritten.
          * selection then pops take = min(remaining_frozen, salt_cap)
            rows per (host, salt) from the frozen store by cursor
            range — a scan + broadcast join with pushed frank bounds,
            NO shuffle — and fills the remaining salt_cap - take slots
            from the re-ranked ACTIVE set (new arrivals + unfrozen
            deferrals). Frozen rows all precede active rows in
            (depth, url) order (active rows have depth > bound by
            construction), so pops-then-picks equals the old
            full-re-rank selection row for row.
          * the cursor (host, salt, salt_cap, consumed, frozen_total)
            is a robots-cardinality dim — driver-held and broadcast
            exactly like the robots table, persisted per round for
            resume; fully-consumed freeze dirs are retired via
            per-dir max-frank stats kept alongside it.

        Freezing can also never interact with the depth-correcting
        admit: an improving candidate must beat the frozen depth, but
        arrivals are strictly deeper than every frozen row, so no
        candidate touching a frozen URL survives the anti-join."""
        if self.enforce_politeness:
            bound = None
            if self.freeze_frontier:
                if rnd == 0:
                    bound = 0     # seeds are depth 0; arrivals >= 1
                else:
                    bdir = os.path.join(self._paths("frontier", rnd - 1),
                                        "sel=b")
                    if os.path.isdir(bdir):
                        bound = self._footer_min_depth(bdir)
            takes, tstats = None, None
            takes_sdf = None
            if self._cursor_spark:
                takes_sdf, tstats = self._takes_spark()
            else:
                takes = self._takes()
                if takes is not None:
                    takes_sdf = self.spark.createDataFrame(
                        takes[["host", "salt", "take", "ftot"]])
            out = self._politeness_mark(
                frontier, takes_sdf, bound,
                broadcast_takes=not self._cursor_spark)
            if takes is not None and (takes["take"] > 0).any():
                out = out.unionByName(
                    self._frozen_pops(takes[takes["take"] > 0]))
            elif tstats is not None and tstats["total_take"] > 0:
                out = out.unionByName(
                    self._frozen_pops_spark(takes_sdf, tstats))
        else:
            takes, tstats, takes_sdf = None, None, None
            out = frontier.select("url", "depth", "host",
                                  F.lit("b").alias("sel"))
        (out.write.mode("overwrite").partitionBy("sel")
         .parquet(self._paths("frontier", rnd)))
        counts = self._footer_rows(self._paths("frontier", rnd))
        self._round_freeze = {
            "frozen": sum(v for k, v in counts.items()
                          if k.startswith("sel=f")),
            "popped": (int(takes["take"].sum()) if takes is not None
                       else tstats["total_take"] if tstats is not None
                       else 0)}
        if self.enforce_politeness and self.freeze_frontier:
            if not self._cursor_spark:
                self._maybe_bootstrap_spill(rnd, counts)
            if self._cursor_spark:
                self._advance_cursor_spark(rnd, takes_sdf, counts)
            else:
                self._advance_cursor(rnd, takes, counts)
                self._maybe_spill_cursor(rnd)
        # snapshot-commit the round (fast-append; per-partition
        # lineage from footers, no extra Spark job). This commit IS
        # the round's progress record — see _state().
        self.frontier_table.commit_dir(
            f"round={rnd:05d}", "round", counts,
            extra={"round": rnd})
        # the commit is durable — now retired dirs' stats files can go
        self._flush_dead_dirstats()

    def _read_round(self, rnd: int) -> tuple[DataFrame, DataFrame, int]:
        """(batch, deferred, n_batch) for a written frontier round —
        row count from parquet footers, no Spark job."""
        base = self._paths("frontier", rnd)
        bdir = os.path.join(base, "sel=b")
        ddir = os.path.join(base, "sel=d")
        n_batch = (sum(self._footer_rows(bdir).values())
                   if os.path.isdir(bdir) else 0)
        rd = self.spark.read.schema(self._frontier_schema)
        batch = (rd.parquet(bdir) if n_batch
                 else self.spark.createDataFrame(
                     [], self._frontier_schema))
        deferred = (rd.parquet(ddir)
                    if os.path.isdir(ddir) else batch.limit(0))
        return batch, deferred, n_batch

    def _pin_config_manifest(self) -> None:
        """Write the full CrawlConfig echo (incl. custom_headers and
        the reference-parity captcha/file-filter surface,
        types/crawler.ts:13-23) into the checkpoint ONCE at crawl
        start, and refuse to resume under a different config — a
        checkpoint replayed with changed max_depth/rate_limit/headers
        would silently mix two schedules' semantics into one exact
        crawl order."""
        mp = os.path.join(self.ckpt, "config.json")
        man = self.cfg.manifest()
        if os.path.exists(mp):
            with open(mp) as f:
                prev = json.load(f)
            if prev != man:
                diff = sorted(k for k in man if prev.get(k) != man[k])
                raise ValueError(
                    f"checkpoint {self.ckpt} was started under a "
                    f"different CrawlConfig (changed: {diff}); resume "
                    "with the original config or start a fresh "
                    "checkpoint")
        else:
            with open(mp, "w") as f:
                json.dump(man, f, indent=1, sort_keys=True)

    def explore(self, max_rounds: int = 10_000) -> None:
        """Run (or resume) the explore loop to completion. Each round:
        politeness-budgeted batch selection → fetch join → edge/image
        extraction → admission → frontier update → checkpoint."""
        os.makedirs(self.ckpt, exist_ok=True)
        self._pin_config_manifest()
        st = self._state()
        if st.get("done"):
            return
        rnd = st["completed_rounds"]
        if rnd > 0 and self.enforce_politeness and self.freeze_frontier:
            self._load_cursor(rnd)   # resume: cursor as of round rnd
        if rnd == 0:
            self._write_frontier(
                self.seed_claims()
                .withColumn("host", url_host(F.col("url")))
                .select("url", "depth", "host"), 0)
            self._seen_store_write(0)
        else:
            self._seen_store_heal(rnd)
            self._imgseen_store_heal()
        while rnd < max_rounds:
            t_round = time.time()
            steps: dict[str, float] = {}
            t_step = time.time()

            def tick(name: str) -> None:
                nonlocal t_step
                steps[name] = round(time.time() - t_step, 2)
                t_step = time.time()
            # batch/deferred come pre-split from the round's frontier
            # write (politeness fused there); counts from footers — the
            # selection costs ZERO Spark jobs at round start
            batch, deferred, n_batch = self._read_round(rnd)
            tick("select")
            if n_batch == 0:
                self.frontier_table.commit_marker("complete",
                                                  extra={"round": rnd})
                break
            # fetch = join against the synthetic web (deterministic
            # stand-in for a mapInPandas HTTP stage). URLs absent from
            # the web are dead links and need no row — everything
            # downstream (seen anti-join, finalize, errors) defaults an
            # attempted-but-never-materialized URL to 404 (the
            # attempted set IS the union of frontier rounds, so no
            # separate attempted table is written).
            # One web scan + one broadcast per round.
            web_slim = self._web_slim
            bsel = batch
            # join strategy by batch size: small rounds broadcast the
            # batch over the web scan (driver builds a small hash
            # relation); big rounds against a bucketed web use a
            # sort-merge join where ONLY the frontier side shuffles —
            # the driver-side broadcast build is serial and became the
            # round bottleneck at multi-million-row batches (measured:
            # fetch step 14.5s at local[8] vs 7.8s at local[32] on a
            # 6M-url round — barely scaling because the build doesn't).
            # No cache on the join output: caching web rows (links
            # arrays) thrashes the unified memory manager at high
            # thread counts.
            if self.web_table is not None and n_batch > self.bucket_join_min:
                fetched = self._wt_slim.hint("merge").join(bsel, "url",
                                                           "inner")
            elif n_batch <= 1_500_000:
                # small + tail rounds: broadcast the batch over the
                # plain web scan. One plan SHAPE for every such round,
                # so whole-stage codegen compiles once and is reused —
                # a per-round IN-pushdown variant was tried and lost:
                # each round's distinct url list forced a fresh InSet
                # codegen + the bucketed-scan fixed cost (measured 6 s
                # for a 1.7k-url tail round vs 0.7 s for this plan on a
                # 90k round). On a real cluster the fetch is an HTTP
                # mapInPandas over the batch (O(batch), no web scan) —
                # the scan here is the sandbox stand-in's cost, and it
                # is fully parallel.
                fetched = web_slim.join(F.broadcast(bsel), "url")
            else:
                fetched = bsel.join(web_slim, "url", "inner")
            if self.parse_from_html:
                # E1 in the loop: derive title/links/images from the
                # raw markup payload — narrow Arrow-batched stage, the
                # join output's partitioning rides through unchanged
                from ..operators.html_parse import parse_pages
                fetched = parse_pages(
                    fetched.select("url", "depth", "host", "status_code",
                                   "html"))
            fetched = fetched.select("url", "depth", "host", "status_code",
                                     "title", "links", "images")
            # fused fetch+extract+admit: the join output feeds ONE
            # generator pass producing page-marker rows (kind=page,
            # the old `fetched` table) and admitted child edges
            # (kind=edge) in a single write — no materialize+re-read
            # of the links arrays, one Spark job instead of two.
            # Parallelism comes from the join output's partitioning
            # (scan splits / buckets / shuffle partitions), so the
            # explode+canonicalize hot stage fans out to every core.
            # Admission (scheme/domain/robots on the child url) is
            # fused in (broadcast robots join + native predicates, no
            # shuffle): the checkpointed edge set is admissible-by-
            # construction, so neither the candidate step below nor
            # the resolve phase re-scans 10^10 edge strings through
            # the admission regexes a second time.
            combined = self._extract_plan.apply(fetched)
            (combined.write.mode("overwrite").partitionBy("kind")
             .parquet(self._paths("crawl", rnd)))
            # commit the crawl round BEFORE the next frontier round:
            # resume replays any round whose frontier commit is
            # missing, so the crawl commit must never lag it
            crawl_counts = self._footer_rows(self._paths("crawl", rnd))
            self.crawl_table.commit_dir(f"round={rnd:05d}", "round",
                                        crawl_counts,
                                        extra={"round": rnd})
            edge_dir = os.path.join(self._paths("crawl", rnd), "kind=edge")
            if os.path.isdir(edge_dir):
                edges = (self.spark.read.schema(self._crawl_schema)
                         .parquet(edge_dir))
            else:  # round fetched pages but admitted no links
                edges = self.spark.createDataFrame([], self._crawl_schema)
            tick("fetch_extract")
            img_metrics = {}
            if self.ingest_images:
                img_metrics = self._ingest_images(rnd, n_batch)
                tick("images")

            # candidate admission for the NEXT frontier (BFS depth
            # cap). Parent depth rides along on the edge rows, so no
            # join back to the batch is needed; edges are already
            # admitted, so this is a pure groupBy.
            cand = (edges
                    .select(F.col("child_url").alias("url"),
                            (F.col("depth") + 1).alias("depth"),
                            F.col("child_host").alias("host"))
                    .filter(F.col("depth") <= self.cfg.max_depth)
                    .groupBy("url").agg(F.min("depth").alias("depth"),
                                        F.first("host").alias("host")))
            # THE J1 anti-join: exclude everything already attempted OR
            # currently deferred. The union of frontier rounds 0..rnd
            # is exactly that set (every frontier row is either
            # attempted in its round or carried forward as deferred),
            # so ONE partition-discovered read of the frontier dir
            # replaces both the attempted table and a second
            # deferred anti-join. Reading from checkpoint also
            # truncates lineage across rounds.
            cand = cand.select("url", "depth", "host")
            # one read of the committed admission history per round,
            # shared by every variant below: the bucketed seen-store
            # when enabled (history side of the joins below is then
            # exchange-free — see _ensure_seen_store), else a
            # manifest-driven frontier read with an explicit schema
            # (skips per-dir footer inference that grows O(rounds) —
            # an incremental union-DF cache was tried and LOST: a
            # 16-deep union of single-dir scans re-analyzes slower
            # than one multi-dir scan lists)
            frontier_hist = self._seen_history(rnd)
            all_seen = frontier_hist.select("url")
            if self.enforce_politeness:
                # Depth-correcting admit. Under politeness a URL can be
                # FIRST admitted at a non-minimal depth: its shallow
                # parent sat deferred while a deeper path found it.
                # A plain anti-join freezes that inflated depth, and the
                # max_depth cap then silently truncates the URL's
                # subtree (descendants the DFS resolve legally visits
                # are never fetched). Fix: keep a candidate iff it
                # strictly improves on the best seen depth, re-fetching
                # the page so expansion resumes from the shallower
                # depth. Depths are non-negative ints and strictly
                # decrease per re-admit ⇒ terminates. Without
                # politeness, BFS admits every URL at minimal depth on
                # first sight, so the cheaper plain anti-join below
                # stays exact. The optional bloom pre-filter composes:
                # certain-new candidates skip the exact join; only
                # maybe-seen ones pay the depth check.
                seen_best = (frontier_hist.groupBy("url")
                             .agg(F.min("depth").alias("seen_depth")))
                if self.use_bloom or self.use_cuckoo:
                    if self.use_bloom:
                        from ..operators.bloom import (build_bloom as _build,
                                                       bloom_maybe_seen
                                                       as _maybe)
                    else:
                        from ..operators.cuckoo import (build_cuckoo
                                                        as _build,
                                                        cuckoo_maybe_seen
                                                        as _maybe)

                    seen_h = all_seen.withColumn("url_hash",
                                                 url_hash(F.col("url")))
                    flagged = _maybe(
                        cand.withColumn("url_hash", url_hash(F.col("url"))),
                        _build(seen_h))
                    certain_new = (flagged.filter(~F.col("maybe_seen"))
                                   .drop("maybe_seen", "bucket_id",
                                         "url_hash"))
                    maybe = (flagged.filter(F.col("maybe_seen"))
                             .drop("maybe_seen", "bucket_id", "url_hash"))
                else:
                    certain_new, maybe = None, cand
                improved = (maybe.join(seen_best, "url", "left")
                            .filter(F.col("seen_depth").isNull()
                                    | (F.col("depth") < F.col("seen_depth")))
                            .drop("seen_depth"))
                new_cand = (improved if certain_new is None
                            else certain_new.unionByName(improved))
            elif self.use_bloom or self.use_cuckoo:
                # at 10^10 scale: the pre-filter kills the bulk of
                # already-seen candidates before the exact anti-join
                if self.use_bloom:
                    from ..operators.bloom import (
                        build_bloom as _build,
                        seen_anti_join_with_bloom as _anti)
                else:
                    from ..operators.cuckoo import (
                        build_cuckoo as _build,
                        seen_anti_join_with_cuckoo as _anti)

                seen_h = all_seen.withColumn("url_hash",
                                             url_hash(F.col("url")))
                new_cand = _anti(
                    cand.withColumn("url_hash", url_hash(F.col("url"))),
                    seen_h, _build(seen_h),
                    confirm_col="url").drop("url_hash")
            else:
                new_cand = cand.join(all_seen, "url", "left_anti")
            new_frontier = (
                deferred.unionByName(new_cand)
                .groupBy("url").agg(F.min("depth").alias("depth"),
                                    F.first("host").alias("host")))
            self._write_frontier(new_frontier, rnd + 1)
            tick("admit")
            if self._seen_name is not None:
                self._seen_store_write(rnd + 1)
                tick("seen_mirror")
            # per-round metrics + per-partition lineage straight from
            # the parquet footers (no Spark job; one footer per
            # written partition, counts sum to the edge total)
            part_counts = {k: v for k, v in crawl_counts.items()
                           if k.startswith("kind=edge")}
            n_edges = sum(part_counts.values())
            # actual fetched rows (dead links produce no fetched row
            # under the inner-join fetch, so fetched < scheduled)
            n_fetched = sum(v for k, v in crawl_counts.items()
                            if k.startswith("kind=page"))
            tick("lineage")
            metrics = dict(round=rnd, scheduled=n_batch, fetched=n_fetched,
                           edges=n_edges,
                           wall_sec=round(time.time() - t_round, 2),
                           partitions=[[i, int(n)] for i, n in
                                       enumerate(part_counts.values())],
                           steps=steps,
                           **img_metrics,
                           **getattr(self, "_round_freeze", {}))
            with open(os.path.join(self.ckpt, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(metrics) + "\n")
            # no separate state write: _write_frontier's snapshot
            # commit of round rnd+1 IS the progress record
            rnd += 1

    # ---- resolve phase ----

    def resolve(self, max_iters: int | None = None,
                strategy: str = "skeleton",
                n_shards: int = 4,
                shard_procs: int | None = None) -> DataFrame:
        """Exact DFS-claim resolution over the explored edge set.
        Returns the visits DataFrame: (url, url_hash, host, depth,
        parent_url, link_index, prio, status_code, visit_rank,
        batch_id) — equal row-for-row to the oracle simulator.

        strategy="skeleton" (default): lexicographic-first claiming is
        P-complete — no parallel shortcut reproduces the reference's
        sequential DFS exactly — so the engine keeps everything
        EXPENSIVE distributed (fetch, parse, canonicalize, admission,
        dedup: all upstream of here) and resolves ordering over a
        COMPACT skeleton: edges dictionary-encoded to int64 url-hashes
        JVM-side (~12 bytes/edge on disk), pulled via Arrow, claimed
        with an integer explicit-stack DFS (~20 ns/edge in C). The
        sweep is the fast path whenever the dense-id skeleton fits the
        driver (~200 GB at 10^10 edges).

        strategy="sharded": the out-of-core exact path — seeds split
        into contiguous seed-rank shards, each shard's reachable
        subgraph swept alone with claim state carried across shards
        (see _resolve_sharded). Bounds driver memory by the largest
        shard's edge set instead of the web; claims identical
        row-for-row to "skeleton".

        strategy="fixpoint": the distributed Jacobi full-recompute
        fixpoint (provably convergent — the k-th smallest true claim
        is stable after round k — but worst-case linear rounds;
        measured 155 rounds on a 50k-page random web). Kept for
        cross-checking (tests assert both agree) and because it is
        the implemented exact path past driver memory. Each round it
        records a CERTIFIED-FINALIZED PREFIX in `resolve_certified`
        — claims with prio strictly below the smallest prio that
        changed this round are provably final (see the in-loop
        argument) — so a streaming consumer can emit the visit order
        incrementally while the tail converges."""
        # per-call step timings: RESET here so two consecutive
        # resolve() calls on one engine report disjoint,
        # non-accumulating breakdowns (the bug class round-4 ADVICE
        # flagged twice; pinned by
        # test_resolve_timings_disjoint_per_call)
        self.timings = {}
        # edges are admissible-by-construction (admission is fused
        # into the explore-side edge write — scheme/domain/robots run
        # exactly once per edge, there), so resolve needs no second
        # pass through the admission regexes.
        edges = (self.crawl_table.read(with_partition_columns=True,
                                       schema=self._crawl_schema)
                 .filter(F.col("kind") == "edge")
                 .select("parent_url", "link_index", "child_url"))
        seeds = self.seed_claims().localCheckpoint()
        if strategy == "skeleton":
            claims = self._resolve_skeleton(edges, seeds)
        elif strategy == "sharded":
            claims = self._resolve_sharded(edges, seeds, n_shards=n_shards,
                                           shard_procs=shard_procs)
        else:
            claims = self._resolve_fixpoint(edges.localCheckpoint(), seeds,
                                            max_iters)
        return self._finalize_visits(claims)

    def _encode_skeleton(self, edges: DataFrame, seeds: DataFrame):
        """Distributed dictionary-encode of the explored edge set into
        the all-numeric skeleton: a dense-id node table (nodes_path)
        and the encoded (p_id, i, c_id) edge table (skel_path), both
        written by all cores. Shared by the skeleton and sharded
        resolve strategies. Returns (nodes_path, skel_path, nodes_id
        DataFrame)."""
        self.timings = getattr(self, "timings", {})
        t0 = time.time()
        # all-numeric skeleton (20 bytes/edge): host identity and
        # politeness are NOT shipped — only the visit ORDER is
        # inherently sequential; the per-host batch schedule is a
        # host-partitioned (distributed) window afterwards. Strings
        # stay JVM-side (string hashes made this collect the dominant
        # resolve cost).
        # Handoff: the grouping runs DISTRIBUTED — hash-partition by
        # parent + sortWithinPartitions(p, i) (the kernel needs each
        # parent's children contiguous in link order, NOT a global
        # sort, so this skips orderBy's range-sampling job and can't
        # skew) — written to parquet by all cores, then read back with
        # a thread pool. A single-stream driver toPandas() collect
        # here was 61 s of the committed 32-core bench (the dominant
        # resolve cost); the parallel write+read path scales with
        # cores on both sides.
        skel_path = self._paths("skeleton")
        npart = max(self.spark.sparkContext.defaultParallelism, 4)
        # node table: distinct node hashes (attempted urls ∪ seeds —
        # every claimable node: a child the DFS can claim at depth ≤
        # max_depth has BFS depth ≤ its DFS depth, so BFS admitted it
        # into a frontier round; edges to deeper children are dead and
        # marked id -1 below) with a DENSE int32 id assigned
        # DISTRIBUTED (a DataFrame zipWithIndex — no RDD-API
        # round-trip through Python serialization). Dense ids keep the
        # sweep's random-access state at ~8 bytes/node (L3-resident)
        # instead of an open-addressing hash walk, which was
        # memory-bound at bench scale.
        nodes_path = self._paths("nodes")
        # ONE job: distinct → hash-partition by h → partition-local
        # sort → store (h, mono) where mono =
        # monotonically_increasing_id = (pid << 33) | local ordinal,
        # assigned in the sorted row order. The dense id = per-pid
        # offset + ordinal is then DERIVED — offsets come from parquet
        # footers (_node_offsets, zero jobs), and the id projection
        # fuses into each consumer's plan. This replaces a 3-job
        # sequence (localCheckpoint pinning pids, a per-pid count
        # collect, a windowed re-write) with identical resulting ids.
        (self.frontier_table.read(schema=self._frontier_schema)
         .select(url_hash(F.col("url")).alias("h"))
         .unionByName(seeds.select(url_hash(F.col("url")).alias("h")))
         .distinct()
         .repartition(npart, "h")
         .sortWithinPartitions("h")
         .withColumn("mono", F.monotonically_increasing_id())
         .write.mode("overwrite").parquet(nodes_path))
        offs, _ = _node_offsets(nodes_path)
        off_df = self.spark.createDataFrame(
            list(offs.items()) or [(0, 0)], "pid int, off long")
        nodes_id = (self.spark.read.parquet(nodes_path)
                    .withColumn("pid", F.shiftrightunsigned("mono", 33)
                                .cast("int"))
                    .join(F.broadcast(off_df), "pid")
                    .select("h", (F.col("off")
                                  + F.col("mono").bitwiseAND(_MONO_MASK))
                            .cast("int").alias("id")))
        self.timings["nodes_write"] = round(time.time() - t0, 2)
        t0 = time.time()
        # skeleton: edges dictionary-encoded to dense int32 ids
        # DISTRIBUTED (two shuffle-hash joins against the node table —
        # round 1 encoded on the driver with a C bsearch pass, which
        # was the largest core-count-independent resolve step at bench
        # scale: ~56-71 s at 80M edges). Children absent from the node
        # table are BFS-unreachable within the depth cap, so the DFS
        # can never claim them either: dead edges, id -1. A parent
        # absent from the table cannot happen for engine-written edges
        # (every fetched parent was a frontier row); the inner join
        # drops such rows instead of corrupting a CSR slot. 12 B/edge
        # on disk, parent-contiguous link-sorted within each part file
        # — exactly the layout the CSR pass needs.
        (edges.select(
            url_hash(F.col("parent_url")).alias("p"),
            F.col("link_index").alias("i"),
            url_hash(F.col("child_url")).alias("c"))
            .join(nodes_id.hint("shuffle_hash")
                  .select(F.col("h").alias("c"), F.col("id").alias("c_id")),
                  "c", "left")
            .join(nodes_id.hint("shuffle_hash")
                  .select(F.col("h").alias("p"), F.col("id").alias("p_id")),
                  "p", "inner")
            .select("p_id", "i",
                    F.coalesce("c_id", F.lit(-1)).cast("int").alias("c_id"))
            .repartition(npart, "p_id")
            .sortWithinPartitions("p_id", "i")
            .write.mode("overwrite").parquet(skel_path))
        self.timings["skeleton_write"] = round(time.time() - t0, 2)
        return nodes_path, skel_path, nodes_id

    def _resolve_skeleton(self, edges: DataFrame,
                          seeds: DataFrame) -> DataFrame:
        """Exact DFS claiming over the int64-encoded skeleton.

        The lexicographic-heap formulation of round 1 is equivalent to
        plain DFS preorder (the priority vectors have the prefix
        property, so heap order ≡ visit stack order) — but the heap
        built an O(depth)-char priority STRING per edge push, which
        dominated the sweep. This version sweeps with an integer
        explicit-stack DFS (no strings, no heap, no per-edge
        allocation beyond one tuple); priority vectors are emitted
        vectorized by the claims write (see _write_claims)."""
        nodes_path, skel_path, nodes_id = self._encode_skeleton(edges, seeds)
        t0 = time.time()
        import pyarrow as pa

        skel_t = _read_parquet_dir(
            skel_path, {"p_id": pa.array([], pa.int32()),
                        "i": pa.array([], pa.int32()),
                        "c_id": pa.array([], pa.int32())})
        self.timings["skeleton_read"] = round(time.time() - t0, 2)
        t0 = time.time()
        import numpy as np

        # node COUNT only — the id→hash mapping itself stays
        # distributed (claims are written as dense ids and rejoined
        # to urls in _claims_to_visits; the former driver-resident
        # 8 B/node id→hash array was ~80 GB at the 10^10-URL posture)
        _, n_nodes = _node_offsets(nodes_path)
        # seeds sorted by prio string ≡ seed_rank order: the oracle
        # crawls each seed's subtree to completion before the next;
        # ids come from the same node table the edges were encoded
        # against (tiny broadcast join, one collect)
        seed_rows = sorted(
            seeds.select(url_hash(F.col("url")).alias("h"), "prio")
            .join(nodes_id, "h").collect(),
            key=lambda r: r["prio"])
        self.timings["seed_collect"] = round(time.time() - t0, 2)
        t0 = time.time()

        from ..core.dfs_kernel import csr_runlength, sweep

        p_ids = skel_t["p_id"].to_numpy(zero_copy_only=False)
        i_sorted = skel_t["i"].to_numpy(zero_copy_only=False)
        c_id = np.ascontiguousarray(
            skel_t["c_id"].to_numpy(zero_copy_only=False), np.int32)
        # CSR bounds over the parent-contiguous id column: one linear
        # C pass (kernel csr_bounds; numpy fallback pinned equal in
        # tests). Since the encode ran distributed in Spark, this is
        # the only driver-side pass over the edge set before the sweep
        uniq_p_id, bounds = csr_runlength(p_ids)
        seed_id = np.array([int(r["id"]) for r in seed_rows], np.int32)
        del skel_t, p_ids
        self.timings["csr_pass"] = round(time.time() - t0, 2)
        t0 = time.time()

        # The sweep claims in EXACT visit order, so the global visit
        # rank falls out for free (no global sort afterwards). The
        # kernel (core/dfs_kernel.py) is the engine's one sequential
        # constant: C when a toolchain exists (~20 ns/edge), Python
        # fallback otherwise — both pinned equal in tests.
        n, out_id, out_depth, out_parent_rank, out_li, impl = sweep(
            c_id, i_sorted, uniq_p_id, bounds, seed_id, n_nodes,
            self.cfg.max_depth)
        self.timings["dfs_sweep"] = round(time.time() - t0, 2)
        self.timings["sweep_impl"] = impl
        claims_path = self._paths("claims")
        shutil.rmtree(claims_path, ignore_errors=True)
        t0 = time.time()
        self._write_claims(claims_path, out_id, out_depth, out_parent_rank,
                           out_li, rank0=0, part=0,
                           seed_prio_by_id={int(r["id"]): r["prio"].encode()
                                            for r in seed_rows})
        self.timings["claims_write"] = round(time.time() - t0, 2)
        return self._claims_to_visits(claims_path, seeds, nodes_id)

    def _resolve_sharded(self, edges: DataFrame, seeds: DataFrame,
                         n_shards: int = 4,
                         shard_procs: int | None = None) -> DataFrame:
        """Seed-branch-sharded exact resolve — the out-of-core path
        past driver memory that the skeleton strategy's docstring
        promises. Claims under seed rank r never depend on later seeds
        (the reference crawls each seed's subtree to completion before
        the next, crawler-engine.ts:556,673-695), so the sweep pages
        branch-by-branch: seeds are split into n_shards contiguous
        seed-rank ranges, each shard's edge subgraph (everything
        BFS-reachable from the shard's seeds within max_depth — a
        conservative superset of what its DFS can traverse, computed
        DISTRIBUTED by ≤max_depth labeled frontier joins) is collected
        and swept alone, with the claim state (a 1-bit/node claimed
        bitmap) persisting across shards so later shards skip earlier
        claims exactly like the global sweep would. Driver memory is
        bounded by the LARGEST SHARD's edge set (+ the bitmap — the
        only remaining node-indexed driver state, ~1.25 GB at 10^10
        nodes; claims are written as dense ids and the id→url mapping
        rides the distributed rejoin in _claims_to_visits), not the
        web: at 10^10 edges the global skeleton is ~200 GB of driver
        RAM while 64-way sharding needs only the largest branch. The trade is duplicated edge labeling where
        shard subgraphs overlap — distributed compute paid to bound
        sequential memory. Produces claims row-for-row equal to
        strategy='skeleton' (pinned in tests/test_crawl_golden.py)."""
        import numpy as np
        import pyarrow as pa

        from ..core.dfs_kernel import SweepState, _load_lib, csr_runlength

        nodes_path, skel_path, nodes_id = self._encode_skeleton(edges, seeds)
        t0 = time.time()
        npart = max(self.spark.sparkContext.defaultParallelism, 4)
        # hash-partition the encoded edge set by parent ONCE and pin it
        # in memory (~12 B/edge): every BFS level below joins on p_id,
        # so the partitioning is computed once and each level's join
        # shuffles only the (much smaller) frontier side — re-reading
        # the parquet per level re-shuffled all edges every level,
        # which made shard labeling cost more than the resolve itself
        enc = (self.spark.read.parquet(skel_path)
               .repartition(npart, "p_id").persist())
        seed_rows = sorted(
            seeds.select(url_hash(F.col("url")).alias("h"), "prio")
            .join(nodes_id, "h").collect(),
            key=lambda r: r["prio"])
        n_seeds = len(seed_rows)
        n_shards = max(1, min(n_shards, n_seeds))
        shard_seed_ids: dict[int, list[int]] = {}
        for i, r in enumerate(seed_rows):
            s = i * n_shards // n_seeds
            shard_seed_ids.setdefault(s, []).append(int(r["id"]))
        self.timings["seed_collect"] = round(time.time() - t0, 2)
        t0 = time.time()
        # per-shard reachability labels: multi-source BFS over the
        # encoded edges, one frontier join per depth level, with the
        # shard set of each node carried as a BITMASK (W = ceil(n/64)
        # long words) instead of (shard, node) rows — a node reachable
        # from k shards is ONE frontier row, not k, so the per-level
        # join/agg intermediates shrink by up to n_shards× where shard
        # subgraphs overlap (the duplication only reappears in the
        # final per-shard skeleton files, where it is the point).
        n_words = (n_shards + 63) // 64
        mask_cols = [f"m{w}" for w in range(n_words)]
        mask_ddl = ", ".join(f"{c} long" for c in mask_cols)

        def _seed_row(shard: int, node: int) -> tuple:
            masks = [0] * n_words
            bit = 1 << (shard % 64)
            # bit 63 is the sign bit of a Spark LongType — wrap to the
            # signed representation (bitwise ops are sign-agnostic)
            masks[shard // 64] = bit - (1 << 64) if bit >= (1 << 63) else bit
            return (node, *masks)

        # per-level frontiers cross a parquet write/read barrier
        # (level dirs under the checkpoint), NOT localCheckpoint: each
        # level's plan joins two subtrees that both descend from the
        # previous level (cand via `frontier`, seen via the cumulative
        # read), and Spark 4.1 leaks driver-side work that doubles per
        # generation when such diamonds chain through checkpoints (see
        # operators/cluster.py:connected_components, where it was
        # measured). File-scan-rooted rounds stay constant-cost, and
        # the cumulative `seen` becomes ONE multi-dir scan instead of
        # a per-level union of checkpoint frames.
        label_dir = self._paths("shard_label")
        if os.path.isdir(label_dir):
            shutil.rmtree(label_dir)

        def _level_path(lv: int) -> str:
            return os.path.join(label_dir, f"level={lv:03d}")

        (self.spark.createDataFrame(
            [_seed_row(s, i) for s, ids in shard_seed_ids.items()
             for i in ids],
            f"node int, {mask_ddl}")
         .write.parquet(_level_path(0)))
        level_paths = [_level_path(0)]
        frontier = self.spark.read.parquet(*level_paths)

        def _bit_or_all(df: DataFrame, key: str) -> DataFrame:
            return df.groupBy(key).agg(
                *[F.bit_or(c).alias(c) for c in mask_cols])

        new_bits = [F.col(c).bitwiseAND(
            F.bitwise_not(F.coalesce(F.col(f"s_{c}"), F.lit(0)
                                     .cast("long"))))
            for c in mask_cols]
        for lv in range(1, int(self.cfg.max_depth) + 1):
            seen = _bit_or_all(self.spark.read.parquet(*level_paths),
                               "node").select(
                "node", *[F.col(c).alias(f"s_{c}") for c in mask_cols])
            cand = _bit_or_all(
                enc.join(frontier.hint("shuffle_hash")
                         .withColumnRenamed("node", "p_id"), "p_id")
                   .filter(F.col("c_id") >= 0)
                   .withColumnRenamed("c_id", "node"), "node")
            (cand.join(seen, "node", "left")
             .select("node", *[nb.alias(c) for nb, c
                               in zip(new_bits, mask_cols)])
             .filter(" or ".join(f"{c} != 0" for c in mask_cols))
             .write.parquet(_level_path(lv)))
            if sum(self._footer_rows(_level_path(lv)).values()) == 0:
                break
            level_paths.append(_level_path(lv))
            frontier = self.spark.read.parquet(_level_path(lv))
        reach_u = self.spark.read.parquet(*level_paths)
        # unfold the masks into (node, shard) only now, for the
        # shard-partitioned write
        arr = "array(" + ", ".join(mask_cols) + ")"
        shards_of = (f"filter(sequence(0, {n_shards - 1}), s -> "
                     f"(element_at({arr}, cast(s div 64 as int) + 1)"
                     f" & shiftleft(1L, s % 64)) != 0)")
        reach = (_bit_or_all(reach_u, "node")
                 .select("node", F.explode(F.expr(shards_of))
                         .alias("shard")))
        sharded_path = self._paths("skeleton_sharded")
        # shard-partitioned skeleton: within a shard dir every parent
        # is contiguous and link-sorted (partition key includes p_id),
        # which is all the per-shard CSR pass needs
        (enc.join(reach.withColumnRenamed("node", "p_id"), "p_id")
            .repartition(npart, "shard", "p_id")
            .sortWithinPartitions("shard", "p_id", "i")
            .write.mode("overwrite").partitionBy("shard")
            .parquet(sharded_path))
        enc.unpersist()
        self.timings["shard_label"] = round(time.time() - t0, 2)
        t0 = time.time()
        empty = {"p_id": pa.array([], pa.int32()),
                 "i": pa.array([], pa.int32()),
                 "c_id": pa.array([], pa.int32())}

        def _load_shard(s: int):
            """Read + CSR-prepare one shard's skeleton (pyarrow and
            csr_runlength release the GIL, so this overlaps the C
            sweep of the previous shard when run on the prefetch
            thread)."""
            sdir = os.path.join(sharded_path, f"shard={s}")
            skel_t = (_read_parquet_dir(sdir, empty)
                      if os.path.isdir(sdir) else pa.table(empty))
            p_ids = skel_t["p_id"].to_numpy(zero_copy_only=False)
            i_sorted = skel_t["i"].to_numpy(zero_copy_only=False)
            c_id = np.ascontiguousarray(
                skel_t["c_id"].to_numpy(zero_copy_only=False), np.int32)
            uniq_p_id, bounds = csr_runlength(p_ids)
            return c_id, i_sorted, uniq_p_id, bounds

        order = sorted(shard_seed_ids)
        if shard_procs is None:
            # auto-gate: the parallel path pays fork+IPC per shard, so
            # it only engages when the labeled edge set is big enough
            # that per-shard sweeps are seconds, not milliseconds
            n_labeled = sum(self._footer_rows(sharded_path).values())
            # overlap gate: the optimistic parallel path redoes each
            # shard's FULL sweep speculatively, so it only wins when
            # shard subgraphs are (near-)disjoint — sum(shard rows) /
            # global skeleton rows ≈ 1. On a densely cross-linked web
            # every seed branch reaches most of the graph (measured on
            # the 16M bench web: 8 shards of ~58M rows each over an
            # 80M-edge skeleton, parallel sweep 83 s vs sequential
            # 9 s), so heavy overlap falls back to the sequential
            # skip-claimed sweep. Both counts come from parquet
            # footers — no Spark job.
            n_skel = sum(self._footer_rows(skel_path).values())
            overlap = n_labeled / max(1, n_skel)
            shard_procs = (min(len(order),
                               max(2, (os.cpu_count() or 8) // 4))
                           if n_labeled >= 2_000_000 and overlap <= 1.3
                           else 1)
            self.timings["shard_overlap"] = round(overlap, 2)
        if (shard_procs > 1 and len(order) > 1
                and _load_lib() is not None):
            # parallel optimistic sweeps + sequential validation (C
            # kernel required: the validator adopts the shared claimed
            # bitmap for conflict re-sweeps)
            return self._sweep_shards_parallel(
                order, shard_seed_ids, sharded_path, nodes_path,
                seed_rows, seeds, _load_shard, shard_procs, nodes_id)
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
        # shard 0's load overlaps the node-count footer scan — the
        # only shard whose IO nothing else can hide
        nxt_fut = pool.submit(_load_shard, order[0])
        _, n_nodes = _node_offsets(nodes_path)
        self.timings["skeleton_read"] = round(time.time() - t0, 2)
        t0 = time.time()
        claims_path = self._paths("claims")
        shutil.rmtree(claims_path, ignore_errors=True)
        state = SweepState(n_nodes)
        seed_prio = {int(r["id"]): r["prio"].encode() for r in seed_rows}
        shard_secs = []
        write_sec = 0.0  # this resolve's writes only, excluded from
        # dfs_sweep below so the sharded and skeleton paths report the
        # same disjoint step breakdown (and a second resolve on the
        # same engine can't double-count the previous call's writes)
        for k, s in enumerate(order):
            t_s = time.time()
            c_id, i_sorted, uniq_p_id, bounds = nxt_fut.result()
            if k + 1 < len(order):
                # double-buffer: shard k+1's read/decode runs while
                # shard k sweeps (the claim state is strictly
                # sequential, the IO is not)
                nxt_fut = pool.submit(_load_shard, order[k + 1])
            seed_id = np.array(shard_seed_ids[s], np.int32)
            n, out_id, out_depth, out_pr, out_li = state.sweep_shard(
                c_id, i_sorted, uniq_p_id, bounds, seed_id,
                self.cfg.max_depth)
            t_w = time.time()
            self._write_claims(claims_path, out_id, out_depth, out_pr,
                               out_li, rank0=state.rank - n, part=s,
                               seed_prio_by_id=seed_prio)
            write_sec += time.time() - t_w
            shard_secs.append(round(time.time() - t_s, 2))
        pool.shutdown(wait=False)
        self.timings["claims_write"] = round(write_sec, 2)
        self.timings["dfs_sweep"] = round(time.time() - t0 - write_sec, 2)
        self.timings["sweep_impl"] = state.impl
        self.timings["shard_sweeps"] = shard_secs
        return self._claims_to_visits(claims_path, seeds, nodes_id)

    def _sweep_shards_parallel(self, order, shard_seed_ids,
                               sharded_path, nodes_path, seed_rows,
                               seeds, load_shard, shard_procs, nodes_id):
        """Parallel seed-branch sweeps with EXACT validation — the
        per-shard DFS sweeps of `_resolve_sharded` fanned out to a
        process pool (the C kernel is ctypes and each worker is its
        own process, so the sweeps genuinely overlap), while the claim
        semantics stay identical to the sequential path:

          * every shard is swept OPTIMISTICALLY (empty claim state)
            in a forked worker — all shards concurrently, bounded by
            `shard_procs` workers (driver memory: one shard edge set +
            one claimed bitmap per LIVE worker);
          * the parent consumes results in seed-rank order and
            validates each against the true global claim state: claims
            disjoint from everything earlier ⇒ the optimistic sweep is
            provably the true sweep (see _shard_sweep_optimistic) and
            is accepted wholesale with ranks shifted to global;
          * on conflict, the longest conflict-free seed PREFIX is
            accepted (per-seed boundaries come from the kernel's
            seed_counts) and the remaining seeds re-sweep in-process
            against the true state — exactly the sequential semantics,
            paid only for the overlapping suffix.

        Disjoint seed branches (the common case when seeds are
        distinct sites) validate clean and the sweep wall collapses
        from sum(shards) to ~max(shard); heavily overlapping branches
        degrade gracefully toward the sequential cost plus a wasted
        (but parallel) optimistic pass. `shard_resweeps` in timings
        reports how much of the optimistic work survived."""
        import multiprocessing as mp
        import numpy as np
        from concurrent.futures import ProcessPoolExecutor

        from ..core.dfs_kernel import (SweepState, claimed_mask,
                                       mark_claimed)

        t0 = time.time()
        _, n_nodes = _node_offsets(nodes_path)
        self.timings["skeleton_read"] = round(time.time() - t0, 2)
        t0 = time.time()
        claims_path = self._paths("claims")
        shutil.rmtree(claims_path, ignore_errors=True)
        seed_prio = {int(r["id"]): r["prio"].encode() for r in seed_rows}
        # the true global claim state: a 1-bit/node bitmap (claim
        # MEMBERSHIP is all the validator and the resweeps consume)
        claimed = np.zeros((n_nodes + 7) // 8, np.uint8)
        rank = 0
        shard_secs: list[float] = []
        resweeps = 0
        write_sec = 0.0
        sweep_impl = "c"
        max_depth = int(self.cfg.max_depth)
        # explicit fork: children inherit the loaded C kernel and skip
        # the multi-second pyspark re-import a spawn/forkserver child
        # pays; pool children exit via os._exit, so the parent's py4j
        # socket to the (separate) JVM process is never torn down
        with ProcessPoolExecutor(max_workers=shard_procs,
                                 mp_context=mp.get_context("fork")) as ex:
            futs = [ex.submit(_shard_sweep_optimistic,
                              (sharded_path, s, shard_seed_ids[s],
                               n_nodes, max_depth))
                    for s in order]
            for k, fut in enumerate(futs):
                s = order[k]
                (_s, n, out_id, out_depth, out_pr, out_li, seed_counts,
                 wall, impl) = fut.result()
                sweep_impl = impl
                shard_secs.append(wall)
                rank0_shard = rank
                conflict = (np.flatnonzero(claimed_mask(claimed, out_id))
                            if n else np.empty(0, np.int64))
                if len(conflict) == 0:
                    acc = n
                    reseed_from = None
                else:
                    # first conflicting claim → its seed segment;
                    # accept every seed before it (their claims end
                    # strictly before the conflict index)
                    first = int(conflict[0])
                    seg = int(np.searchsorted(seed_counts, first,
                                              side="right"))
                    acc = int(seed_counts[seg - 1]) if seg > 0 else 0
                    reseed_from = seg
                parts = []
                if acc:
                    a_pr = out_pr[:acc].copy()
                    a_pr[a_pr >= 0] += rank0_shard
                    mark_claimed(claimed, out_id[:acc])
                    rank += acc
                    parts.append((out_id[:acc], out_depth[:acc], a_pr,
                                  out_li[:acc]))
                if reseed_from is not None:
                    resweeps += 1
                    c_id, i_sorted, uniq_p, bounds = load_shard(s)
                    rest = np.asarray(
                        shard_seed_ids[s][reseed_from:], np.int32)
                    st = SweepState(n_nodes, claimed=claimed, rank=rank)
                    n2, r_id, r_depth, r_pr, r_li = st.sweep_shard(
                        c_id, i_sorted, uniq_p, bounds, rest, max_depth)
                    rank = st.rank
                    if n2:
                        parts.append((r_id, r_depth, r_pr, r_li))
                if parts:
                    f_id = np.concatenate([p[0] for p in parts])
                    f_dep = np.concatenate([p[1] for p in parts])
                    f_pr = np.concatenate([p[2] for p in parts])
                    f_li = np.concatenate([p[3] for p in parts])
                    t_w = time.time()
                    self._write_claims(
                        claims_path, f_id, f_dep, f_pr, f_li,
                        rank0=rank0_shard, part=s,
                        seed_prio_by_id=seed_prio)
                    write_sec += time.time() - t_w
        self.timings["claims_write"] = round(write_sec, 2)
        self.timings["dfs_sweep"] = round(time.time() - t0 - write_sec, 2)
        self.timings["sweep_impl"] = f"{sweep_impl}*{shard_procs}procs"
        self.timings["shard_sweeps"] = shard_secs
        self.timings["shard_resweeps"] = resweeps
        return self._claims_to_visits(claims_path, seeds, nodes_id)

    @staticmethod
    def _write_claims(claims_path: str, out_id, out_depth, out_parent_rank,
                      out_li, rank0: int, part: int,
                      seed_prio_by_id: dict[int, bytes]) -> None:
        """Hand a sweep's claims back through a pyarrow parquet part:
        ~10× faster than createDataFrame at millions of rows,
        session-independent (no Arrow-vs-fallback divergence on the
        nullable parent_id), and it doubles as the resolve checkpoint
        artifact.

        Claims are written as DENSE IDS (id, parent_id), not url
        hashes: the id→hash/url mapping is resolved by the
        DISTRIBUTED rejoin in _claims_to_visits against the node
        table the skeleton was encoded with. The former approach
        gathered hashes through a driver-resident 8 B/node id→hash
        array (node_arr) — ~80 GB at the 10^10-URL posture; dense
        ids remove that array entirely, leaving the 1-bit/node
        claimed bitmap as the sweep's only node-indexed driver state.

        The priority VECTOR of every claim is emitted here too —
        prio(claim) = prio(parent) ++ hex4(link_index) — rebuilt
        VECTORIZED per depth level over the call's arrays (parents
        always claim in the same sweep call and at depth-1, so each
        level's parent bytes are complete before the level runs; no
        per-claim Python loop, no Spark joins). The claims are
        driver-resident at this point by design — the sweep is the
        engine's one compact sequential pass — so building the ~4·
        (depth+1)-byte strings here costs one gather/scatter per depth
        level and removes the ⌈log₂ depth⌉ pointer-doubling shuffle
        joins that used to run afterwards (claims_rejoin was a
        core-count-independent Amdahl term in the scaling pairs)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..core.dfs_kernel import emit_prios

        n = len(out_id)
        # parent ranks are GLOBAL but a claim's parent is always
        # claimed by the same sweep call (DFS parents lie on the path
        # from this call's seeds), so call-local index = rank - rank0
        local_pr = np.maximum(out_parent_rank - rank0, 0)
        parent_id = pa.array(
            (out_id[local_pr] if n else out_id).astype(np.int32),
            pa.int32(), mask=out_parent_rank < 0)
        # ---- prio build: one forward pass in the C kernel ----
        # (numpy twin inside emit_prios when no toolchain; pinned
        # equal in tests/test_dfs_kernel.py)
        srows = np.flatnonzero(out_parent_rank < 0)     # ≤ n_seeds rows
        seed_blob = bytearray()
        seed_ord = np.zeros(n, np.int32)
        for j, i in enumerate(srows):
            p = seed_prio_by_id[int(out_id[i])]
            assert len(p) == _HEX_W
            seed_blob += p
            seed_ord[i] = j
        offsets, data = emit_prios(
            out_depth, out_parent_rank, out_li, rank0,
            np.frombuffer(bytes(seed_blob) or b"\0" * _HEX_W, np.uint8),
            seed_ord)
        prio_arr = pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(offsets), pa.py_buffer(data))
        os.makedirs(claims_path, exist_ok=True)
        tbl = pa.table({
            "id": pa.array(out_id.astype(np.int32)),
            "depth": pa.array(out_depth.astype(np.int32)),
            "parent_id": parent_id,
            "parent_rank": pa.array(out_parent_rank.astype(np.int64)),
            "link_index": pa.array(out_li.astype(np.int32)),
            "prio": prio_arr,
            "visit_rank": pa.array(
                np.arange(rank0, rank0 + n, dtype=np.int64)),
        })
        pq.write_table(tbl,
                       os.path.join(claims_path, f"claims_{part:05d}.parquet"),
                       row_group_size=1 << 20)

    def _claims_to_visits(self, claims_path: str, seeds: DataFrame,
                          nodes_id: DataFrame,
                          timing_key: str = "claims_rejoin") -> DataFrame:
        """Read the claims parquet (prio vectors already emitted by the
        sweep write — see _write_claims) and map dense ids back to url
        strings DISTRIBUTED: every DFS claim is BFS-admitted, so the
        union of frontier rounds (skinny url-only rows, ~visit count)
        ∪ seeds contains every claimed url; hashing those urls and
        joining the node table (the same table the skeleton ids were
        encoded against) yields the (id, url) dim, which then joins
        the claims on id and parent_id. No driver-side id→hash array
        anywhere — the mapping rides two keyed shuffle joins. Joining
        the 10x-larger edge set for the same mapping dominated the
        rejoin; the frontier union is the small side."""
        t0 = time.time()
        claims_df = (self.spark.read.parquet(claims_path)
                     .withColumn("prio", F.col("prio").cast("string")))
        # localCheckpoint: the dim feeds two joins below — without it
        # the url-hash + node-table join subtree runs twice
        id_url = (self.frontier_table.read(schema=self._frontier_schema)
                  .select("url")
                  .unionByName(seeds.select("url"))
                  .withColumn("h", url_hash(F.col("url")))
                  .dropDuplicates(["h"])
                  .join(nodes_id.hint("shuffle_hash"), "h")
                  .select("id", "url")
                  .localCheckpoint())
        out = (claims_df.join(id_url, "id")
               .join(id_url.select(F.col("id").alias("parent_id"),
                                   F.col("url").alias("parent_url")),
                     "parent_id", "left")
               .select("url", "prio", "depth", "parent_url", "link_index",
                       "visit_rank"))
        out = out.localCheckpoint()
        self.timings[timing_key] = round(time.time() - t0, 2)
        return out

    def _resolve_fixpoint(self, edges: DataFrame, seeds: DataFrame,
                          max_iters: int | None) -> DataFrame:
        cfg = self.cfg
        claims = seeds
        self.resolve_deltas: list[int] = []
        self.resolve_certified: list[dict] = []
        # Convergence: the k-th smallest true claim is stable after
        # round k (transient claims below it need transient parents
        # with even smaller prios, grounded in the always-true seeds),
        # so the fixpoint terminates in ≤ |claims| rounds; typical
        # convergence is ~max_depth + a few correction waves. The cap
        # is a diagnostic backstop, not the convergence criterion.
        iters = max_iters or max(4 * cfg.max_depth + 20, 48)
        for it in range(iters):
            children = (
                edges.join(claims.select(F.col("url").alias("parent_url"),
                                         F.col("prio").alias("p_prio"),
                                         F.col("depth").alias("p_depth")),
                           "parent_url")
                .filter(F.col("p_depth") + 1 <= cfg.max_depth)
                .select(F.col("child_url").alias("url"),
                        F.concat(F.col("p_prio"),
                                 _hex_prio(F.col("link_index"))).alias("prio"),
                        (F.col("p_depth") + 1).alias("depth"),
                        F.col("parent_url"),
                        F.col("link_index")))
            cands = seeds.unionByName(children)
            # localCheckpoint truncates lineage: without it iteration
            # k's plan embeds all previous rounds (analysis blowup)
            new_claims = (
                cands.groupBy("url")
                .agg(F.min_by(F.struct("prio", "depth", "parent_url",
                                       "link_index"), F.col("prio")).alias("c"))
                .select("url", "c.prio", "c.depth", "c.parent_url",
                        "c.link_index")).localCheckpoint()
            d_new = (new_claims.select("url", "prio")
                     .exceptAll(claims.select("url", "prio")))
            d_old = (claims.select("url", "prio")
                     .exceptAll(new_claims.select("url", "prio")))
            ch = (d_new.unionByName(d_old)
                  .agg(F.count("*").alias("n"),
                       F.min("prio").alias("minp")).collect()[0])
            delta = ch["n"]
            # CERTIFIED-FINALIZED PREFIX: every claim whose prio is
            # strictly below the smallest prio that changed this round
            # is provably final. (Label-correcting argument: a future
            # improvement p' < minp would extend a parent whose prio
            # is a proper prefix of p' — hence also < minp — so the
            # parent is final and unchanged; full-recompute Jacobi
            # re-applies ALL edges from it every round, so p' was
            # already offered and min-combined this round.) The engine
            # records (minp, count, checksum) per round — a streaming
            # consumer may emit exactly that prefix of the visit order
            # while the tail still converges; tests re-derive each
            # prefix from the converged claims and pin the checksums.
            cert_pred = (F.lit(True) if ch["minp"] is None
                         else F.col("prio") < ch["minp"])
            cert = (new_claims.filter(cert_pred)
                    .agg(F.count("*").alias("n"),
                         F.coalesce(F.bit_xor(F.xxhash64("url", "prio")), F.lit(0)).alias("chk")).collect()[0])
            self.resolve_certified.append(
                {"minp": ch["minp"], "n": int(cert["n"]),
                 "chk": int(cert["chk"])})
            claims = new_claims
            self.last_resolve_iters = it + 1
            self.resolve_deltas.append(delta)
            if os.environ.get("SPARK_GRAFT_FIXPOINT_PROGRESS"):
                print(f"# fixpoint round {it + 1}: delta={delta} "
                      f"minp_len={len(ch['minp'] or '')}",
                      file=sys.stderr, flush=True)
            if delta == 0:
                break
        else:
            raise RuntimeError(
                f"DFS claim fixpoint did not converge in {iters} rounds")
        return claims

    def _finalize_visits(self, claims: DataFrame) -> DataFrame:
        """Attach statuses, the global visit rank (from the skeleton
        sweep when available — exact visit order for free — else a
        window over prio), and the per-host politeness batch schedule
        (always a DISTRIBUTED host-partitioned window). Claims of
        never-materialized URLs are 404s (dead links — fetched as
        absent)."""
        cfg = self.cfg
        fetched = (self.crawl_table.read(with_partition_columns=True,
                                        schema=self._crawl_schema)
                   .filter(F.col("kind") == "page")
                   .select(F.col("parent_url").alias("url"),
                           "status_code").distinct())
        visits = (claims.join(fetched, "url", "left")
                  .withColumn("status_code",
                              F.coalesce("status_code", F.lit(404)))
                  .withColumn("host", url_host(F.col("url")))
                  .withColumn("url_hash", url_hash(F.col("url"))))
        if "visit_rank" not in claims.columns:
            # fixpoint path: global rank DISTRIBUTED —
            # repartitionByRange(prio) gives ordered, non-overlapping
            # key ranges; rank = per-partition row_number + the
            # cumulative offset of the partitions before it (one
            # O(npart) collect). A bare Window.orderBy("prio") pulled
            # every row into ONE partition — fine at test scale,
            # hostile at the 16M+ webs the fixpoint bench runs. prios
            # are unique (each encodes one exact tree path), so range
            # boundaries cannot split ties. (The skeleton sweep emits
            # ranks directly, in exact visit order.)
            npart = max(self.spark.sparkContext.defaultParallelism, 4)
            ranked = (visits.repartitionByRange(npart, "prio")
                      .withColumn("_pid", F.spark_partition_id())
                      .localCheckpoint())  # pin pids across the two uses
            cnt_rows = sorted(
                (r["_pid"], r["n"]) for r in
                ranked.groupBy("_pid").agg(F.count("*").alias("n"))
                .collect())
            offs, acc = [], 0
            for pid, n_rows in cnt_rows:
                offs.append((pid, acc))
                acc += n_rows
            off_df = self.spark.createDataFrame(
                offs or [(0, 0)], "_pid int, _off long")
            visits = (ranked.join(F.broadcast(off_df), "_pid")
                      .withColumn(
                          "visit_rank",
                          (F.row_number().over(
                              Window.partitionBy("_pid").orderBy("prio"))
                           - 1 + F.col("_off")).cast("long"))
                      .drop("_pid", "_off"))
        # politeness schedule: k-th visit of host h → batch k//cap(h).
        # DISTRIBUTED: the window partitions by host (ordering within
        # a host by prio ≡ visit order), so the only serial artifact
        # of the exact-ordering contract stays the sweep itself.
        cap_col = F.coalesce(
            F.when(F.col("crawl_delay_ms") > 0,
                   F.greatest(F.lit(1), F.least(
                       F.lit(cfg.rate_limit),
                       (F.lit(cfg.batch_window_ms) /
                        F.col("crawl_delay_ms")).cast("int")))),
            F.lit(cfg.rate_limit))
        visits = (visits.join(F.broadcast(
                      self.robots.select("host", "crawl_delay_ms")),
                      "host", "left")
                  .withColumn("cap", cap_col)
                  .withColumn(
                      "host_k",
                      F.row_number().over(
                          Window.partitionBy("host").orderBy("prio")) - 1)
                  .withColumn("batch_id",
                              F.floor(F.col("host_k") / F.col("cap")))
                  .drop("crawl_delay_ms", "cap", "host_k"))
        return visits.select("visit_rank", "url", "url_hash", "host", "depth",
                             "parent_url", "link_index", "prio",
                             "status_code", "batch_id")

    # ---- derived outputs ----

    def errors(self, visits: DataFrame) -> DataFrame:
        """CrawlError rows (E9 categorization + P5 capture shape,
        crawler-engine.ts:1704-1709 and 705-711): timeouts (status 0)
        and 404s among VISITED urls, carried with the reference's full
        error-record fields. `retry_attempts` is literal 0 because the
        reference records every failure with retry_attempts: 0 and has
        no retry loop (crawler-engine.ts:710) — the column exists so a
        retrying fetch layer can fill it without a schema change."""
        return (visits.filter(F.col("status_code").isin(0, 404))
                .select("url", "depth",
                        F.when(F.col("status_code") == 0, "timeout")
                        .otherwise("404").alias("error_type"),
                        F.when(F.col("status_code") == 0,
                               F.lit("Navigation timeout"))
                        .otherwise(F.lit("HTTP 404 Not Found"))
                        .alias("error_message"),
                        F.lit(0).alias("retry_attempts")))

    _IMG_INGEST_SCHEMA = types.StructType([
        types.StructField("image_id", types.StringType()),
        types.StructField("src", types.StringType()),
        types.StructField("bytes", types.BinaryType()),
        types.StructField("w", types.IntegerType()),
        types.StructField("h", types.IntegerType()),
        types.StructField("fmt", types.StringType()),
        types.StructField("caption", types.StringType()),
        types.StructField("phash", types.LongType()),
        types.StructField("valid", types.BooleanType())])

    def _ingest_images(self, rnd: int, n_batch: int = 0) -> dict:
        """In-loop image ingest for round ``rnd`` (north-star core:
        "fetched image bytes are decoded/validated via vectorized
        pandas/Arrow UDFs with phash dedup" inside the micro-batch
        loop). Per round:

          1. distinct canonical image srcs on the round's fetched
             pages (SO2 in-page distinct + in-round distinct),
          2. src-seen anti-join against every PRIOR round's ingested
             set — strictly prior, so a replayed round never
             anti-joins against its own half-committed output and is
             byte-identical on resume (first-write-wins across
             rounds, the reference's image-already-downloaded skip),
          3. byte fetch — a join against the images dim here (the
             sandbox stand-in, same pattern as the page fetch); a real
             cluster swaps in an HTTP mapInPandas over the src batch,
             O(new srcs), no dim scan,
          4. decode + validate + phash via ONE Arrow-batched
             mapInPandas pass (real PNG/lossy-container decode,
             core/imaging.py; valid = decodes AND matches the
             declared w x h; phash RE-COMPUTED from the fetched
             bytes, never trusted from metadata),
          5. committed as a fast-append snapshot partitioned by
             `valid`, so the per-round decode/dedup metrics (new,
             invalid — the north star's "fetch/dedup metrics") come
             straight from parquet footers, no counting job.

        Scale: one anti-join shuffle keyed by src + one narrow Arrow
        pass per round; the ingested-src history read is
        manifest-driven and column-pruned to `src`."""
        import pandas as pd

        pdir = os.path.join(self._paths("crawl", rnd), "kind=page")
        if not os.path.isdir(pdir):
            return {"images_new": 0, "images_invalid": 0}
        pages = self.spark.read.schema(self._crawl_schema).parquet(pdir)
        refs = (pages.filter(F.col("title").isNotNull()
                             & (F.col("status_code") != 0))
                .select(F.explode("images").alias("im"))
                .select(canonicalize_url(F.col("im.src")).alias("src"))
                .filter(F.col("src") != "")
                .distinct())
        prior = [m for m in (self.images_table.lineage()[-1]["members"]
                             if self.images_table.exists() else [])
                 if m < f"round={rnd:05d}"]
        if prior:
            if self._imgseen_name is not None:
                # bucketed store: the scan reports hash-partitioning
                # on src, so the anti-join below shuffles ONLY the
                # refs side (O(round)); the strict < excludes a
                # half-written partition from a crashed prior attempt
                # at this round
                seen = (self.spark.table(self._imgseen_name)
                        .filter(F.col("rnd") < rnd)
                        .select("src"))
            else:
                seen = (self.spark.read.schema("src string")
                        .option("basePath", self._paths("images"))
                        .parquet(*[os.path.join(self._paths("images"), m)
                                   for m in prior])
                        .select("src"))
            if self.ingest_bloom:
                # the J1 treatment at 10^9+ ingested srcs: a
                # partitioned bloom over xxhash64(src) kills the
                # vast majority of already-seen refs before the
                # shuffle; bloom-positive srcs still take the exact
                # STRING anti-join, so the output is identical to the
                # plain path (pinned by the golden identity test) —
                # correctness never depends on the filter
                from ..operators.bloom import (build_bloom,
                                               seen_anti_join_with_bloom)
                seen_h = seen.withColumn("h", F.xxhash64("src"))
                bloom = build_bloom(seen_h, "h")
                refs = (seen_anti_join_with_bloom(
                            refs.withColumn("h", F.xxhash64("src")),
                            seen_h, bloom, hash_col="h",
                            confirm_col="src")
                        .drop("h"))
            else:
                refs = refs.join(seen, "src", "left_anti")
        # byte fetch — join strategy by round size, mirroring the page
        # fetch: big rounds merge-join the src-bucketed dim (only the
        # refs side shuffles; no serial driver broadcast build of a
        # multi-million-src set, no re-shuffle of the multi-GB byte
        # dim); small + tail rounds broadcast the refs over the plain
        # dim scan (one compiled plan shape reused every such round)
        npart = max(self.spark.sparkContext.defaultParallelism, 4)
        merge_path = (self._images_dim_bucketed is not None
                      and n_batch > self.bucket_join_min)
        if merge_path:
            fetched = self._images_dim_bucketed.hint("merge").join(
                refs, "src")
        else:
            fetched = self.images_dim.join(F.broadcast(refs), "src")

        def dec(it):
            from ..core.imaging import decode_image, phash64
            for pdf in it:
                ph, ok = [], []
                for b, fmt, w, h in zip(pdf["bytes"], pdf["fmt"],
                                        pdf["w"], pdf["h"]):
                    try:
                        px = decode_image(bytes(b), fmt)
                        valid = px.shape[:2] == (int(h), int(w))
                        ph.append(phash64(px) if valid else 0)
                    except Exception:
                        valid = False
                        ph.append(0)
                    ok.append(valid)
                yield pd.DataFrame({
                    "image_id": pdf["image_id"], "src": pdf["src"],
                    "bytes": pdf["bytes"], "w": pdf["w"], "h": pdf["h"],
                    "fmt": pdf["fmt"], "caption": pdf["caption"],
                    "phash": pd.Series(ph, dtype="int64"),
                    "valid": pd.Series(ok, dtype="bool")})

        # decode fan-out. Broadcast path (small/tail rounds): the join
        # output inherits the dim SCAN's split count (a handful of
        # tasks) — without an explicit repartition the Arrow decode
        # stage ran on 2-3 cores at any core count (measured 1.4k
        # img/s at local[32] vs the decoder's ~4.9k img/s/core); the
        # shuffle moves only the NEW srcs' bytes and those rounds are
        # small. Merge path (big rounds): the bucketed join output is
        # ALREADY hash-partitioned by src into `web_buckets`
        # partitions — repartitioning it re-shuffled every fetched
        # byte of the round's multi-GB image payload a second time
        # for zero balance gain (src is hash-bucketed, so the buckets
        # are even); decode straight on the join output whenever the
        # bucket fan-out covers the cores.
        if merge_path and self._img_buckets >= npart:
            out = fetched.mapInPandas(dec, self._IMG_INGEST_SCHEMA)
        else:
            out = (fetched.repartition(npart)
                   .mapInPandas(dec, self._IMG_INGEST_SCHEMA))
        (out.write.mode("overwrite").partitionBy("valid")
         .parquet(self._paths("images", rnd)))
        counts = self._footer_rows(self._paths("images", rnd))
        self.images_table.commit_dir(f"round={rnd:05d}", "round", counts,
                                     extra={"round": rnd})
        self._imgseen_store_write(rnd)
        return {"images_new": sum(counts.values()),
                "images_invalid": sum(v for k, v in counts.items()
                                      if k.startswith("valid=false"))}

    def images(self, visits: DataFrame) -> DataFrame:
        """The FINAL image+caption table — the reference's downloaded
        set. Explore ingests speculatively (a page can be fetched by
        BFS yet end up DFS-claimed at a deeper rank whose children are
        depth-rejected, so the in-loop ingest is a superset exactly
        like the fetched-page set); this narrows it to srcs referenced
        by VISITED pages, the same claims-join narrowing pages get.
        One semi-join against the resolved visit set."""
        refs = self.image_refs(visits).select("src").distinct()
        ing = self.images_table.read(with_partition_columns=True,
                                     schema=self._IMG_INGEST_SCHEMA)
        return ing.join(refs, "src", "left_semi")

    def image_captions(self, visits: DataFrame) -> DataFrame:
        """Caption ATTRIBUTION in reference order: each ingested image
        keeps the alt text of the FIRST page (by DFS visit rank) that
        referenced it — deterministic and independent of which explore
        round happened to fetch the bytes. One min_by aggregate keyed
        by src."""
        refs = self.image_refs(visits)
        ranked = refs.join(
            visits.select(F.col("url").alias("page_url"), "visit_rank"),
            "page_url")
        return (ranked.groupBy("src")
                .agg(F.min_by(F.struct("caption", "page_url"),
                              F.col("visit_rank")).alias("c"),
                     F.min("visit_rank").alias("first_visit_rank"))
                .select("src", F.col("c.caption").alias("caption"),
                        F.col("c.page_url").alias("page_url"),
                        "first_visit_rank"))

    def image_refs(self, visits: DataFrame) -> DataFrame:
        """(page_url, src, caption) for visited, extracted pages —
        the rows that join to the image+caption byte table (E3)."""
        fetched = (self.crawl_table.read(with_partition_columns=True,
                                        schema=self._crawl_schema)
                   .filter(F.col("kind") == "page"))
        pages = (fetched.filter(F.col("title").isNotNull() &
                                (F.col("status_code") != 0))
                 .select(F.col("parent_url").alias("url"), "images")
                 .distinct()
                 .join(visits.select("url"), "url"))
        return (pages.select(F.col("url").alias("page_url"),
                             F.explode("images").alias("im"))
                .select("page_url",
                        canonicalize_url(F.col("im.src")).alias("src"),
                        F.col("im.alt").alias("caption")))

    def screenshots(self, visits: DataFrame, width: int = 64,
                    height: int = 48) -> DataFrame:
        """S6 screenshot sink rows (crawler-engine.ts:1591-1629;
        full-page PNG per successfully processed page): one PNG per
        visited, successfully-fetched page in the north-rule
        image+caption row shape (image_id, bytes, w, h, fmt, caption,
        phash). No browser exists in this container, so the pixel
        render is the repo's deterministic stub (core/imaging.py
        render_image keyed by the page url — the declared screenshot
        stand-in); everything Spark-side is the real path: Arrow-
        batched mapInPandas encode (one Python batch per partition,
        never per-row), image_id = xxhash64(url) (no filesystem naming
        games, SURVEY §2.1 S6), phash computed at write time so ST4 /
        phash-dedup run downstream without re-decoding."""
        import pandas as pd
        from pyspark.sql import types as T

        fetched = (self.crawl_table.read(with_partition_columns=True,
                                        schema=self._crawl_schema)
                   .filter(F.col("kind") == "page")
                   .filter(F.col("title").isNotNull() &
                           (F.col("status_code") != 0))
                   .select(F.col("parent_url").alias("url"), "title")
                   .distinct())
        src = (visits.select("url", "url_hash", "visit_rank")
               .join(fetched, "url"))
        schema = T.StructType([
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("phash", T.LongType()),
            T.StructField("visit_rank", T.LongType()),
        ])

        def enc(it):
            from ..core.imaging import phash64, png_encode, render_image
            for pdf in it:
                ids, blobs, caps, hashes, ranks = [], [], [], [], []
                for uh, title, rank in zip(pdf["url_hash"], pdf["title"],
                                           pdf["visit_rank"]):
                    iid = f"shot-{int(uh) & 0xFFFFFFFFFFFFFFFF:016x}"
                    px = render_image(iid, width, height)
                    ids.append(iid)
                    blobs.append(png_encode(px))
                    caps.append(title)
                    ph = phash64(px)
                    hashes.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
                    ranks.append(int(rank))
                yield pd.DataFrame({
                    "image_id": ids, "bytes": blobs,
                    "w": [width] * len(ids), "h": [height] * len(ids),
                    "fmt": ["png"] * len(ids), "caption": caps,
                    "phash": hashes, "visit_rank": ranks})

        return src.mapInPandas(enc, schema)

    def write_screenshots(self, visits: DataFrame) -> SnapshotTable:
        """Commit S6 screenshot rows to the `screenshots` snapshot
        table, idempotently (first-write-wins on image_id — re-running
        after a resume never duplicates or replaces a page's shot,
        mirroring the reference's screenshot-already-captured skip,
        crawler-engine.ts:697-698)."""
        tbl = SnapshotTable(self.spark,
                            os.path.join(self.ckpt, "screenshots"))
        tbl.insert_if_absent(self.screenshots(visits), ["image_id"],
                             order_col="visit_rank")
        return tbl

    def html_capture(self, pages: DataFrame,
                     url_col: str = "url",
                     html_col: str = "html") -> SnapshotTable:
        """S7 HTML/CSS capture sink (browser-session.ts:3308-3637):
        per page, the sanitized HTML (E13: scripts/handlers stripped,
        href/src absolutized) and the page CSS with url() refs
        absolutized (E14), keyed by the url slug and committed
        FIRST-WRITE-WINS (the reference skips capture when the slug's
        files already exist, browser-session.ts:3400-3407) into the
        `pages_html` snapshot table. `pages` must carry raw HTML (the
        fetch stage's payload on a real cluster; fixture-rendered in
        tests)."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..functions.urls import url_slug

        schema = T.StructType([
            T.StructField("slug", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("html", T.StringType()),
            T.StructField("css", T.StringType()),
        ])

        def capture(it):
            from ..core.html_parse import absolutize_css, parse_page
            from ..operators.html import sanitize_html_str
            for pdf in it:
                slugs, urls, htmls, csss = [], [], [], []
                for u, h, slug in zip(pdf["__u"], pdf["__h"],
                                      pdf["__slug"]):
                    slugs.append(slug)
                    urls.append(u)
                    htmls.append(sanitize_html_str(h, u))
                    csss.append(absolutize_css(parse_page(h, u).css, u))
                yield pd.DataFrame({"slug": slugs, "url": urls,
                                    "html": htmls, "css": csss})

        src = pages.select(F.col(url_col).alias("__u"),
                           F.col(html_col).alias("__h"),
                           url_slug(F.col(url_col)).alias("__slug"))
        tbl = SnapshotTable(self.spark,
                            os.path.join(self.ckpt, "pages_html"))
        tbl.insert_if_absent(src.mapInPandas(capture, schema), ["slug"],
                             order_col="url")
        return tbl

    def run(self) -> DataFrame:
        self.explore()
        return self.resolve()


def fresh_ckpt(path: str) -> str:
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path
