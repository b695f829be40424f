"""Embedding similarity search over `embeddings(vec_id, embedding
array<float>, label)` — brute-force cosine baseline plus an
LSH-bucketed approximate path for scale.

The reference has no vector surface; these are the
training-data-pipeline extensions (embedding near-dup dedup, ANN
retrieval) mandated for the graft. All math is native
(`F.zip_with`/`F.aggregate` dot products stay in codegen); the
random-hyperplane LSH uses deterministic pseudo-hyperplanes derived
from xxhash64 so both the Spark side and any oracle can reproduce
them — no RNG.

Scale notes (10^9+ vectors): brute-force top-k is the correctness
baseline (cross join — quadratic, only for small query sets against
a broadcastable corpus or sampled verification). The scale path is
`lsh_bucketed_neighbors`: 2^p hyperplane-sign buckets, candidates
join within bucket (+ optional multi-probe), shuffle keyed by bucket
id. Salting applies if one bucket dominates (degenerate data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(pairs: DataFrame, col_a: str = "vec_a",
                col_b: str = "vec_b") -> DataFrame:
    """Append `cosine` between two array<float> columns (double math,
    sequential fold — bit-stable across runs)."""
    a, b = F.col(col_a), F.col(col_b)
    return pairs.withColumn(
        "cosine", _dot(a, b) / (_norm(a) * _norm(b)))


def _block_rows(emb: DataFrame, id_col: str, vec_col: str,
                n_blocks: int, blk: str) -> DataFrame:
    """Corpus packed into n_blocks carrier rows: (blk, rows
    array<struct<id,v>>). The id→block map is xxhash64 — uniform, no
    skew, reproducible. At 10^9+ vectors n_blocks scales so each
    carrier row stays ~100 MB (a 2 GB row ceiling is the only
    constraint); nothing ever lands on the driver."""
    return (emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn(blk, F.pmod(F.xxhash64(F.col("id").cast("string")),
                                    F.lit(n_blocks)).cast("int"))
            .groupBy(blk)
            .agg(F.collect_list(F.struct("id", "v")).alias(f"{blk}_rows")))


def _unpack(rows):
    import numpy as np

    ids = np.array([r["id"] for r in rows], np.int64)
    m = np.stack([np.asarray(r["v"]) for r in rows])
    return ids, m / np.sqrt((m * m).sum(axis=1, keepdims=True))


def cosine_pairs(emb: DataFrame, threshold: float,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 n_blocks: int | None = None) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — exact
    brute-force as a BLOCK-PARTITIONED matmul: the corpus is packed
    into B carrier rows (xxhash blocks), the B·(B+1)/2 block pairs
    fan out as a self-join, and each task BLAS-multiplies one block
    pair inside an Arrow batch. No driver-side corpus collect, no
    broadcast: the quadratic compute is inherent to exact all-pairs,
    but every task is bounded and the plan scales by raising
    n_blocks. (The sub-quadratic path is lsh_bucketed_neighbors.)
    Each unordered pair is computed exactly once, so cosine values
    are bit-identical to the single-matrix formulation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    spark = emb.sparkSession
    if n_blocks is None:
        n_blocks = max(4, int(spark.sparkContext.defaultParallelism ** 0.5))
    a = _block_rows(emb, id_col, vec_col, n_blocks, "ablk")
    b = _block_rows(emb, id_col, vec_col, n_blocks, "bblk")
    cross = a.crossJoin(b).filter(F.col("ablk") <= F.col("bblk"))
    schema = StructType([StructField("id_a", LongType()),
                         StructField("id_b", LongType()),
                         StructField("cosine", DoubleType())])

    def block(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                aids, am = _unpack(row["ablk_rows"])
                same = row["ablk"] == row["bblk"]
                bids, bm = (aids, am) if same \
                    else _unpack(row["bblk_rows"])
                sims = am @ bm.T
                if same:
                    mask = (sims >= threshold) & \
                        (aids[:, None] < bids[None, :])
                else:  # cross-block: every pair once, oriented a<b
                    mask = sims >= threshold
                qi, ci = np.nonzero(mask)
                ia, ib = aids[qi], bids[ci]
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                yield pd.DataFrame({"id_a": lo, "id_b": hi,
                                    "cosine": np.round(sims[qi, ci], 6)})

    # repartition so each block pair is its own task
    return (cross.repartition(n_blocks * (n_blocks + 1) // 2,
                              "ablk", "bblk")
            .mapInPandas(block, schema))


def ann_topk(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding",
             queries: DataFrame | None = None,
             round_digits: int = 4,
             n_blocks: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per query — block-partitioned:
    query blocks × corpus blocks fan out as carrier-row pairs, each
    task BLAS-scores one pair and keeps its local top-k per query,
    and a final window over the B·k survivors per query picks the
    global top-k by (-rounded cosine, neighbor id). Coarse rounding +
    id tiebreak keeps ranks engine-independent; no driver collect,
    no corpus broadcast. queries defaults to the corpus itself
    (self-matches excluded)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    spark = emb.sparkSession
    if n_blocks is None:
        n_blocks = max(4, int(spark.sparkContext.defaultParallelism ** 0.5))
    q = _block_rows(queries or emb, id_col, vec_col, n_blocks, "qblk")
    c = _block_rows(emb, id_col, vec_col, n_blocks, "cblk")
    cross = q.crossJoin(c)
    schema = StructType([StructField("qid", LongType()),
                         StructField("nid", LongType()),
                         StructField("cosine", DoubleType())])

    def block(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                qids, qm = _unpack(row["qblk_rows"])
                cids, cm = _unpack(row["cblk_rows"])
                sims = np.round(qm @ cm.T, round_digits)
                sims[qids[:, None] == cids[None, :]] = -np.inf
                order_ids = np.argsort(cids, kind="stable")
                kk = min(k, sims.shape[1])
                rows_q, rows_n, rows_c = [], [], []
                for qi in range(len(qids)):
                    s = sims[qi]
                    idx = order_ids[
                        np.argsort(-s[order_ids], kind="stable")][:kk]
                    for ni in idx:
                        if s[ni] == -np.inf:
                            break
                        rows_q.append(qids[qi])
                        rows_n.append(cids[ni])
                        rows_c.append(s[ni])
                yield pd.DataFrame({"qid": rows_q, "nid": rows_n,
                                    "cosine": rows_c})

    local = (cross.repartition(n_blocks * n_blocks, "qblk", "cblk")
             .mapInPandas(block, schema))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid").asc())
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "cosine"))


def _score_e4(cos):
    """Integerized similarity score: floor(cosine·10⁴ + 0.5) as long.
    Replaces double rounding in ranked outputs — floor of an identical
    double expression is engine-independent (no HALF_UP-vs-banker's
    ambiguity), so ranks and value hashes match any SQL oracle
    computing the same fold."""
    return F.floor(cos * 10000 + 0.5).cast("long")


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j =
    ±1 pattern from xxhash64 bits (sign-LSH needs only signs, so ±1
    components suffice and are exactly reproducible anywhere)."""
    from ..core.xxhash64 import xxhash64

    return [1.0 if (xxhash64(f"hp:{plane}:{j}".encode(), 0) & 1) else -1.0
            for j in range(dim)]


def lsh_bucket(emb: DataFrame, num_planes: int = 8,
               vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Append `bucket`: the num_planes-bit sign pattern of dot
    products with deterministic ±1 hyperplanes (random-hyperplane
    cosine LSH). Native exprs; the planes are literal arrays."""
    out = emb
    bucket = F.lit(0)
    v = F.col(vec_col).cast("array<double>")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bit = F.when(_dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return out.withColumn("bucket", bucket)


def _assign_clusters(vecs: DataFrame, centroids, id_col: str = "id",
                     vec_col: str = "vec", out_col: str = "cluster",
                     nprobe: int = 1) -> DataFrame:
    """Append the index/indices of the nearest centroid(s) by cosine
    (BLAS argmax inside Arrow batches against the broadcast centroid
    matrix). nprobe>1 emits one row per probed centroid."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    spark = vecs.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    schema = StructType([StructField("id", LongType()),
                         StructField("vec", ArrayType(DoubleType())),
                         StructField(out_col, IntegerType())])

    def block(it):
        cm = bc.value  # unit rows [C, d]
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf["vec"].to_numpy())
            qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            sims = qn @ cm.T
            top = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
            n = len(pdf)
            rep = np.repeat(np.arange(n), nprobe)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy()[rep],
                "vec": pdf["vec"].to_numpy()[rep],
                out_col: top.reshape(-1).astype("int32")})

    return vecs.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("vec")).mapInPandas(block, schema)


def ivf_centroids(emb: DataFrame, n_centroids: int = 16, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic IVF coarse quantizer: seed centroids are the
    n_centroids corpus vectors with smallest xxhash64(vec_id) (a
    reproducible pseudo-random sample — no RNG), refined by `iters`
    Lloyd iterations computed DISTRIBUTED: assignment is a broadcast
    BLAS argmax, the mean reduction is posexplode → groupBy(cluster,
    dim) avg — one shuffle per iteration keyed by cluster, never a
    driver-side pass over the corpus. Returns a unit-row numpy
    matrix [n_centroids, d]."""
    import numpy as np

    seeds = (emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
        .withColumn("hk", F.xxhash64(F.col("id").cast("string")))
        .orderBy("hk").limit(n_centroids).toPandas())
    cm = np.stack(seeds["vec"].to_numpy())
    cm = cm / np.sqrt((cm * cm).sum(axis=1, keepdims=True))
    src = emb.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("vec"))
    for _ in range(iters):
        assigned = _assign_clusters(src, cm)
        # order-independent exact mean: components quantized to 2^-30
        # and summed as longs (integer addition commutes exactly;
        # float partial-aggregate merge order is not bit-stable
        # across runs and could flip near-tie assignments)
        means = (assigned
                 .select("cluster", F.posexplode("vec").alias("dim", "x"))
                 .groupBy("cluster", "dim")
                 .agg((F.sum(F.floor(F.col("x") * F.lit(float(1 << 30)))
                             .cast("long"))
                       / (F.count("*") * F.lit(float(1 << 30))))
                      .alias("m"))
                 .groupBy("cluster")
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                      .alias("s"))
                 .select("cluster",
                         F.transform("s", lambda e: e["m"]).alias("mean"))
                 .toPandas())
        for _, row in means.iterrows():
            v = np.asarray(row["mean"])
            n = np.sqrt((v * v).sum())
            if n > 0:
                cm[int(row["cluster"])] = v / n
    return cm


def ivf_topk(emb: DataFrame, k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed under
    their nearest coarse centroid; each query probes its `nprobe`
    nearest centroids and ranks ONLY those lists by exact cosine.
    The candidate join shuffles on the cluster id — the classic IVF
    partitioning at 10^9+ vectors (each inverted list is a partition;
    a probe touches nprobe/n_centroids of the corpus). Deterministic
    end-to-end; recall vs the exact ann_topk is pinned in
    tests/test_dedup_text.py."""
    cm = ivf_centroids(emb, n_centroids, iters, id_col, vec_col)
    src = emb.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("vec"))
    corpus = (_assign_clusters(src, cm)
              .select(F.col("id").alias("nid"),
                      F.col("vec").alias("vec_b"), "cluster"))
    probes = (_assign_clusters(src, cm, nprobe=nprobe)
              .select(F.col("id").alias("qid"),
                      F.col("vec").alias("vec_a"), "cluster"))
    scored = (probes.join(corpus, "cluster")
              .filter(F.col("qid") != F.col("nid"))
              .transform(with_cosine)
              .withColumn("cos_e4", _score_e4(F.col("cosine"))))
    w = Window.partitionBy("qid").orderBy(F.col("cos_e4").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "cos_e4"))


def lsh_bucketed_neighbors(emb: DataFrame, k: int = 5,
                           num_planes: int = 8,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Approximate top-k neighbors: candidates restricted to the same
    LSH bucket, ranked by exact cosine. The 100TB-scale ANN path —
    the pairwise join shuffles on `bucket`, never all-pairs. Recall
    vs `ann_topk` is measured in tests (tests/test_dedup_text.py)."""
    bucketed = lsh_bucket(emb, num_planes, vec_col, dim).select(
        F.col(id_col).alias("id"), "bucket",
        F.col(vec_col).cast("array<double>").alias("vec"))
    a = bucketed.select(F.col("id").alias("qid"),
                        F.col("vec").alias("vec_a"), "bucket")
    b = bucketed.select(F.col("id").alias("nid"),
                        F.col("vec").alias("vec_b"), "bucket")
    scored = (a.join(b, "bucket").filter(F.col("qid") != F.col("nid"))
              .transform(with_cosine)
              .withColumn("cos_e4", _score_e4(F.col("cosine"))))
    w = Window.partitionBy("qid").orderBy(F.col("cos_e4").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "cos_e4"))
