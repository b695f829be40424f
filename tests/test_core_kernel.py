"""Core kernel invariants: hash parity with Spark, URL canonicalization
parity (native exprs vs pure-Python reference semantics), PNG codec,
pHash, PSNR."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.core import imaging as img
from crawler_spark.core.urls import canonicalize_url as py_canon
from crawler_spark.core.xxhash64 import spark_xxhash64_str, xxhash64
from crawler_spark.functions import canonicalize_url, url_hash, url_host, url_slug

URL_CORPUS = [
    "http://example.com",
    "http://example.com/",
    "https://Example.COM/Path/",
    "https://example.com:443/p/",
    "http://example.com:80/p",
    "http://example.com:8080/p/",
    "http://example.com/x/?b=2&a=1#frag",
    "http://example.com/?b=1&a=2&a=1",
    "http://example.com/a/b/c?z=9&y=8&x=7",
    "http://example.com/path#section",
    "  http://example.com/ws  ",
    "http://sub.example.com/deep/path/",
    "http://example.com/p?one=1",
    "http://example.com/p?k=v&k=u&a=z",
    "http://host.tld/UPPER/Case/",
    "notaurl",
    "",
    "/relative/path",
    "ftp-like-but-not",
    "http://h0st-with-dash.example.org/x-y_z/",
    "https://example.com/trailing//",
    "http://example.com/q?=bare&a=1",
    "http://example.com/semi?c=3&b=2&b=1&a",
]


def test_xxhash64_public_vectors():
    # public XXH64 reference vectors (seed 0)
    assert xxhash64(b"", 0) == 0xEF46DB3751D8E999
    assert xxhash64(b"a", 0) == 0xD24EC4F1A98C6E5B


def test_xxhash64_matches_spark(spark):
    urls = [u for u in URL_CORPUS if u]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["h"] for r in df.select("url", F.xxhash64("url").alias("h")).collect()}
    for u in urls:
        assert got[u] == spark_xxhash64_str(u), u


def test_canonicalize_parity(spark):
    df = spark.createDataFrame([(u,) for u in URL_CORPUS], "url string")
    got = df.select("url", canonicalize_url("url").alias("c")).collect()
    for row in got:
        expect = py_canon(row["url"])
        assert row["c"] == expect, f"{row['url']!r}: spark={row['c']!r} py={expect!r}"


def test_canonicalize_is_native_plan(spark):
    """The canonicalization must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node may appear in the physical plan."""
    df = spark.range(1).select(
        canonicalize_url(F.lit("http://a.com/x/?b=2&a=1#f")).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_url_host_and_slug(spark):
    df = spark.createDataFrame(
        [("https://Sub.Example.com:8443/A/B?q=1",), ("junk",)], "url string"
    )
    rows = df.select(url_host("url").alias("h"), url_slug("url").alias("s")).collect()
    assert rows[0]["h"] == "sub.example.com"
    assert rows[0]["s"] == "sub-example-com-8443-a-b-q-1"
    assert rows[1]["h"] == ""
    assert rows[1]["s"] == "index"


def test_url_hash_column(spark):
    df = spark.createDataFrame([("http://a.com/",)], "url string")
    h = df.select(url_hash("url").alias("h")).collect()[0]["h"]
    assert h == spark_xxhash64_str("http://a.com/")


def test_png_roundtrip_exact():
    px = img.render_image("http://x/im.png", 64, 48)
    assert (img.png_decode(img.png_encode(px)) == px).all()


def test_fake_lossy_psnr_above_40():
    px = img.render_image("http://x/im2.jpg", 96, 64)
    for fmt in ("jpeg", "webp"):
        dec = img.decode_image(img.fake_lossy_encode(px, fmt), fmt)
        assert img.psnr(px, dec) >= 40.0


def test_phash_near_duplicates_cluster():
    base = img.render_image("http://x/dup.png", 128, 128)
    near = img.render_image("http://x/dup.png", 128, 128, noise_seed=7, noise_amp=6)
    other = img.render_image("http://x/other.png", 128, 128)
    h0, h1, h2 = img.phash64(base), img.phash64(near), img.phash64(other)
    assert img.hamming64(h0, h1) <= 8
    assert img.hamming64(h0, h2) > 12


def test_phash_scale_invariance():
    a = img.phash64(img.render_image("http://x/s.png", 64, 64))
    b = img.phash64(img.render_image("http://x/s.png", 256, 256))
    assert img.hamming64(a, b) <= 10
