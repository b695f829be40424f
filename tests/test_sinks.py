"""S6 screenshot sink + S7 HTML/CSS capture sink (first-write-wins)
against the reference semantics (crawler-engine.ts:1591-1629,
browser-session.ts:3308-3637 exists-check 3400-3407)."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.imaging import (phash64, png_decode,
                                        render_image)
from crawler_spark.engine.config import CrawlConfig
from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "t-smoke")


def test_screenshot_sink_roundtrip(spark, tmp_path):
    """One PNG row per visited, successfully-fetched page; bytes
    decode back to the deterministic render; idempotent re-commit
    (screenshot-already-captured skip)."""
    eng = FrontierEngine(spark, CrawlConfig(max_depth=2), FIXDIR,
                         fresh_ckpt(str(tmp_path / "ck")))
    visits = eng.run().cache()
    tbl = eng.write_screenshots(visits)
    rows = tbl.read().collect()

    # row count == successfully fetched visited pages (titled, not
    # timed out) — same predicate image_refs uses
    n_ok = (visits.join(
        eng.crawl_table.read(with_partition_columns=True)
        .filter((F.col("kind") == "page") & F.col("title").isNotNull()
                & (F.col("status_code") != 0))
        .select(F.col("parent_url").alias("url")).distinct(), "url")
        .count())
    assert len(rows) == n_ok > 0

    r = min(rows, key=lambda x: x["image_id"])
    px = png_decode(bytes(r["bytes"]))
    assert px.shape == (48, 64, 3)
    # bytes are the deterministic render keyed by image_id, phash
    # computed at write matches a fresh recompute
    assert (px == render_image(r["image_id"], 64, 48)).all()
    ph = phash64(px)
    assert (ph - (1 << 64) if ph >= (1 << 63) else ph) == r["phash"]
    assert r["caption"]  # title rides along as the caption

    # idempotent: a second commit inserts nothing (first-write-wins)
    tbl2 = eng.write_screenshots(visits)
    assert tbl2.read().count() == n_ok
    assert tbl2.lineage()[-1]["op"] == "insert_if_absent"
    visits.unpersist()


HTML_A = ('<html><head><style>.x{background:url("img/a.png")}</style>'
          '<script>alert(1)</script></head>'
          '<body><a href="/next" onclick="evil()">n</a></body></html>')
HTML_B = '<html><body><p>rewritten</p></body></html>'


def test_html_capture_first_write_wins(spark, tmp_path):
    eng = FrontierEngine(spark, CrawlConfig(max_depth=1), FIXDIR,
                         fresh_ckpt(str(tmp_path / "ck2")))
    pages = spark.createDataFrame(
        [("https://a.example/x/page", HTML_A)], "url string, html string")
    tbl = eng.html_capture(pages)
    [r] = tbl.read().collect()
    assert "<script>" not in r["html"]          # E13 strip
    assert "onclick" not in r["html"]
    assert 'href="https://a.example/next"' in r["html"]  # absolutized
    # E14: css url() absolutized against the page url
    assert "url('https://a.example/x/img/a.png')" in r["css"]

    # first-write-wins: same slug re-captured with different HTML
    # keeps the ORIGINAL row (exists-check skip)
    eng.html_capture(spark.createDataFrame(
        [("https://a.example/x/page", HTML_B)], "url string, html string"))
    [r2] = tbl.read().collect()
    assert r2["html"] == r["html"]
    # a new slug still inserts
    eng.html_capture(spark.createDataFrame(
        [("https://a.example/other", HTML_B)], "url string, html string"))
    assert tbl.read().count() == 2
