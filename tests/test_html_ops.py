"""E13 HTML sanitizer + E11 content diff — pure-function checks plus
the Spark pandas-UDF path."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.html import (content_diff, content_diff_str,
                                          sanitize_html, sanitize_html_str)

HTML = """<html><head>
<meta http-equiv="refresh" content="5;url=/x">
<script type="text/javascript">alert(1)</script>
</head><body onload="evil()">
<a href="/page" onclick="track()">rel</a>
<a href="javascript:void(0)">js</a>
<img src="/img/a.png">
<a href="http://other.com/abs">abs</a>
</body></html>"""


def test_sanitize_semantics():
    out = sanitize_html_str(HTML, "http://ex.com/deep/page")
    assert "<script" not in out and "alert(1)" not in out
    assert "http-equiv" not in out
    assert "onload" not in out and "onclick" not in out
    assert 'href="http://ex.com/page"' in out
    assert 'src="http://ex.com/img/a.png"' in out
    assert 'href="http://other.com/abs"' in out  # absolute untouched
    assert 'href="#"' in out  # javascript: neutralized
    assert out.startswith("<!-- static no-js snapshot -->")


def test_content_diff_semantics():
    assert content_diff_str("abc", "abc") is None
    d = content_diff_str("hello world", "hello brave world")
    assert d == 'Changed from position 6: "world" to "brave world"'
    d2 = content_diff_str("abc", "abcdef")
    assert d2 == 'Changed from position 3: "" to "def"'


def test_udfs_vectorized(spark):
    df = spark.createDataFrame(
        [("p1", HTML, "http://ex.com/p", "aXb", "aYb"),
         ("p2", "<p>ok</p>", "http://ex.com/q", "same", "same")],
        "id string, html string, url string, prev string, cur string")
    out = df.select(
        "id",
        sanitize_html("html", "url").alias("clean"),
        content_diff("prev", "cur").alias("diff")).collect()
    rows = {r["id"]: r for r in out}
    assert "script" not in rows["p1"]["clean"]
    assert rows["p1"]["diff"] == 'Changed from position 1: "Xb" to "Yb"'
    assert rows["p2"]["diff"] is None
    assert rows["p2"]["clean"].endswith("<p>ok</p>")
