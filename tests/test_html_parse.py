"""E1/E2/E5/E14 HTML-parse stage.

The fixtures render each web_pages row to raw HTML
(fixtures.render_page_html) and the parser must recover the structs
exactly — so the same engine crawl can be driven from markup instead
of pre-parsed arrays (pinned end-to-end in
test_crawl_from_raw_html)."""

from __future__ import annotations

import os

import pytest

from crawler_spark.core.html_parse import (absolutize_css, css_selector,
                                           parse_page)
from crawler_spark.sources.fixtures import WebGen, render_page_html

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "fixtures", "t-smoke")


# ---------------------------------------------------------------------------
# pure-python kernel
# ---------------------------------------------------------------------------

def _rows(n=60):
    g = WebGen("t-smoke")
    web = g.web_pages()
    return [{c: web.column(c)[j].as_py() for c in web.column_names}
            for j in range(n)]


def test_render_parse_roundtrip_exact():
    """Every fixture page round-trips: rendered HTML → parse_page →
    identical title/meta/headings/links/images/forms structs."""
    for row in _rows():
        p = parse_page(render_page_html(row), row["url"])
        assert p.title == row["title"]
        assert p.meta_description == row["meta_description"]
        assert p.headings == row["headings"]
        got_links = [(ln["href"], ln["label"], ln["selector"],
                      ln["element_type"], ln["pos_x"], ln["pos_y"],
                      ln["link_index"]) for ln in p.links]
        exp_links = [(ln["href"], ln["label"], ln["selector"],
                      ln["element_type"], ln["pos_x"], ln["pos_y"],
                      ln["link_index"]) for ln in row["links"]]
        assert got_links == exp_links
        assert [(im["src"], im["alt"]) for im in p.images] == \
               [(im["src"], im["alt"]) for im in row["images"]]
        assert [(f["action"], f["method"], f["fields"]) for f in p.forms] \
            == [(f["action"], f["method"], f["fields"])
                for f in row["forms"]]


def test_internal_external_partition():
    """getLinks semantics (crawler-engine.ts:1368-1412): anchors split
    on hostname equality, onclick/data-href/data-url attributes are
    regex-mined, everything deduped first-seen."""
    html = """
    <a href="/local/a">one</a>
    <a href="http://other.test/x">two</a>
    <a href="http://me.test/b">three</a>
    <a href="/local/a">dup</a>
    <div onclick="nav('http://other.test/mined')">m</div>
    <span data-href="/from-data">s</span>
    <button data-url="http://me.test/btn" onclick="x()">b</button>
    """
    p = parse_page(html, "http://me.test/page")
    assert p.internal == ["http://me.test/local/a", "http://me.test/b",
                          "http://me.test/from-data", "http://me.test/btn"]
    assert p.external == ["http://other.test/x", "http://other.test/mined"]


def test_button_onclick_navigation_regex():
    """Only location.href= / window.location= assignments count as
    button navigation links (crawler-engine.ts:1552)."""
    html = """
    <button id="go" onclick="location.href='/next'">Go</button>
    <button class="x y" onclick="window.location = "esc"">no</button>
    <button onclick="window.location = '/w'">W</button>
    <button onclick="doStuff()">no-nav</button>
    """
    p = parse_page(html, "http://h.test/")
    assert [(ln["href"], ln["selector"], ln["element_type"])
            for ln in p.links] == [("/next", "#go", "button"),
                                   ("/w", "button", "button")]


def test_css_absolutize_variants():
    """E14 (browser-session.ts:3509-3535): quoted, single-quoted and
    bare url() refs all absolutize against the base."""
    css = ("a{background:url(/abs.png)} "
           "b{background:url('rel/x.jpg')} "
           'c{background:url("../up.gif")} '
           "d{background:url(http://cdn.test/k.png)}")
    out = absolutize_css(css, "http://h.test/dir/page.html")
    assert out == ("a{background:url('http://h.test/abs.png')} "
                   "b{background:url('http://h.test/dir/rel/x.jpg')} "
                   "c{background:url('http://h.test/up.gif')} "
                   "d{background:url('http://cdn.test/k.png')}")


def test_css_selector_rule():
    assert css_selector("a", {"id": "main"}) == "#main"
    assert css_selector("button", {"class": " b1  b2 "}) == "button.b1.b2"
    assert css_selector("DIV", {}) == "div"


def test_style_block_collected_and_absolutized():
    html = ('<style>body{background:url("/bg.png")}</style>'
            '<link rel="stylesheet" href="/theme.css">')
    p = parse_page(html, "http://h.test/p")
    assert "url('http://h.test/bg.png')" in p.css
    assert "http://h.test/theme.css" in p.css


# ---------------------------------------------------------------------------
# spark wrapper + engine-from-raw-html golden
# ---------------------------------------------------------------------------

def test_parse_pages_mapinpandas(spark):
    """The Arrow-batched wrapper matches the pure kernel row-for-row
    and carries non-html columns through."""
    from crawler_spark.operators.html_parse import parse_pages

    rows = _rows(30)
    df = spark.createDataFrame(
        [(r["url"], r["status_code"], render_page_html(r)) for r in rows],
        "url string, status_code int, html string")
    got = {r["url"]: r for r in parse_pages(df).collect()}
    assert len(got) == 30
    for r in rows:
        g = got[r["url"]]
        assert g["status_code"] == r["status_code"]
        assert g["title"] == r["title"]
        assert [ln["href"] for ln in g["links"]] == \
               [ln["href"] for ln in r["links"]]
        assert [ln["selector"] for ln in g["links"]] == \
               [ln["selector"] for ln in r["links"]]
        assert g["css"].startswith("body { background: "
                                   "url('http://") or \
            g["css"].startswith("body { background: url('https://")


@pytest.mark.slow
def test_crawl_from_raw_html(spark, tmp_path):
    """End-to-end E1: render the whole t-smoke web to raw HTML, parse
    it back with the distributed stage, rebuild the web table from the
    PARSED structs only, and run the engine — the crawl must equal the
    struct-driven golden run row-for-row."""
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt
    from crawler_spark.operators.html_parse import parse_pages

    g = WebGen("t-smoke")
    web = g.web_pages()
    rows = [{c: web.column(c)[j].as_py() for c in web.column_names}
            for j in range(web.num_rows)]
    raw = spark.createDataFrame(
        [(r["url"], r["host"], r["status_code"], render_page_html(r))
         for r in rows],
        "url string, host string, status_code int, html string")
    parsed = parse_pages(raw)

    html_fix = str(tmp_path / "html-fix")
    os.makedirs(html_fix, exist_ok=True)
    (parsed.select("url", "host", "status_code", "title", "links", "images")
     .write.mode("overwrite").parquet(
         os.path.join(html_fix, "web_pages.parquet")))
    for name in ("seeds", "robots"):
        import shutil
        src = os.path.join(FIXDIR, f"{name}.parquet")
        shutil.copy(src, os.path.join(html_fix, f"{name}.parquet"))

    cfg = CrawlConfig(max_depth=3)
    eng_html = FrontierEngine(spark, cfg, html_fix,
                              fresh_ckpt(str(tmp_path / "ck-html")))
    eng_ref = FrontierEngine(spark, cfg, FIXDIR,
                             fresh_ckpt(str(tmp_path / "ck-ref")))
    key = ["visit_rank", "url", "depth", "parent_url", "link_index",
           "status_code", "batch_id"]
    got = [tuple(r[k] for k in key)
           for r in eng_html.run().orderBy("visit_rank").collect()]
    exp = [tuple(r[k] for k in key)
           for r in eng_ref.run().orderBy("visit_rank").collect()]
    assert got == exp
    assert len(got) > 100
