"""E1/E2/E5/E14 — the HTML-parse extraction stage, Spark-side.

The engine's fetch stand-in serves pre-parsed structs; a real crawl
fetches raw HTML. This operator closes that gap: given a DataFrame
with (url, html) it extracts, per page, everything the reference pulls
from the live DOM in one `page.evaluate` round-trip —

  * link provenance structs {href,label,selector,element_type,
    pos_x,pos_y,link_index} from a[href] + button[onclick]
    (crawler-engine.ts:1504-1589),
  * the internal/external URL partition incl. onclick/data-href/
    data-url attribute mining (crawler-engine.ts:1368-1412),
  * title / meta description / headings / images / forms
    (crawler-engine.ts:1414-1490),
  * the page CSS with url() refs absolutized against the page URL
    (browser-session.ts:3499-3545) — E14.

The parse kernel is pure stdlib Python
(crawler_spark.core.html_parse); this wrapper crosses into Python
once, over Arrow batches, with ``mapInPandas`` — a narrow transform
that preserves the input partitioning, so at 10^10 pages the parse
rides whatever partitioning the fetch stage produced, with zero
shuffle. Output link/image/form structs match the fixture web_pages
schema exactly, so the frontier engine can crawl FROM raw HTML
(tests/test_html_parse.py pins the round-trip row-for-row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..core.html_parse import parse_page

LINK_T = T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("selector", T.StringType()),
    T.StructField("element_type", T.StringType()),
    T.StructField("pos_x", T.IntegerType()),
    T.StructField("pos_y", T.IntegerType()),
    T.StructField("link_index", T.IntegerType()),
]))
IMG_T = T.ArrayType(T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("alt", T.StringType()),
]))
FORM_T = T.ArrayType(T.StructType([
    T.StructField("action", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("fields", T.ArrayType(T.StringType())),
]))

PARSED_FIELDS = [
    T.StructField("title", T.StringType()),
    T.StructField("meta_description", T.StringType()),
    T.StructField("headings", T.ArrayType(T.StringType())),
    T.StructField("links", LINK_T),
    T.StructField("images", IMG_T),
    T.StructField("forms", FORM_T),
    T.StructField("internal_urls", T.ArrayType(T.StringType())),
    T.StructField("external_urls", T.ArrayType(T.StringType())),
    T.StructField("css", T.StringType()),
]


def parse_pages(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """Parse raw HTML into the extraction structs (module doc).
    Narrow Arrow-batched mapInPandas: input partitioning preserved,
    all non-(url, html) columns carried through untouched."""
    carry = [f for f in pages.schema.fields if f.name != html_col]
    schema = T.StructType(carry + PARSED_FIELDS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_page(h, u)
                      for h, u in zip(pdf[html_col], pdf[url_col])]
            out = pdf.drop(columns=[html_col])
            out = out.assign(
                title=[p.title for p in parsed],
                meta_description=[p.meta_description for p in parsed],
                headings=[p.headings for p in parsed],
                links=[[(ln["href"], ln["label"], ln["selector"],
                         ln["element_type"], ln["pos_x"], ln["pos_y"],
                         ln["link_index"]) for ln in p.links]
                       for p in parsed],
                images=[[(im["src"], im["alt"]) for im in p.images]
                        for p in parsed],
                forms=[[(fm["action"], fm["method"], fm["fields"])
                        for fm in p.forms] for p in parsed],
                internal_urls=[p.internal for p in parsed],
                external_urls=[p.external for p in parsed],
                css=[p.css for p in parsed],
            )
            yield out

    return pages.mapInPandas(batches, schema=schema)
