"""Scalar text/extraction functions as native column expressions.

Each mirrors a reference scalar operator (SURVEY.md §2.3) using only
pyspark.sql.functions primitives — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def breadcrumb_trail(path: Column | str) -> Column:
    """URL path → 'Home > Title Case > #123' breadcrumb
    (crawler-engine.ts:46-75): split on '/', kebab/snake → Title Case,
    all-digit segments → '#n', prefixed with 'Home'."""
    path = F.col(path) if isinstance(path, str) else path
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    pretty = F.transform(
        segs,
        lambda s: F.when(s.rlike(r"^[0-9]+$"), F.concat(F.lit("#"), s)).otherwise(
            F.initcap(F.regexp_replace(s, r"[-_]+", " "))
        ),
    )
    return F.when(
        F.size(pretty) == 0, F.lit("Home")
    ).otherwise(F.concat(F.lit("Home > "), F.array_join(pretty, " > ")))


def categorize_error(message: Column | str) -> Column:
    """Error-type bucketing (crawler-engine.ts:1704-1709): message
    contains 'timeout' → timeout, '404' → 404, 'JavaScript' →
    javascript_error, else other. Case-sensitive contains, first match
    wins, like the reference's if/else chain."""
    m = F.col(message) if isinstance(message, str) else message
    return (
        F.when(m.contains("timeout"), "timeout")
        .when(m.contains("404"), "404")
        .when(m.contains("JavaScript"), "javascript_error")
        .otherwise("other")
    )


def css_selector(tag: Column | str, elem_id: Column | str,
                 classes: Column | str) -> Column:
    """Canonical CSS selector synthesis (one variant of the reference's
    three, crawler-engine.ts:1518-1525): '#id' if id, else
    'tag.cls1.cls2' from the first two classes, else bare tag."""
    tag = F.col(tag) if isinstance(tag, str) else tag
    elem_id = F.col(elem_id) if isinstance(elem_id, str) else elem_id
    classes = F.col(classes) if isinstance(classes, str) else classes
    cls_arr = F.filter(F.split(F.trim(classes), r"\s+"), lambda c: c != "")
    cls_sel = F.array_join(
        F.transform(F.slice(cls_arr, 1, 2), lambda c: F.concat(F.lit("."), c)), ""
    )
    return (
        F.when((elem_id.isNotNull()) & (elem_id != ""), F.concat(F.lit("#"), elem_id))
        .when(F.size(cls_arr) > 0, F.concat(F.lower(tag), cls_sel))
        .otherwise(F.lower(tag))
    )


def truncate_text(text: Column | str, limit: int = 5000) -> Column:
    """Scrape-mode text cap: substring(0, 5000)
    (crawler-engine.ts:1487)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.substring(text, 1, limit)


def top_headings(headings: Column | str, k: int = 3) -> Column:
    """Crawl-mode heading projection: first k only
    (crawler-engine.ts:1452)."""
    headings = F.col(headings) if isinstance(headings, str) else headings
    return F.slice(headings, 1, k)
