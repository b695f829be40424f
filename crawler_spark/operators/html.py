"""HTML capture transforms — the S7/E13/E14 surface
(/root/reference/lib/recorder/browser-session.ts:3308-3637): the
no-JS snapshot sanitizer and the E11 content differ.

The reference runs these as in-browser JS; here they are pure
functions of (html, base_url) in Arrow-batched pandas UDFs — the
sanctioned Python crossing for string transforms regexes can't
express column-natively. Regex-based (stdlib only; no bs4/lxml in
this container) and deterministic."""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>",
                        re.IGNORECASE | re.DOTALL)
_META_REFRESH_RE = re.compile(
    r"<meta\b[^>]*http-equiv\s*=\s*['\"]?refresh['\"]?[^>]*>", re.IGNORECASE)
_ON_ATTR_RE = re.compile(r"\s+on[a-z]+\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
                         re.IGNORECASE)
_HREF_SRC_RE = re.compile(r"(\b(?:href|src)\s*=\s*[\"'])(/[^\"'/][^\"']*)",
                          re.IGNORECASE)
_JS_HREF_RE = re.compile(r"(\bhref\s*=\s*[\"'])javascript:[^\"']*",
                         re.IGNORECASE)

BANNER = "<!-- static no-js snapshot -->"


def sanitize_html_str(html: str, base_url: str) -> str:
    """E13 semantics (browser-session.ts:3488-3626): strip <script>
    blocks and meta-refresh, drop on* handler attributes, neutralize
    javascript: hrefs, absolutize root-relative href/src against the
    page origin, prepend a banner comment."""
    if html is None:
        return None
    m = re.match(r"^(https?://[^/]+)", base_url or "")
    origin = m.group(1) if m else ""
    out = _SCRIPT_RE.sub("", html)
    out = _META_REFRESH_RE.sub("", out)
    out = _ON_ATTR_RE.sub("", out)
    out = _JS_HREF_RE.sub(r"\1#", out)
    if origin:
        out = _HREF_SRC_RE.sub(lambda mo: mo.group(1) + origin + mo.group(2),
                               out)
    return BANNER + "\n" + out


@pandas_udf(StringType())
def sanitize_html(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series([sanitize_html_str(h, b)
                      for h, b in zip(html, base_url)])


def content_diff_str(prev: str, cur: str, ctx: int = 50) -> str | None:
    """E11 (browser-session.ts:4227-4243): first-divergence diff —
    'Changed from position i: \"…50 chars\" to \"…50 chars\"'; None
    when equal."""
    if prev == cur:
        return None
    prev = prev or ""
    cur = cur or ""
    n = min(len(prev), len(cur))
    i = next((k for k in range(n) if prev[k] != cur[k]), n)
    return (f'Changed from position {i}: "{prev[i:i + ctx]}" '
            f'to "{cur[i:i + ctx]}"')


@pandas_udf(StringType())
def content_diff(prev: pd.Series, cur: pd.Series) -> pd.Series:
    return pd.Series([content_diff_str(p, c) for p, c in zip(prev, cur)])
