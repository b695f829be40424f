"""Pure-Python HTML page parser — the E1 extraction stage's kernel.

Re-implements, over raw HTML text, what the reference extracts from
the live DOM inside `page.evaluate`:

  * link provenance records {url,label,selector,element_type,position}
    from `a[href]` and `button[onclick]` with the
    `location.href=`/`window.location=` regex
    (/root/reference/lib/crawler/crawler-engine.ts:1504-1589),
  * the internal/external URL partition from anchors plus URL mining
    of onclick/data-href/data-url attributes on clickable elements
    (crawler-engine.ts:1368-1412),
  * the CSS `url()` → absolute rewrite applied to captured styles
    (browser-session.ts:3499-3545),
  * title / meta description / headings / images / forms
    (crawler-engine.ts:1414-1490 page-data evaluate).

The CSS selector synthesis is the reference's `getSelector`:
`#id` if the element has an id, else `tag.c1.c2…` from className,
else the bare tag name (crawler-engine.ts:1517-1524).

Positions come from `data-x`/`data-y` attributes when present: Spark
executors have no layout engine, so the renderer (fixtures) embeds
the coordinates the reference would read from
`getBoundingClientRect()`; absent attributes yield (0, 0), matching
an unlaid-out DOM.

stdlib-only (html.parser) so executors need no extra packages; the
Spark-side wrapper (crawler_spark.operators.html_parse) maps this
over Arrow batches with mapInPandas.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

_ONCLICK_NAV_RE = re.compile(
    r"(?:location\.href|window\.location)\s*=\s*['\"]([^'\"]+)['\"]")
_URL_MINE_RE = re.compile(r"(?:https?://|/)[^\s\"'`)]+")
_CSS_URL_RE = re.compile(r"url\(['\"]?([^'\")]+)['\"]?\)")
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_CLICKABLE_ONCLICK = {"button", "div", "span"}


def css_selector(tag: str, attrs: dict) -> str:
    """Reference getSelector (crawler-engine.ts:1517-1524)."""
    if attrs.get("id"):
        return f"#{attrs['id']}"
    classes = [c for c in (attrs.get("class") or "").split(" ") if c]
    if classes:
        return tag.lower() + "." + ".".join(classes)
    return tag.lower()


def absolutize_css(css: str, base_url: str) -> str:
    """Rewrite every url(...) ref absolute against *base_url*
    (browser-session.ts:3509-3535): output always `url('abs')`."""
    return _CSS_URL_RE.sub(
        lambda m: f"url('{urljoin(base_url, m.group(1))}')", css)


@dataclass
class ParsedPage:
    title: str | None = None
    meta_description: str | None = None
    headings: list[str] = field(default_factory=list)
    links: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    forms: list[dict] = field(default_factory=list)
    internal: list[str] = field(default_factory=list)
    external: list[str] = field(default_factory=list)
    css: str = ""


class _PageParser(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.host = urlsplit(base_url).hostname or ""
        self.out = ParsedPage()
        self._text_stack: list[list[str]] = []  # open text-capturing elems
        self._capture: list[tuple[str, dict]] = []  # (tag, attrs)
        self._in_style = False
        self._form: dict | None = None
        self._mined: list[tuple[str, dict]] = []
        self._link_index = 0

    # -- helpers --

    def _push_capture(self, tag, attrs):
        self._capture.append((tag, attrs))
        self._text_stack.append([])

    def _pop_capture(self, tag):
        for k in range(len(self._capture) - 1, -1, -1):
            if self._capture[k][0] == tag:
                _, attrs = self._capture.pop(k)
                text = "".join(self._text_stack.pop(k)).strip()
                return attrs, text
        return None, ""

    def _add_link(self, url, label, selector, etype, attrs):
        self.out.links.append(dict(
            href=url, label=label, selector=selector, element_type=etype,
            pos_x=int(attrs.get("data-x") or 0),
            pos_y=int(attrs.get("data-y") or 0),
            link_index=self._link_index))
        self._link_index += 1

    def _partition(self, abs_url: str):
        """internal/external split with first-seen dedup
        (crawler-engine.ts:1377-1404)."""
        host = urlsplit(abs_url).hostname or ""
        bucket = self.out.internal if host == self.host else self.out.external
        if abs_url not in bucket:
            bucket.append(abs_url)

    # -- HTMLParser hooks --

    def handle_starttag(self, tag, attrs_list):
        attrs = dict(attrs_list)
        if tag in ("a", "button", "title") or tag in _HEADING_TAGS:
            self._push_capture(tag, attrs)
        if tag == "style":
            self._in_style = True
        if tag == "meta" and attrs.get("name") == "description":
            self.out.meta_description = attrs.get("content")
        if tag == "img" and attrs.get("src"):
            self.out.images.append(dict(src=attrs["src"],
                                        alt=attrs.get("alt") or ""))
        if tag == "form":
            self._form = dict(action=attrs.get("action") or "",
                              method=(attrs.get("method") or "get").lower(),
                              fields=[])
        if tag == "input" and self._form is not None:
            name = attrs.get("name")
            if name:
                self._form["fields"].append(name)
        if tag == "link" and (attrs.get("rel") or "").lower() == "stylesheet" \
                and attrs.get("href"):
            self.out.css += (f"/* stylesheet "
                             f"{urljoin(self.base, attrs['href'])} */\n")
        # URL mining candidates (crawler-engine.ts:1387-1407):
        # *[onclick] on clickable tags, any [data-href] / [data-url]
        if ((attrs.get("onclick") and tag in _CLICKABLE_ONCLICK)
                or "data-href" in attrs or "data-url" in attrs):
            self._mined.append((tag, attrs))

    def handle_endtag(self, tag):
        if tag == "style":
            self._in_style = False
            return
        if tag == "title":
            attrs, text = self._pop_capture("title")
            if attrs is not None and self.out.title is None:
                self.out.title = text
            return
        if tag in _HEADING_TAGS:
            attrs, text = self._pop_capture(tag)
            if attrs is not None:
                self.out.headings.append(text)
            return
        if tag == "a":
            attrs, text = self._pop_capture("a")
            if attrs is not None and attrs.get("href"):
                label = text or attrs.get("title") or ""
                self._add_link(attrs["href"], label,
                               css_selector("a", attrs), "a", attrs)
                try:
                    self._partition(urljoin(self.base, attrs["href"]))
                except ValueError:
                    pass
            return
        if tag == "button":
            attrs, text = self._pop_capture("button")
            if attrs is not None:
                m = _ONCLICK_NAV_RE.search(attrs.get("onclick") or "")
                if m:
                    self._add_link(m.group(1), text,
                                   css_selector("button", attrs), "button",
                                   attrs)
            return
        if tag == "form":
            if self._form is not None:
                self.out.forms.append(self._form)
                self._form = None

    def handle_data(self, data):
        if self._in_style:
            self.out.css += data
        for buf in self._text_stack:
            buf.append(data)

    # -- finish --

    def result(self) -> ParsedPage:
        # mine onclick/data-href/data-url attribute URLs
        # (crawler-engine.ts:1392-1404)
        for _tag, attrs in self._mined:
            for attr in (attrs.get("onclick") or "",
                         attrs.get("data-href") or "",
                         attrs.get("data-url") or ""):
                for m in _URL_MINE_RE.findall(attr):
                    try:
                        self._partition(urljoin(self.base, m))
                    except ValueError:
                        pass
        self.out.css = absolutize_css(self.out.css.strip(), self.base)
        return self.out


def parse_page(html: str, base_url: str) -> ParsedPage:
    """Parse one raw-HTML document → ParsedPage (see module doc)."""
    p = _PageParser(base_url)
    p.feed(html or "")
    p.close()
    return p.result()
