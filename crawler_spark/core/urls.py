"""URL canonicalization — the pure-Python reference semantics.

Reproduces the reference crawler's ``normalizeUrl``
(/root/reference/lib/crawler/crawler-engine.ts:487-503):

  1. parse the URL; on parse failure return the input unchanged
     (the reference wraps ``new URL(url)`` in try/catch),
  2. drop the ``#fragment``,
  3. stable-sort query parameters by key (``searchParams.sort()`` is a
     stable sort on the parameter NAME, preserving the relative order
     of duplicate keys),
  4. strip one trailing ``/`` from the path unless the path is ``/``.

Plus the JS ``URL`` normalizations the reference inherits implicitly:
scheme+host lowercased, empty path → ``/``, default port dropped.

The Spark-native equivalent (pure column expressions, no Python in the
hot path) lives in ``crawler_spark.functions.urls.canonicalize_url``;
``tests/test_core_kernel.py`` asserts both agree on every URL form in
the fixtures.
"""

from __future__ import annotations

from urllib.parse import urlsplit

# Schemes the frontier admits; anything else (javascript:, mailto:,
# data:) is rejected upstream by the link-hygiene filter (F10).
HTTP_SCHEMES = ("http", "https")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form of *url*; returns *url* unchanged if unparsable."""
    try:
        p = urlsplit(url.strip())
        if not p.scheme or not p.netloc:
            # JS `new URL` throws on scheme-relative / relative input.
            return url
        scheme = p.scheme.lower()
        host = p.hostname.lower() if p.hostname else ""
        if not host:
            return url
        port = p.port
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
        path = p.path or "/"
        if path.endswith("/") and path != "/":
            path = path[:-1]
        query = ""
        if p.query:
            raw = p.query.split("&")
            # stable sort by parameter name only (searchParams.sort()).
            order = sorted(range(len(raw)),
                           key=lambda i: (raw[i].split("=", 1)[0], i))
            query = "&".join(raw[i] for i in order)
        out = f"{scheme}://{netloc}{path}"
        if query:
            out += f"?{query}"
        return out
    except (ValueError, AttributeError):
        return url


def url_host(url: str) -> str:
    """Lowercased hostname, '' if unparsable."""
    try:
        h = urlsplit(url).hostname
        return h.lower() if h else ""
    except ValueError:
        return ""


def url_path(url: str) -> str:
    """Path component ('/' if empty), '' if unparsable."""
    try:
        p = urlsplit(url)
        if not p.scheme or not p.netloc:
            return ""
        return p.path or "/"
    except ValueError:
        return ""


def resolve_href(base_url: str, href: str) -> str | None:
    """Resolve *href* against *base_url* like the in-page extractor
    (new URL(href, location.href) — crawler-engine.ts:1528-1533).

    Returns None for hrefs the link-hygiene filter drops: fragments,
    ``javascript:`` and other non-http(s) schemes
    (browser-session.ts:3262)."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if ":" in href.split("/", 1)[0].split("?", 1)[0]:
        scheme = low.split(":", 1)[0]
        if scheme not in HTTP_SCHEMES:
            return None
        return href
    from urllib.parse import urljoin

    try:
        out = urljoin(base_url, href)
    except ValueError:
        return None
    if not out.lower().startswith(("http://", "https://")):
        return None
    return out


def domain_allowed(url: str, start_host: str, include_subdomains: bool,
                   restrict: bool) -> bool:
    """Domain-restriction filter (F4, crawler-engine.ts:505-523):
    hostname == start_host, or endswith('.' + start_host) when
    include_subdomains; unrestricted when *restrict* is False;
    malformed URL → reject."""
    if not restrict:
        return True
    h = url_host(url)
    if not h:
        return False
    if h == start_host:
        return True
    if include_subdomains and h.endswith("." + start_host):
        return True
    return False
