"""URL column functions — pure native expressions (no Python UDFs).

``canonicalize_url`` re-expresses the reference's ``normalizeUrl``
(/root/reference/lib/crawler/crawler-engine.ts:487-503) as a Catalyst
expression tree: fragment drop, stable query-param sort by key,
trailing-slash strip, lowercased scheme/host, default-port drop,
passthrough on unparsable input. Exact parity with the pure-Python
reference semantics (crawler_spark.core.urls.canonicalize_url) is
asserted in tests/test_core_kernel.py over the full fixture URL
corpus.

Being native expressions these stay inside whole-stage codegen and run
on 10^10-row frontiers without a Python crossing; xxhash64 keys are
Spark's built-in (seed 42), so the oracle simulator's pure-Python
XXH64 produces identical 64-bit keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority with a non-empty authority, no /?# inside it
_VALID_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def _sorted_query(query: Column) -> Column:
    """Stable sort of 'a=1&b=2' params by key (searchParams.sort()
    semantics: sort on the NAME only, duplicates keep input order).
    Implemented as sort of struct(key, original_index, raw) — struct
    ordering compares fields in declaration order, giving the stable
    tie-break for free."""
    parts = F.split(query, "&")
    keyed = F.transform(
        parts,
        lambda x, i: F.struct(
            F.split(x, "=").getItem(0).alias("k"),
            i.alias("i"),
            x.alias("v"),
        ),
    )
    return F.array_join(F.transform(F.array_sort(keyed), lambda s: s["v"]), "&")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL column; unparsable input passes through unchanged."""
    url = F.col(url) if isinstance(url, str) else url
    t = F.trim(url)
    valid = t.rlike(_VALID_RE)

    scheme = F.lower(F.regexp_extract(t, _SCHEME_RE, 1))
    auth = F.regexp_extract(t, _AUTH_RE, 1)
    # authority = host[:port]; userinfo not admitted by the frontier
    host = F.lower(F.regexp_extract(auth, r"^([^:]+)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    default_port = F.when(scheme == "http", "80").when(scheme == "https", "443").otherwise("")
    netloc = F.when((port == "") | (port == default_port), host).otherwise(
        F.concat(host, F.lit(":"), port)
    )

    raw_path = F.regexp_extract(t, _PATH_RE, 1)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    # strip ONE trailing '/' unless the path is exactly '/'
    path = F.when(path == "/", path).otherwise(F.regexp_replace(path, r"/$", ""))

    query = F.regexp_extract(t, _QUERY_RE, 1)
    qpart = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), _sorted_query(query)))

    canon = F.concat(scheme, F.lit("://"), netloc, path, qpart)
    return F.when(valid & (host != ""), canon).otherwise(url)


def url_hash(url: Column | str) -> Column:
    """64-bit frontier key: Spark built-in xxhash64 (seed 42) of the
    canonical URL string. The oracle simulator reproduces it bit-exact
    in pure Python (crawler_spark.core.xxhash64.spark_xxhash64_str)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(url)


def url_host(url: Column | str) -> Column:
    """Lowercased hostname ('' if unparsable) — the politeness
    partition key."""
    url = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(F.trim(url), _AUTH_RE, 1)
    return F.lower(F.regexp_extract(auth, r"^([^:]+)", 1))


def url_path(url: Column | str) -> Column:
    """Path component, '/' when empty, '' if unparsable (robots
    prefix-match input)."""
    url = F.col(url) if isinstance(url, str) else url
    t = F.trim(url)
    raw = F.regexp_extract(t, _PATH_RE, 1)
    return F.when(~t.rlike(_VALID_RE), "").when(raw == "", "/").otherwise(raw)


def url_is_http(url: Column | str) -> Column:
    """Link-hygiene filter (F10, browser-session.ts:3262): admit only
    http(s), rejecting fragments / javascript: / mailto: etc."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.trim(url)).rlike(r"^https?://[^/?#]+")


def url_slug(url: Column | str) -> Column:
    """Filesystem-safe slug of host+path+query: lowercase,
    [^a-z0-9]+ → '-', trim/collapse '-', fallback 'index'
    (browser-session.ts:3196-3222)."""
    url = F.col(url) if isinstance(url, str) else url
    t = F.trim(url)
    q = F.regexp_extract(t, _QUERY_RE, 1)
    hostpathq = F.concat(
        F.regexp_extract(t, _AUTH_RE, 1),
        F.regexp_extract(t, _PATH_RE, 1),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    s = F.lower(hostpathq)
    s = F.regexp_replace(s, r"[^a-z0-9]+", "-")
    s = F.regexp_replace(s, r"^-+|-+$", "")
    return F.when(s == "", "index").otherwise(s)


def valid_screenshot_id(name: Column | str) -> Column:
    """F12 path-traversal / id-validation guard for screenshot serving
    (app/api/screenshots/[filename]/route.ts:15-17): a filename is
    valid iff it is non-empty and contains no '..', '/' or '\\'
    (anything else 400s before touching the filesystem)."""
    name = F.col(name) if isinstance(name, str) else name
    return (name.isNotNull() & (name != "")
            & ~name.contains("..") & ~name.contains("/")
            & ~name.contains("\\"))
