"""Spark column-expression library (all JVM-side, codegen-friendly).

Every function here returns a Column built from pyspark.sql.functions
primitives — no Python UDFs — so the crawl hot path stays inside
whole-stage codegen.
"""

from .urls import (  # noqa: F401
    canonicalize_url,
    url_hash,
    url_host,
    url_path,
    url_is_http,
    url_slug,
)
from .text import (  # noqa: F401
    breadcrumb_trail,
    categorize_error,
    css_selector,
    top_headings,
    truncate_text,
)
