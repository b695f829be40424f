"""Crawl configuration — the engine's analog of the reference's
``CrawlConfig`` (/root/reference/lib/types/crawler.ts:1-24).

Shared verbatim by the pure-Python oracle simulator
(crawler_spark.oracle.simulator) and the Spark engine
(crawler_spark.engine.frontier) so both sides run under identical
semantics: max depth, rate limit, sample mode, followLinkTags,
domain restriction, politeness batch window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reference defaults: maxDepth 3, rateLimit 10
# (/root/reference/components/crawler/crawler-form.tsx:26-27); engine
# default followLinkTags ['a','button']
# (/root/reference/lib/crawler/crawler-engine.ts:1505,1528,1547).
DEFAULT_MAX_DEPTH = 3
DEFAULT_RATE_LIMIT = 10
DEFAULT_FOLLOW_TAGS = ("a", "button")

# Priority-vector components are fixed-width hex so that plain string
# comparison equals lexicographic comparison of (seed_rank, link_index,
# ...) vectors; 4 hex digits → up to 65535 links per page / seeds.
PRIO_WIDTH = 4
PRIO_MAX = 16**PRIO_WIDTH - 1


@dataclass(frozen=True)
class CrawlConfig:
    """Deterministic crawl parameters.

    ``max_depth``: calls with depth > max_depth are rejected WITHOUT
    claiming the URL (crawler-engine.ts:541-549).
    ``rate_limit``: max fetch starts per host per batch window when the
    host sets no crawl-delay (reference: global starts/sec,
    crawler-engine.ts:81; the per-host upgrade is the north-rule
    politeness scheduler).
    ``sample_mode``: process only the first extracted link per page
    (links.slice(0,1), crawler-engine.ts:667-671).
    ``follow_link_tags``: element types followed (F9).
    ``restrict_domains``: when True only hosts of the seed list are
    admitted; ``include_subdomains`` extends to '.host' suffixes
    (F4, crawler-engine.ts:505-523).
    ``batch_window_ms``: politeness window a batch represents; a host
    with crawl_delay d gets floor(window/d) slots per batch, min 1,
    capped at rate_limit.
    ``custom_headers``: extra HTTP headers applied to EVERY fetch
    (reference: page.setExtraHTTPHeaders before navigation,
    crawler-engine.ts:565-566) — per-request constants the HTTP
    mapInPandas stage attaches; they ride in the run manifest and can
    never alter scheduling. Stored as a kv tuple so the config stays
    hashable/frozen; ``fetch_headers()`` gives the dict.
    ``file_type_filters`` / ``captcha_enabled`` / ``captcha_service``:
    reference-parity config surface with deliberately NO behavior —
    the reference declares them (types/crawler.ts:14,19-23) and never
    reads them anywhere in lib/ (verified by grep over the tree), so
    faithful parity is accepting + recording them while leaving the
    schedule untouched (pinned by tests/test_config_manifest.py). The
    reference's ``captchaSolving.apiKey`` is intentionally NOT
    modeled: a secret does not belong in a config that gets persisted
    into checkpoint manifests.
    """

    max_depth: int = DEFAULT_MAX_DEPTH
    rate_limit: int = DEFAULT_RATE_LIMIT
    sample_mode: bool = False
    follow_link_tags: tuple[str, ...] = DEFAULT_FOLLOW_TAGS
    restrict_domains: bool = False
    include_subdomains: bool = True
    batch_window_ms: int = 1000
    custom_headers: tuple[tuple[str, str], ...] = ()
    file_type_filters: tuple[str, ...] = ()
    captcha_enabled: bool = False
    captcha_service: str = ""

    def host_cap(self, crawl_delay_ms: int) -> int:
        """Fetch starts allowed for a host within one batch window."""
        if crawl_delay_ms and crawl_delay_ms > 0:
            return max(1, min(self.rate_limit, self.batch_window_ms // crawl_delay_ms))
        return self.rate_limit

    def fetch_headers(self) -> dict[str, str]:
        """The per-request header map the HTTP fetch stage applies."""
        return dict(self.custom_headers)

    def manifest(self) -> dict:
        """JSON-safe echo of every field — written to the checkpoint
        once at crawl start and asserted unchanged on resume (a crawl
        resumed under different parameters would silently mix two
        schedules' semantics)."""
        from dataclasses import asdict

        def _plain(v):
            return list(map(_plain, v)) if isinstance(v, tuple) else v

        return {k: _plain(v) for k, v in asdict(self).items()}


def prio_component(index: int) -> str:
    """Fixed-width hex encoding of one priority-vector component."""
    if not 0 <= index <= PRIO_MAX:
        raise ValueError(f"priority component {index} out of range")
    return format(index, f"0{PRIO_WIDTH}x")
