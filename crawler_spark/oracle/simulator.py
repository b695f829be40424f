"""Single-threaded oracle crawler — the golden reference semantics.

Implements, verbatim and sequentially, the crawl loop of the reference
(/root/reference/lib/crawler/crawler-engine.ts): depth-first preorder
in DOM link order with the URL-seen set claimed at schedule time.
Its outputs (visit order, seen set, page/image/error rows, politeness
batch schedule) are the goldens the Spark engine must reproduce
exactly (tests/test_crawl_golden.py).

Semantics reproduced, with citations:
  * admission order: stop → canonicalize → visited/depth → domain →
    robots → CLAIM (crawler-engine.ts:532-556; claim at :556 happens
    at schedule time, before fetch),
  * canonicalization: fragment drop, query-param stable sort,
    trailing-slash strip (crawler-engine.ts:487-503),
  * DFS preorder: parent awaits each child chain before the next
    sibling (crawler-engine.ts:673-695),
  * tag filter during extraction (crawler-engine.ts:1505,1528,1547),
  * sample mode: links.slice(0,1) AFTER extraction
    (crawler-engine.ts:667-671),
  * link hygiene: fragments / javascript: / mailto: dropped
    (browser-session.ts:3262; non-http schemes never fetched),
  * timeout (status 0) → CrawlError row, no extraction; any fetched
    page (including 404) is extracted — the reference never gates
    extraction on status (crawler-engine.ts:573-716,1704-1709),
  * URLs absent from the synthetic web → 404 error row, no content
    (the fetch stage's deterministic answer for a dead link).

Politeness schedule (north-rule extension; the reference rate-limits
globally at `rateLimit` starts/sec, crawler-engine.ts:81): hosts drain
independently — the k-th visited URL of host h is scheduled in batch
k // host_cap(h). Per-host independence is the politeness contract;
cross-host order inside a batch is free parallelism.

No Spark imports — pure Python over pyarrow-read fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..core.urls import canonicalize_url, url_host, url_path
from ..core.xxhash64 import spark_xxhash64_str
from ..engine.config import CrawlConfig, prio_component


@dataclass
class Visit:
    rank: int
    url: str            # canonical
    url_hash: int
    host: str
    depth: int
    parent_url: str | None
    link_index: int     # -1 for seeds (seed_rank carried in prio[0])
    prio: str           # fixed-width hex priority vector
    status_code: int
    batch_id: int = -1  # filled by assign_batches


@dataclass
class CrawlResult:
    visits: list[Visit] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)   # (page_url, src_canon, caption)
    seen: set[str] = field(default_factory=set)        # canonical urls


class OracleCrawler:
    """web: dict canonical_url -> page-record dict (fixture row);
    robots: dict host -> (disallow_prefixes, crawl_delay_ms)."""

    def __init__(self, web: dict, robots: dict, cfg: CrawlConfig):
        self.web = web
        self.robots = robots
        self.cfg = cfg
        self.res = CrawlResult()
        self.allowed_hosts: set[str] = set()

    # ---- admission predicates (F4, F5) ----

    def _domain_allowed(self, host: str) -> bool:
        if not self.cfg.restrict_domains:
            return True
        if not host:
            return False
        if host in self.allowed_hosts:
            return True
        if self.cfg.include_subdomains:
            return any(host.endswith("." + a) for a in self.allowed_hosts)
        return False

    def _robots_allowed(self, host: str, path: str) -> bool:
        rules = self.robots.get(host)
        if rules is None:
            return True  # allow-all when robots missing (:481-485)
        return not any(path.startswith(p) for p in rules[0] if p)

    # ---- link pipeline of one extracted page ----

    def _followable_links(self, page: dict) -> list[tuple[int, str]]:
        """(link_index, absolute href) honoring tag filter F9 →
        sample slice F8 → hygiene F10/root-relative resolution."""
        links = [l for l in page["links"]
                 if l["element_type"] in self.cfg.follow_link_tags]
        if self.cfg.sample_mode:
            links = links[:1]
        out = []
        page_url = page["url"]
        scheme_host = page_url.split("/", 3)
        origin = scheme_host[0] + "//" + scheme_host[2]
        for l in links:
            href = l["href"].strip()
            if not href or href.startswith("#"):
                continue
            low = href.lower()
            if low.startswith(("http://", "https://")):
                absu = href
            elif href.startswith("/"):
                absu = origin + href
            elif ":" in href.split("/", 1)[0]:
                continue  # javascript:, mailto:, data:, …
            else:
                continue  # non-root-relative forms never emitted by fixtures
            out.append((l["link_index"], absu))
        return out

    # ---- the DFS itself ----

    def _crawl_page(self, raw_url: str, parent: str | None, depth: int,
                    link_index: int, prio: str) -> None:
        canon = canonicalize_url(raw_url)
        # F3: visited check + depth cap — rejected calls do NOT claim
        if canon in self.res.seen or depth > self.cfg.max_depth:
            return
        host = url_host(canon)
        if not self._domain_allowed(host):          # F4
            return
        if not self._robots_allowed(host, url_path(canon)):  # F5
            return
        self.res.seen.add(canon)                    # CLAIM at schedule time (:556)

        page = self.web.get(canon)
        status = page["status_code"] if page is not None else 404
        self.res.visits.append(Visit(
            rank=len(self.res.visits), url=canon,
            url_hash=spark_xxhash64_str(canon), host=host, depth=depth,
            parent_url=parent, link_index=link_index, prio=prio,
            status_code=status,
        ))
        if page is None:
            self.res.errors.append(dict(url=canon, error_type="404",
                                        error_message="not found", depth=depth))
            return
        if status == 0:  # timeout: goto throws → error row, no extraction
            self.res.errors.append(dict(url=canon, error_type="timeout",
                                        error_message="navigation timeout",
                                        depth=depth))
            return
        if status == 404:
            self.res.errors.append(dict(url=canon, error_type="404",
                                        error_message="http 404", depth=depth))
        for im in page["images"]:
            self.res.images.append(dict(page_url=canon,
                                        src=canonicalize_url(im["src"]),
                                        caption=im["alt"]))
        for idx, absu in self._followable_links(page):
            self._crawl_page(absu, canon, depth + 1, idx,
                             prio + prio_component(idx))

    def run(self, seeds: list[tuple[str, int]]) -> CrawlResult:
        """seeds: (raw_url, seed_rank) — crawled sequentially in rank
        order, like repeated crawlPage(startUrl, null, 0)."""
        if self.cfg.restrict_domains:
            self.allowed_hosts = {
                url_host(canonicalize_url(u)) for u, _ in seeds
            } - {""}
        for raw, rank in sorted(seeds, key=lambda s: s[1]):
            self._crawl_page(raw, None, 0, -1, prio_component(rank))
        assign_batches(self.res.visits, self.robots, self.cfg)
        return self.res


def assign_batches(visits: list[Visit], robots: dict, cfg: CrawlConfig) -> None:
    """Politeness schedule: k-th visit of host h → batch k // cap(h)."""
    host_counts: dict[str, int] = {}
    for v in visits:
        delay = robots.get(v.host, (None, 0))[1]
        cap = cfg.host_cap(delay)
        k = host_counts.get(v.host, 0)
        v.batch_id = k // cap
        host_counts[v.host] = k + 1


# ---------------- fixture loading helpers ----------------

def load_fixture_dir(path: str):
    """Read seeds/web_pages/robots parquet into the plain-dict shapes
    the oracle consumes. Returns (seeds, web, robots)."""
    import pyarrow.parquet as pq

    seeds_t = pq.read_table(f"{path}/seeds.parquet")
    seeds = list(zip(seeds_t.column("url").to_pylist(),
                     seeds_t.column("seed_rank").to_pylist()))
    web_rows = pq.read_table(f"{path}/web_pages.parquet").to_pylist()
    web = {r["url"]: r for r in web_rows}
    robots_rows = pq.read_table(f"{path}/robots.parquet").to_pylist()
    robots = {r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"])
              for r in robots_rows}
    return seeds, web, robots


def run_oracle(fixture_dir: str, cfg: CrawlConfig) -> CrawlResult:
    seeds, web, robots = load_fixture_dir(fixture_dir)
    return OracleCrawler(web, robots, cfg).run(seeds)
