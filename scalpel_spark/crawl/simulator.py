"""Single-threaded pure-Python reference crawler.

Produces the golden crawl order + URL-seen set (FIXTURES.md §6) that the
Spark engine must reproduce exactly (BASELINE.json north_rule). Shares
every order-sensitive rule with the engine via ``crawl.logic``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .logic import (
    DEFAULT_BUDGET,
    child_priority,
    extract_page,
    is_disallowed,
    politeness_sort_key,
    url_hash,
)
from .urlnorm import canonicalize_url, url_host


@dataclass
class FrontierEntry:
    url: str
    url_hash: int
    host: str
    priority: float
    depth: int
    parent_url: str


@dataclass
class FetchRecord:
    fetch_seq: int
    round: int
    url: str
    url_hash: int
    host: str
    parent_url: str
    status: int
    n_images: int


@dataclass
class SimResult:
    fetch_log: list = field(default_factory=list)  # [FetchRecord]
    seen: dict = field(default_factory=dict)  # url_hash -> url
    images: list = field(default_factory=list)  # [(page_url, image_id, src, caption)]
    rounds: int = 0


def simulate_crawl(
    pages: dict,
    seeds: list,
    robots: dict,
    max_rounds: int = 100,
    max_fetches: int | None = None,
) -> SimResult:
    """``pages``: url -> row dict (html, status, ...); ``seeds``:
    [{url, priority}]; ``robots``: host -> row dict."""
    res = SimResult()
    frontier: list[FrontierEntry] = []
    # membership is keyed by the exact URL (the engine anti-joins on
    # (url_hash, url)); res.seen keeps the hash→url view for reporting
    seen_urls: set[str] = set()

    def robots_for(host: str):
        r = robots.get(host)
        if r is None:
            return DEFAULT_BUDGET, []
        return r["max_fetches_per_round"], r.get("disallow_prefixes") or []

    # enqueue seeds (canonicalized, deduped, robots-filtered)
    for s in sorted(seeds, key=lambda s: (s["url"],)):
        c = canonicalize_url(s["url"])
        if c is None:
            continue
        if c in seen_urls:
            continue
        h = url_hash(c)
        host = url_host(c) or ""
        _, dis = robots_for(host)
        if is_disallowed(c, dis):
            continue
        seen_urls.add(c)
        res.seen[h] = c
        frontier.append(FrontierEntry(c, h, host, float(s["priority"]), 0, ""))

    seq = 0
    for rnd in range(max_rounds):
        if not frontier or (max_fetches is not None and seq >= max_fetches):
            break
        # politeness: top-k per host
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in frontier:
            by_host.setdefault(e.host, []).append(e)
        batch: list[tuple[str, int, FrontierEntry]] = []
        remaining: list[FrontierEntry] = []
        for host, entries in by_host.items():
            entries.sort(key=politeness_sort_key)
            budget, _ = robots_for(host)
            for rank, e in enumerate(entries):
                if rank < budget:
                    batch.append((host, rank, e))
                else:
                    remaining.append(e)
        batch.sort(key=lambda t: (t[0], t[1]))  # (host ASC, rank ASC)
        if max_fetches is not None:
            allowed = max_fetches - seq
            dropped = batch[allowed:]
            batch = batch[:allowed]
            remaining.extend(e for _, _, e in dropped)

        new_entries: list[FrontierEntry] = []
        for host, rank, e in batch:
            page = pages.get(e.url)
            status = page["status"] if page is not None else 0
            n_images = 0
            if page is not None and status == 200:
                ext = extract_page(page["html"], e.url)
                n_images = len(ext.images)
                for iid, src, cap in ext.images:
                    res.images.append((e.url, iid, src, cap))
                for link in ext.links:
                    if link in seen_urls:
                        continue
                    h = url_hash(link)
                    lhost = url_host(link) or ""
                    _, dis = robots_for(lhost)
                    if is_disallowed(link, dis):
                        continue
                    seen_urls.add(link)
                    res.seen[h] = link
                    new_entries.append(
                        FrontierEntry(
                            link, h, lhost, child_priority(e.priority), e.depth + 1, e.url
                        )
                    )
            res.fetch_log.append(
                FetchRecord(seq, rnd, e.url, e.url_hash, e.host, e.parent_url, status, n_images)
            )
            seq += 1
        frontier = remaining + new_entries
        res.rounds = rnd + 1
    return res
