"""Crawl semantics shared verbatim by the Spark engine and the
single-threaded reference simulator.

Everything order-sensitive lives here so the two implementations cannot
diverge: the page scraper, link canonicalization, priority decay,
politeness tie-breaking, and the global fetch-sequence order. The golden
gate (BASELINE.md: "crawl-order + URL-seen exact match") holds because
both engines call exactly these functions with exactly these orderings.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..scraper import FAIL, attr, attrs, chroots, sdo
from ..selector import any_selector, tag
from ..index import parse_spec
from .hashing import murmur3_64
from .urlnorm import canonicalize_url

#: priority decay per discovery hop
PRIORITY_DECAY = 0.8
#: budget for hosts missing from the robots table
DEFAULT_BUDGET = 3

#: image+caption records per page — the reference acceptance shape
#: (examples/generalized-repetition/Main.hs:36-44): per-<img> (src, alt)
PAGE_SCRAPER = sdo(
    chroots("img", sdo(attr("src", any_selector), attr("alt", any_selector))),
    attrs("href", tag("a")),
)


@dataclass
class PageExtract:
    images: list  # [(image_id, src, caption)]
    links: list  # canonical, deduped, in first-seen document order


def image_id_from_src(src: str) -> str | None:
    """src convention: http://host/img/<image_id>.<png|jpg>"""
    if "/img/" not in src:
        return None
    tail = src.rsplit("/", 1)[-1]
    return tail[:-4] if tail.endswith((".png", ".jpg")) else None


def extract_page(html: str, base_url: str) -> PageExtract:
    v = PAGE_SCRAPER.run(parse_spec(html))
    if v is FAIL:
        return PageExtract([], [])
    img_pairs, hrefs = v
    images = []
    for src, alt in img_pairs:
        iid = image_id_from_src(src)
        images.append((iid, src, alt))
    links = []
    seen_local = set()
    for href in hrefs:
        c = canonicalize_url(href, base=base_url)
        if c is None or c in seen_local:
            continue
        seen_local.add(c)
        links.append(c)
    return PageExtract(images, links)


def url_hash(url: str) -> int:
    return murmur3_64(url)


def is_disallowed(url: str, disallow_prefixes) -> bool:
    if not disallow_prefixes:
        return False
    # path component incl. leading slash, query/fragment stripped
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    for stop in ("?", "#"):
        cut = path.find(stop)
        if cut >= 0:
            path = path[:cut]
    return any(path.startswith(p) for p in disallow_prefixes)


def politeness_sort_key(entry) -> tuple:
    """Within-host frontier order: priority DESC, url_hash ASC, url ASC.
    ``entry`` is any object with .priority/.url_hash/.url attributes."""
    return (-entry.priority, entry.url_hash, entry.url)


def fetch_seq_sort_key(host: str, rank: int) -> tuple:
    """Global order of a round's fetch batch: (host ASC, rank ASC)."""
    return (host, rank)


def child_priority(parent_priority: float) -> float:
    return parent_priority * PRIORITY_DECAY
