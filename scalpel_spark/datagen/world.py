"""Deterministic synthetic web world (seed=42, no external data).

Produces the four fixture tables of FIXTURES.md §§1-4:

* ``images``  — exactly the BASELINE.json input_hint schema
  ``(image_id, bytes, w, h, fmt, caption, phash)``; a fixed fraction is
  "lossy" (quantized before PNG encode) to exercise the PSNR≥40dB gate.
  Ground-truth pixels are regenerable from ``image_id`` alone
  (``image_pixels``), so fidelity checks never need a second copy.
* ``pages``   — crawlable HTML corpus: nested comment divs (the
  reference README/example shape), ``<img class='comment image'>`` tags
  whose src/alt carry image_id/caption, ``<a href>`` crawl edges incl.
  non-canonical variants, malformed fragments (unclosed tags,
  out-of-order closes per TestMain.hs:399-447), Zipf-skewed host sizes
  (hot-host salting test).
* ``seeds``   — fixed sample of page URLs.
* ``robots``  — per-host politeness budgets + disallow prefixes.

Everything is a pure function of (seed, params); tables are written as
parquet with pyarrow (no Spark dependency, usable from the pure-Python
simulator too).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil

import numpy as np

from .images import encode_png, mean_hash_64

#: Bump whenever any datagen wire format changes (PNG/JPEG/WAV codecs,
#: page HTML shape, phash definition). Cached ``data/`` worlds are
#: reused across rounds on disk; the version file written by
#: ``write_world`` ties a world to the codec generation that produced
#: it, so a format fix (e.g. the r4 JPEG zigzag correction) can never
#: leave a stale world whose stored phash silently disagrees with what
#: the current decoder extracts from its blobs. v2 = post-zigzag-fix.
DATAGEN_VERSION = 2

_CAPTION_ADJ = ["cat", "dog", "bird", "fish", "fox", "owl", "frog", "bear"]
_CAPTION_KIND = ["picture", "photo", "drawing", "sketch", "portrait"]
_AUTHORS = ["Sally", "Bill", "Susan", "Ada", "Linus", "Grace", "Edsger", "Barbara"]


@dataclasses.dataclass(frozen=True)
class WorldParams:
    seed: int = 42
    n_hosts: int = 20
    n_pages: int = 400
    n_images: int = 120
    zipf_a: float = 1.3
    mean_outlinks: int = 6
    lossy_fraction: float = 0.25
    error_fraction: float = 0.03
    latin1_fraction: float = 0.05
    #: fraction of pages used as seeds (None → ~1/50); 1.0 = every page
    #: (single-mega-round saturation benchmarks)
    seed_fraction: float | None = None
    #: politeness budget range (robots.max_fetches_per_round)
    budget_min: int = 2
    budget_max: int = 8
    #: multiplies comment blocks per page — fattens html for
    #: compute-bound benchmarking
    page_weight: int = 1
    #: fraction of images encoded as baseline JPEG (pure-numpy codec,
    #: quality 100 ⇒ PSNR ≥ ~50 dB, inside the ≥40 dB lossy gate);
    #: 0.0 (default) keeps historical worlds byte-identical
    jpeg_fraction: float = 0.0


def _host(h: int) -> str:
    return f"host-{h:04d}.example"


def image_caption(i: int) -> str:
    adj = _CAPTION_ADJ[i % len(_CAPTION_ADJ)]
    kind = _CAPTION_KIND[(i // len(_CAPTION_ADJ)) % len(_CAPTION_KIND)]
    return f"A {adj} {kind} #{i}."


def image_pixels(i: int, seed: int = 42) -> np.ndarray:
    """Deterministic ground-truth pixels for image ``i``."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    h = int(rng.integers(8, 65))
    w = int(rng.integers(8, 65))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def is_lossy(i: int, params: WorldParams) -> bool:
    """Rows whose stored bytes differ from ground truth (quantized PNG
    or JPEG) — the PSNR≥40dB branch of the fidelity gate."""
    return is_jpeg(i, params) or _is_quantized(i, params)


def _is_quantized(i: int, params: WorldParams) -> bool:
    rng = np.random.default_rng(params.seed * 7_000_003 + i)
    return bool(rng.random() < params.lossy_fraction)


def is_jpeg(i: int, params: WorldParams) -> bool:
    if params.jpeg_fraction <= 0.0:
        return False
    rng = np.random.default_rng(params.seed * 11_000_027 + i)
    return bool(rng.random() < params.jpeg_fraction)


def image_ext(i: int, params: WorldParams) -> str:
    return "jpg" if is_jpeg(i, params) else "png"


def make_image_row(i: int, params: WorldParams):
    px = image_pixels(i, params.seed)
    h, w = px.shape[0], px.shape[1]
    if is_jpeg(i, params):
        from .jpeg import decode_jpeg, encode_jpeg

        # q=100 baseline JPEG: PSNR ≥ ~50 dB even on noise images.
        # phash is computed from the DECODED pixels so the stored
        # phash == recompute-from-bytes invariant stays exact.
        blob = encode_jpeg(px, quality=100)
        return {
            "image_id": f"img-{i:08d}",
            "bytes": blob,
            "w": w,
            "h": h,
            "fmt": "jpeg",
            "caption": image_caption(i),
            "phash": mean_hash_64(decode_jpeg(blob)),
        }
    if _is_quantized(i, params):
        # 64-level quantization: max err 2 ⇒ PSNR ≈ 47 dB (≥ 40 dB gate)
        enc_px = ((px >> 2) << 2) + 2
    else:
        enc_px = px
    blob = encode_png(enc_px)
    return {
        "image_id": f"img-{i:08d}",
        "bytes": blob,
        "w": w,
        "h": h,
        "fmt": "png",
        "caption": image_caption(i),
        "phash": mean_hash_64(enc_px),
    }


def _page_url(host: str, p: int) -> str:
    return f"http://{host}/page/{p}"


def _noncanonical(url: str, variant: int) -> str:
    """Rewrites that canonicalize back to ``url`` — exercising the URL
    normalizer through real crawl edges."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    v = variant % 5
    if v == 0:
        return f"HTTP://{host.upper()}/{path}"
    if v == 1:
        return f"{scheme}://{host}:80/{path}"
    if v == 2:
        return f"{scheme}://{host}/./{path}"
    if v == 3:
        return f"{scheme}://{host}/a/../{path}"
    return url + "#section"


def generate_world(params: WorldParams):
    """→ dict of lists-of-dicts: images, pages, seeds, robots."""
    rng = np.random.default_rng(params.seed)

    images = [make_image_row(i, params) for i in range(params.n_images)]

    # Zipf-skewed page counts per host
    weights = 1.0 / np.power(np.arange(1, params.n_hosts + 1), params.zipf_a)
    weights /= weights.sum()
    host_of_page = rng.choice(params.n_hosts, size=params.n_pages, p=weights)
    host_of_page.sort()
    page_idx_in_host: dict[int, int] = {}
    page_urls: list[str] = []
    page_hosts: list[str] = []
    for h in host_of_page:
        p = page_idx_in_host.get(h, 0)
        page_idx_in_host[h] = p + 1
        page_urls.append(_page_url(_host(h), p))
        page_hosts.append(_host(h))

    pages = []
    n = params.n_pages
    for pi, (url, host) in enumerate(zip(page_urls, page_hosts)):
        prng = np.random.default_rng(params.seed * 31 + pi)
        n_out = int(prng.poisson(params.mean_outlinks))
        targets = prng.integers(0, n, size=n_out)
        out_links = []
        hrefs = []
        for t_i, t in enumerate(targets):
            target = page_urls[int(t)]
            out_links.append(target)
            style = int(prng.integers(0, 8))
            if style < 3:
                hrefs.append(target)
            elif style < 6:
                hrefs.append(_noncanonical(target, int(prng.integers(0, 5))))
            else:
                # relative link (same-host targets only; else absolute)
                if target.startswith(f"http://{host}/"):
                    hrefs.append("/" + target.split("/", 3)[3])
                else:
                    hrefs.append(target)

        n_imgs = int(prng.integers(0, 4)) * params.page_weight
        img_ids = [
            f"img-{int(prng.integers(0, params.n_images)):08d}" for _ in range(n_imgs)
        ]

        comments = []
        for ci, iid in enumerate(img_ids):
            author = _AUTHORS[int(prng.integers(0, len(_AUTHORS)))]
            idx = int(iid.split("-")[1])
            cap = image_caption(idx)
            comments.append(
                "<div class='comment container'>"
                f"<span class='comment author'>{author}</span>"
                f"<img alt='{cap}' class='comment image' "
                f"src='http://{host}/img/{iid}.{image_ext(idx, params)}' />"
                "</div>"
            )
        # a text comment and a malformed fragment for parser leniency
        comments.append(
            "<div class='comment container'>"
            f"<span class='comment author'>{_AUTHORS[pi % len(_AUTHORS)]}</span>"
            "<div class='comment text'>Interesting page!</div>"
            "</div>"
        )
        link_html = "".join(
            f"<li><a href='{href}'>link {i}</a></li>" for i, href in enumerate(hrefs)
        )
        malformed = "<b><c><d>deep</d></b></c>" if pi % 7 == 0 else "<p>tail"
        html = (
            f"<html><head><title>Page {pi}</title></head><body>"
            f"<div class='comments'>{''.join(comments)}</div>"
            f"<ul class='links'>{link_html}</ul>"
            f"{malformed}"
            "</body></html>"
        )

        err = prng.random()
        status = 200
        if err < params.error_fraction:
            status = 404 if prng.random() < 0.5 else 503
        ct = "text/html; charset=utf-8"
        if prng.random() < params.latin1_fraction:
            ct = "text/html; charset=ISO-8859-1"
        pages.append(
            {
                "url": url,
                "host": host,
                "html": html,
                "out_links": out_links,
                "image_ids": img_ids,
                "status": status,
                "content_type": ct,
            }
        )

    srng = np.random.default_rng(params.seed * 97)
    if params.seed_fraction is not None and params.seed_fraction >= 1.0:
        seed_idx = list(range(n))
    else:
        frac = params.seed_fraction
        n_seeds = max(3, n // 50) if frac is None else max(3, int(n * frac))
        seed_idx = sorted(set(int(x) for x in srng.integers(0, n, size=n_seeds)))
    seeds = [{"url": page_urls[i], "priority": 1.0} for i in seed_idx]

    robots = []
    for h in range(params.n_hosts):
        hrng = np.random.default_rng(params.seed * 131 + h)
        robots.append(
            {
                "host": _host(h),
                "crawl_delay_ms": int(hrng.integers(50, 500)),
                "max_fetches_per_round": int(
                    hrng.integers(params.budget_min, params.budget_max)
                ),
                "disallow_prefixes": ["/private/"]
                + (["/page/13"] if h % 5 == 0 else []),
            }
        )

    return {"images": images, "pages": pages, "seeds": seeds, "robots": robots}


_SCHEMAS = {
    "images": [
        ("image_id", "string"),
        ("bytes", "binary"),
        ("w", "int32"),
        ("h", "int32"),
        ("fmt", "string"),
        ("caption", "string"),
        ("phash", "int64"),
    ],
    "pages": [
        ("url", "string"),
        ("host", "string"),
        ("html", "string"),
        ("out_links", "list<string>"),
        ("image_ids", "list<string>"),
        ("status", "int32"),
        ("content_type", "string"),
    ],
    "seeds": [("url", "string"), ("priority", "double")],
    "robots": [
        ("host", "string"),
        ("crawl_delay_ms", "int32"),
        ("max_fetches_per_round", "int32"),
        ("disallow_prefixes", "list<string>"),
    ],
}


def _arrow_type(name: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "binary": pa.binary(),
        "int32": pa.int32(),
        "int64": pa.int64(),
        "double": pa.float64(),
        "list<string>": pa.list_(pa.string()),
    }[name]


def _version_payload(params: WorldParams) -> dict:
    return {
        "datagen_version": DATAGEN_VERSION,
        "params": dataclasses.asdict(params),
    }


def world_current(out_dir: str, params: WorldParams) -> bool:
    """True iff ``out_dir`` holds a world written by THIS datagen
    version with exactly ``params`` (the version file is written last,
    so a torn ``write_world`` never reads as current)."""
    try:
        with open(os.path.join(out_dir, "world_version.json")) as f:
            return json.load(f) == _version_payload(params)
    except (OSError, ValueError):
        return False


def ensure_world(out_dir: str, params: WorldParams) -> str:
    """Idempotent world cache: reuse ``out_dir`` only when its stamped
    codec version + params match; otherwise wipe and regenerate. This is
    the ONLY sanctioned reuse path — existence-only checks let a codec
    fix strand blobs whose stored phash the new decoder can't reproduce."""
    if not world_current(out_dir, params):
        shutil.rmtree(out_dir, ignore_errors=True)
        write_world(out_dir, params)
    return out_dir


def write_world(out_dir: str, params: WorldParams) -> dict:
    """Generate + write the four tables as parquet under ``out_dir``;
    returns the in-memory world dict for immediate use."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    world = generate_world(params)
    os.makedirs(out_dir, exist_ok=True)
    for name, rows in world.items():
        schema = pa.schema([(c, _arrow_type(t)) for c, t in _SCHEMAS[name]])
        cols = {c: [r[c] for r in rows] for c, _ in _SCHEMAS[name]}
        table = pa.Table.from_pydict(cols, schema=schema)
        # bounded row groups: a single-row-group file can only ever be
        # scanned by ONE Spark task regardless of split size
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=2048
        )
    with open(os.path.join(out_dir, "world_version.json"), "w") as f:
        json.dump(_version_payload(params), f, indent=1)
    return world
