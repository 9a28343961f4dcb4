"""Fetch-stage helpers: response decoding + fetch configuration.

The sandbox crawl resolves URLs against the synthetic corpus table (the
offline stand-in for HTTP GET — reference fetch path at
``scalpel/src/Text/HTML/Scalpel/Internal/Scrape/URL.hs:72-82``), but the
decoder rules are implemented for real binary bodies, matching the
reference's ``defaultDecoder`` exactly (URL.hs:87-103):

* take the first ``Content-Type`` header, lowercase it;
* if it contains ``charset=utf-8`` → decode UTF-8;
* otherwise (including missing header) → ISO-8859-1 (latin-1, which
  never fails — every byte is a codepoint).

``utf8_decoder``/``iso88591_decoder`` mirror URL.hs:106-111. A
``FetchConfig`` carries decoder + politeness knobs, the offline analog
of the reference's ``Config { decoder, manager }`` (URL.hs:43-52).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

Decoder = Callable[[bytes, str | None], str]


def default_decoder(body: bytes, content_type: str | None) -> str:
    """Charset sniff per URL.hs:87-103: utf-8 only when the header says
    so, else latin-1."""
    ct = (content_type or "").lower()
    if "charset=utf-8" in ct:
        # the reference's decodeUtf8 throws on invalid bytes; we keep the
        # crawl total and substitute (errors recorded upstream as rows)
        return body.decode("utf-8", errors="replace")
    return body.decode("latin-1")


def utf8_decoder(body: bytes, content_type: str | None = None) -> str:
    return body.decode("utf-8", errors="replace")


def iso88591_decoder(body: bytes, content_type: str | None = None) -> str:
    return body.decode("latin-1")


@dataclass
class FetchConfig:
    decoder: Decoder = default_decoder
    user_agent: str = "scalpel-spark/0.1"
    timeout_ms: int = 10_000
    #: per-host politeness default when robots has no entry
    default_budget: int = 3
    extra_headers: dict = field(default_factory=dict)
    #: request-time URL remap (test harnesses / forward proxies): the
    #: logical URL stays the crawl identity, the rewritten one is GET-ed
    url_rewrite: Callable[[str], str] | None = None
    #: concurrent requests per partition (thread pool inside the task)
    concurrency: int = 16


def http_fetch_batch(urls, config: FetchConfig):
    """Fetch a batch of URLs with a per-task thread pool (stdlib only —
    urllib with keep-alive via per-thread openers). Returns parallel
    lists (status, html): status 0 = transport error, HTTP status
    otherwise; body decoded per ``config.decoder`` from the real
    Content-Type header (URL.hs:87-103 semantics).

    This is the real-HTTP realization of the fetch stage
    (URL.hs:60-82): the engine calls it inside ``mapInPandas``, so each
    Spark task fetches its partition's politeness-bounded batch
    concurrently; per-host request caps are enforced UPSTREAM by the
    politeness window, so the pool here only bounds socket fan-out."""
    import urllib.error
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    timeout = config.timeout_ms / 1000.0

    def one(url: str):
        target = config.url_rewrite(url) if config.url_rewrite else url
        req = urllib.request.Request(
            target,
            headers={"User-Agent": config.user_agent, **config.extra_headers},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = resp.read()
                ctype = resp.headers.get("Content-Type")
                return int(resp.status), config.decoder(body, ctype)
        except urllib.error.HTTPError as e:
            return int(e.code), None
        except Exception:
            return 0, None

    if not len(urls):
        return [], []
    with ThreadPoolExecutor(max_workers=max(1, config.concurrency)) as ex:
        results = list(ex.map(one, urls))
    statuses = [r[0] for r in results]
    htmls = [r[1] for r in results]
    return statuses, htmls


def decode_body_series(bodies, content_types, decoder: Decoder = default_decoder):
    """pandas batch path: Series[bytes] × Series[str] → Series[str]."""
    import pandas as pd

    return pd.Series(
        [
            None if b is None else decoder(bytes(b), ct)
            for b, ct in zip(bodies, content_types)
        ],
        index=bodies.index,
    )
