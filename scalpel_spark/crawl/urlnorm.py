"""URL canonicalization — the deterministic identity function for the
frontier and the URL-seen set.

Rules (standard crawl-engine canonicalization; the reference has no URL
layer beyond ``scrapeURL``'s passthrough at
/root/reference/scalpel/src/Text/HTML/Scalpel/Internal/Scrape/URL.hs:79-82,
so these rules are ours, pinned by tests + the reference simulator):

* scheme + host lowercased
* default ports stripped (http:80, https:443)
* path: ``.`` / ``..`` segments resolved, duplicate slashes collapsed,
  empty path → ``/``
* query: parameters sorted by (key, value), empty query dropped
* fragment dropped
* relative URLs resolved against a base

Exposed both as a scalar function (simulator path) and a pandas Series
transform (Arrow-batch path in the Spark engine). The scalar function is
the single source of truth — the Series path maps it so the two engines
can never diverge.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (resolved against ``base`` if given);
    None for non-http(s) or unparseable URLs."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"

    # path normalization: resolve ./ and ../, collapse //
    segs = parts.path.split("/")
    out: list[str] = []
    for seg in segs:
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    path = "/" + "/".join(out)
    if parts.path.endswith("/") and path != "/":
        path += "/"

    query = ""
    if parts.query:
        pairs = [p for p in parts.query.split("&") if p]
        pairs.sort()
        query = "&".join(pairs)

    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str | None:
    try:
        return urlsplit(url).hostname
    except ValueError:
        return None


def canonicalize_series(urls, bases=None):
    """pandas Series[str] → Series[str|None]; same scalar rule per row."""
    import pandas as pd

    if bases is None:
        return pd.Series([canonicalize_url(u) for u in urls], index=urls.index)
    return pd.Series(
        [canonicalize_url(u, b) for u, b in zip(urls, bases)], index=urls.index
    )
