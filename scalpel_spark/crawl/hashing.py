"""MurmurHash3 x64-128 (public algorithm, Austin Appleby, public domain)
implemented from the published reference description — used for URL
identity hashes and Bloom-filter bit derivation (north_star: "murmur3-
hashed URLs").

The scalar implementation is the source of truth shared by the Spark
engine and the single-threaded simulator, so the URL-seen sets are
bit-identical. The batch path hashes a whole pandas Series per Arrow
batch (Python loop over a batch, not per-row UDF dispatch).

Bloom bit indices use Kirsch-Mitzenmacher double hashing:
``g_i(x) = h1(x) + i*h2(x) mod m`` — k probes from one 128-bit hash.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """128-bit murmur3 (x64 variant) → (h1, h2) unsigned 64-bit ints."""
    length = len(data)
    nblocks = length // 16
    h1 = seed & _MASK64
    h2 = seed & _MASK64

    for b in range(nblocks):
        i = b * 16
        k1 = int.from_bytes(data[i : i + 8], "little")
        k2 = int.from_bytes(data[i + 8 : i + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl >= 9:
        k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        if tl < 8:
            k1 &= (1 << (8 * tl)) - 1
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_64(s: str, seed: int = 0) -> int:
    """Signed 64-bit URL hash (fits Spark/parquet ``bigint``)."""
    h1, _ = murmur3_x64_128(s.encode("utf-8"), seed)
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


def hash_series(urls, seed: int = 0):
    """pandas Series[str] → Series[int64] of murmur3_64 hashes."""
    import pandas as pd

    return pd.Series(
        [None if u is None else murmur3_64(u, seed) for u in urls],
        index=urls.index,
        dtype="Int64",
    )


def bloom_indices(h1: int, h2: int, k: int, m: int):
    """Kirsch-Mitzenmacher: k bit positions from a 128-bit hash."""
    return [((h1 + i * h2) % m) for i in range(k)]
