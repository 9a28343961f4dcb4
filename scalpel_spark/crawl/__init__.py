from .urlnorm import canonicalize_url, canonicalize_series, url_host
from .hashing import murmur3_x64_128, murmur3_64, hash_series
from .bloom import BloomShards, CuckooFilter

__all__ = [
    "canonicalize_url",
    "canonicalize_series",
    "url_host",
    "murmur3_x64_128",
    "murmur3_64",
    "hash_series",
    "BloomShards",
    "CuckooFilter",
]
