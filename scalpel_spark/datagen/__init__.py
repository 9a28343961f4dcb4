from .images import decode_png, encode_png, mean_hash_64, psnr
from .world import WorldParams, generate_world, write_world

__all__ = [
    "decode_png",
    "encode_png",
    "mean_hash_64",
    "psnr",
    "WorldParams",
    "generate_world",
    "write_world",
]
