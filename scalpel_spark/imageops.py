"""Multimodal (image) operators over the input_hint table
``(image_id, bytes, w, h, fmt, caption, phash)``.

The binary payload is opaque to Catalyst; every pixel-touching operator
is an Arrow-batched ``mapInPandas`` whose *plumbing* (schema, carry
columns, batch shape) is real and tested. PNG decode (pure numpy+zlib)
and baseline JPEG decode (pure-numpy SOF0, ``datagen/jpeg.py``) are
real; codecs not present in this environment (video frames, audio,
progressive/subsampled jpeg) are stubbed behind ``NotImplementedError``
with the same signatures, per the build contract.

Scale notes: feature rows are tiny (stats, hashes) — the shuffle after
these operators never carries pixels. ``phash_neardup`` joins on 16-bit
hash chunks (same block-trick as simhash) so hamming search is
bucket-local, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .datagen.images import decode_png, mean_hash_64


def decode_image(blob: bytes, fmt: str) -> np.ndarray:
    """bytes → (h, w, 3) uint8. Native here: 'png' (numpy+zlib codec)
    and baseline 'jpeg'/'jpg' (pure-numpy SOF0 codec)."""
    if fmt == "png":
        return decode_png(blob)
    if fmt in ("jpeg", "jpg"):
        from .datagen.jpeg import decode_jpeg

        return decode_jpeg(blob)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an image library not present in "
        "this environment; plug a decoder in here (signature is stable)"
    )


def resize_block_mean(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downscale (no interpolation libs)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    f = px.astype(np.float32)
    for i in range(out_h):
        for j in range(out_w):
            block = f[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean(axis=(0, 1)).astype(np.uint8)
    return out


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_hist", T.ArrayType(T.IntegerType())),  # 16 bins
        T.StructField("phash_check", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode → per-image stats + recomputed phash (integrity check
    against the stored ``phash`` column)."""

    def gen(batches):
        for pdf in batches:
            out = {f.name: [] for f in _FEATURE_SCHEMA.fields}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), fmt)
                    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    hist = np.histogram(gray, bins=16, range=(0, 256))[0]
                    out["image_id"].append(iid)
                    out["mean_r"].append(float(px[:, :, 0].mean()))
                    out["mean_g"].append(float(px[:, :, 1].mean()))
                    out["mean_b"].append(float(px[:, :, 2].mean()))
                    out["luma_hist"].append(hist.astype(int).tolist())
                    out["phash_check"].append(mean_hash_64(px))
                    out["decode_ok"].append(True)
                except NotImplementedError:
                    out["image_id"].append(iid)
                    for c in ("mean_r", "mean_g", "mean_b"):
                        out[c].append(None)
                    out["luma_hist"].append(None)
                    out["phash_check"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, _FEATURE_SCHEMA)


def thumbnails(df: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode → block-mean resize → re-encoded PNG thumbnail column."""
    from .datagen.images import encode_png

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("thumb", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, thumbs = [], []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), fmt)
                    thumbs.append(encode_png(resize_block_mean(px, out_h, out_w)))
                    ids.append(iid)
                except NotImplementedError:
                    ids.append(iid)
                    thumbs.append(None)
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs})

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, schema)


def phash_neardup(df: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate images by phash hamming distance ≤ k — exact for
    any k: pigeonhole chunking (k+1 chunks) over DISTINCT phash values,
    JVM-side throughout (see textops.hamming_neardup_pairs)."""
    from .textops import hamming_neardup_pairs

    return hamming_neardup_pairs(
        df.select("image_id", "phash"), "phash", "image_id", max_hamming
    )


def audio_features(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: audio decode/feature path (no audio libs in sandbox). The
    Spark plumbing mirrors image_features; decode raises."""
    raise NotImplementedError("audio codecs unavailable in this environment")


def video_frame_sample(df: DataFrame, every_n: int = 30):  # pragma: no cover - stub
    """STUB: video frame sampling (no video libs in sandbox)."""
    raise NotImplementedError("video codecs unavailable in this environment")
