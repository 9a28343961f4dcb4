"""Minimal MJPEG (Motion JPEG) elementary-stream codec.

An MJPEG elementary stream is the public wire format used by
``multipart/x-mixed-replace`` camera streams and ``.mjpeg`` files: a
sequence of complete baseline JPEG images (SOI … EOI) concatenated
back-to-back, with timing (fps) carried out-of-band. Frames here are
encoded/decoded through the repo's own pure-numpy baseline JPEG codec
(``datagen/jpeg.py``) — no new dependencies.

Frame boundaries are recovered by walking the actual JPEG segment
structure (ITU-T T.81 §B): marker segments carry explicit lengths,
entropy-coded scan data is skipped with byte-stuffing (FF 00) and
restart-marker (FFD0-D7) awareness — never by naively searching for
FFD8, which legally occurs inside entropy data.

Reference parity note: fimad/scalpel has no media layer at all; this
module exists for the training-pipeline multimodal surface
(video_frame_sample / video_stats) the build contract adds on top.
"""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

# markers with no length field (ITU-T T.81 Table B.1)
_NO_LENGTH = frozenset([0x01] + list(range(0xD0, 0xD8)))  # TEM, RST0-7


def encode_mjpeg(frames: list[np.ndarray], quality: int = 95) -> bytes:
    """Concatenate baseline-JPEG encodings of ``frames`` into one
    elementary stream. All frames may differ in size; the stream itself
    carries no timing — store fps alongside the blob."""
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def _jpeg_end(blob: bytes, start: int) -> int:
    """Return the index one past the EOI of the JPEG starting at
    ``start`` (which must point at SOI), by walking segment lengths and
    entropy-coded data. Raises ValueError on malformed/truncated input."""
    n = len(blob)
    i = start
    if i + 2 > n or blob[i] != 0xFF or blob[i + 1] != 0xD8:
        raise ValueError(f"no SOI at offset {start}")
    i += 2
    while True:
        if i + 2 > n:
            raise ValueError("truncated stream: no EOI")
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        # optional fill bytes: any number of FFs may precede a marker
        while i + 1 < n and blob[i] == 0xFF and blob[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            raise ValueError("truncated stream: fill bytes run to EOF")
        m = blob[i + 1]
        if m == 0xD9:  # EOI
            return i + 2
        if m in _NO_LENGTH:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated segment header")
        seg_len = (blob[i + 2] << 8) | blob[i + 3]
        if seg_len < 2:
            raise ValueError(f"bad segment length at {i}")
        i += 2 + seg_len
        if m == 0xDA:  # SOS → entropy-coded data follows
            while True:
                j = blob.find(b"\xff", i)
                if j < 0 or j + 1 >= n:
                    raise ValueError("truncated entropy data")
                nxt = blob[j + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    i = j + 2  # stuffed FF / restart marker: still data
                    continue
                i = j  # a real marker (EOI for baseline single-scan)
                break


def split_mjpeg(blob: bytes) -> list[tuple[int, int]]:
    """Frame index: list of (offset, length) for every JPEG in the
    stream. O(bytes) single pass; decoding is separate so callers can
    sample every Nth frame without decoding the rest."""
    blob = bytes(blob)
    spans: list[tuple[int, int]] = []
    i, n = 0, len(blob)
    while i < n:
        end = _jpeg_end(blob, i)
        spans.append((i, end - i))
        i = end
    return spans


def decode_mjpeg_frame(blob: bytes, offset: int, length: int) -> np.ndarray:
    """Decode one frame given its span from split_mjpeg."""
    return decode_jpeg(bytes(blob[offset : offset + length]))
