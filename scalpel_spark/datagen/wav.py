"""Pure-numpy WAV (RIFF PCM16 mono) codec — the audio half of the
multimodal column story.

No audio libraries exist in this environment, but canonical WAV is just
a RIFF container around raw PCM samples, fully decodable with
``struct`` + numpy — so the audio column can be REAL (decode → feature
extraction over genuine wire-format blobs) rather than stubbed, unlike
video which stays an honest stub.

Wire format written here (and accepted by the decoder):
RIFF header / ``fmt `` chunk (PCM, mono, 16-bit) / ``data`` chunk.
The decoder walks chunks generically, so blobs from other writers
(extra chunks, different chunk order) decode too.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits/sample
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes → (sample_rate, int16 samples).

    Generic chunk walk: tolerates extra chunks and any chunk order, but
    insists on PCM mono 16-bit (the only profile this engine writes)."""
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    rate, samples = None, None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV profile: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(payload[: size - size % 2], dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), samples.astype(np.int16)
