"""Pure numpy baseline-JPEG (JFIF) codec.

Closes the non-PNG corner of the image-format contract without any
image library: a minimal but real SOF0 codec — 8-bit, 3-component
YCbCr, 4:4:4 (no chroma subsampling), standard Annex-K-style
quantization + Huffman tables, quality-scaled like libjpeg. The
decoder parses the tables out of the stream (DQT/DHT/SOF0/SOS), so the
two halves are independent implementations meeting only at the wire
format.

Intended envelope: the synthetic corpus + tests (small images, high
quality). At 100 TB a real deployment swaps native codecs in at
``imageops.decode_image``; this module keeps ``fmt='jpeg'`` rows
decodable (``decode_ok=true``) end-to-end in this environment.

Not supported (raises ``ValueError``): progressive (SOF2), subsampled
chroma, restart intervals, 12-bit precision, arithmetic coding.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables ---------------------------------------------------------------

_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
assert sum(_AC_LUMA_BITS) == len(_AC_LUMA_VALS) == 162
assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162


def _zigzag_order() -> np.ndarray:
    """Diagonal scan order as (64,) flat indices into an 8×8 block."""
    order = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else p[1]),
    )
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()

_DCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT_C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.5) if _u == 0 else 1.0
        ) * 0.5


def _scaled_qtables(quality: int):
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (_Q_LUMA, _Q_CHROMA):
        q = (t * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out


def _huff_codes(bits, vals):
    """JPEG canonical code assignment: {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- color transforms -----------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blocks(chan: np.ndarray) -> np.ndarray:
    """(H, W) padded channel → (n_blocks, 8, 8) in raster block order."""
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


# --- bit IO ---------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past EOI; harmless
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # marker (EOI): stop consuming, emit pad bits
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        # Truncate consumed high bits so acc stays bounded (decode would
        # otherwise be O(n^2) in scan length from ever-growing bigint shifts).
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, lut) -> int:
        """lut = (fast8, slow): fast8 resolves all codes ≤ 8 bits from a
        single 8-bit peek (one table hit instead of up to 8 bit-reads +
        dict probes — the decoder hot path); longer codes continue the
        canonical walk from those 8 bits."""
        fast8, slow = lut
        self._fill()
        peek = (self.acc >> (self.nbits - 8)) & 0xFF
        ent = fast8[peek]
        if ent is not None:
            sym, ln = ent
            self.nbits -= ln
            self.acc &= (1 << self.nbits) - 1
            return sym
        self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1
        code = peek
        for length in range(9, 17):
            code = (code << 1) | self.get(1)
            sym = slow.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _decode_lut(codes: dict):
    """{symbol: (code, len)} → (fast8, slow) for _BitReader.read_symbol."""
    fast8 = [None] * 256
    slow = {}
    for sym, (code, ln) in codes.items():
        if ln <= 8:
            base = code << (8 - ln)
            for suffix in range(1 << (8 - ln)):
                fast8[base | suffix] = (sym, ln)
        else:
            slow[(ln, code)] = sym
    return fast8, slow


def _magnitude(v: int):
    """(size, value-bits) per JPEG F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- encoder --------------------------------------------------------------


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4)."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w, _ = pixels.shape
    qt_l, qt_c = _scaled_qtables(quality)
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(pixels, ((0, h8 - h), (0, w8 - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0

    dc_codes = [_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS), _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS), _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # DCT + quantize all blocks of the 3 channels up front (vectorized)
    comps = []
    for ci in range(3):
        blocks = _blocks(ycc[..., ci])
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)
        qt = qt_l if ci == 0 else qt_c
        qz = np.round(coef / qt).astype(np.int64)
        comps.append(qz.reshape(-1, 64)[:, _ZIGZAG])

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = comps[0].shape[0]
    for b in range(n_blocks):  # interleaved MCU order == raster (4:4:4)
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            zz = comps[ci][b]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[tsel][size]
            bw.put(code, length)
            bw.put(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[tsel][0xF0]  # ZRL
                    bw.put(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[tsel][(run << 4) | size]
                bw.put(code, length)
                bw.put(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[tsel][0x00]  # EOB
                bw.put(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += seg(0xFFDB, bytes([tid]) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    # SOF0: 8-bit, 3 components, all 1x1 sampling
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB. Supports what the
    encoder above emits (and any other 8-bit 4:4:4 baseline stream with
    per-scan Huffman tables, no restart intervals)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}  # (tc<<4|th) -> {(len, code): symbol}
    comps: list[dict] = []
    h = w = None
    scan_data = None
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:
            break
        if marker in (0xFF01,) or 0xFFD0 <= marker <= 0xFFD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit qtables unsupported")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = zz
                qtables[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline")
            p = 6
            for _ in range(nc):
                cid, hv, tq = payload[p], payload[p + 1], payload[p + 2]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
                p += 3
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tcth = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[tcth] = _decode_lut(_huff_codes(bits, vals))
                p += 17 + n
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = payload[0]
            scan_comps = []
            p = 1
            for _ in range(ns):
                cid, tdta = payload[p], payload[p + 1]
                scan_comps.append({"id": cid, "td": tdta >> 4, "ta": tdta & 0xF})
                p += 2
            scan_data = data[pos + seglen :]
            pos += seglen
            break
        pos += seglen
    if h is None or scan_data is None:
        raise ValueError("truncated JPEG")
    if len(comps) != 3 or len(scan_comps) != 3:
        raise ValueError("only 3-component YCbCr supported")

    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    n_blocks = (h8 // 8) * (w8 // 8)
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(3)]
    br = _BitReader(scan_data)
    prev_dc = [0, 0, 0]
    by_id = {c["id"]: c for c in comps}
    for b in range(n_blocks):
        for ci, sc in enumerate(scan_comps):
            dc_lut = htables[0x00 | sc["td"]]
            ac_lut = htables[0x10 | sc["ta"]]
            zz = coefs[ci][b]
            s = br.read_symbol(dc_lut)
            diff = _extend(br.get(s), s)
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                rs = br.read_symbol(ac_lut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(br.get(s), s)
                k += 1

    chans = []
    for ci in range(3):
        qt = qtables[by_id[scan_comps[ci]["id"]]["tq"]].reshape(-1)
        deq = np.zeros((n_blocks, 64), dtype=np.float64)
        deq[:, _ZIGZAG] = coefs[ci] * qt[_ZIGZAG]
        blocks = deq.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,yv->nxy", _DCT_C.T, blocks, _DCT_C.T)
        chans.append(_unblocks(spatial, h8, w8)[:h, :w] + 128.0)
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))
