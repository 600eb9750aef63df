"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the JPEG gap in the stdlib-only codec family (``functions/codecs``):
web crawls are overwhelmingly JPEG, and the container ships no codec
library. Everything here is public-spec JPEG — JFIF markers, Annex-K
quantization + Huffman tables, zigzag, level-shifted 8×8 DCT-II.

- :func:`decode_jpeg` handles real-world baseline files: it takes ALL
  tables from the file's own DQT/DHT segments (so any spec-valid encoder's
  output decodes), grayscale and YCbCr with arbitrary sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers, 8- and 16-bit quant
  tables. Progressive (SOF2) and arithmetic coding are rejected with
  ``ValueError`` — honest scope, matching the crawl-side policy of
  skipping undecodable payloads.
- :func:`encode_jpeg` emits baseline JFIF with the Annex-K tables (IJG
  quality scaling), optional 4:2:0 subsampling and restart intervals.

Cost model: the DCT/IDCT, quantization, color transforms and chroma
resampling are vectorized numpy over all blocks at once; only the entropy
(Huffman) layer is a Python loop, which is inherently bit-serial. A
16-bit-lookahead LUT decodes one whole symbol per array index (vs one
dict probe per bit — measured 1.4× end-to-end); ~0.8 Mpx/s per core on a
photo-like 4:2:0 image. The parallelism story at corpus scale is ACROSS
images (the ``DecodeImage`` actor pool), not within one. A production
deployment swaps this module for a SIMD codec in the actor ``__init__``;
the dataflow is identical.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index (T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (raster order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman tables: (bits[1..16], huffman values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: forward F = D @ f @ D.T, inverse f = D.T @ F @ D
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)
del _k, _n


def _canonical_codes(bits, vals):
    """(bits, vals) -> {symbol: (code, length)} — T.81 Annex C."""
    codes = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _ijg_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray):
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad_edge(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(
        plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])), mode="edge"
    )


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, size-bit two's-variant code) per F.1.2."""
    if v == 0:
        return 0, 0
    a = v if v > 0 else -v
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_blocks(
    writer, qblocks_zz: np.ndarray, order, dc_codes, ac_codes, dc_pred: list,
    comp_idx_of,
):
    """Entropy-code blocks in MCU ``order`` (list of (comp, row, col))."""
    for comp, r, c in order:
        zz = qblocks_zz[comp][r, c]
        ci = comp_idx_of[comp]
        dc, ac = dc_codes[comp], ac_codes[comp]
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        size, bitsv = _magnitude(diff)
        code, length = dc[size]
        writer.write(code, length)
        if size:
            writer.write(bitsv, size)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        prev = 0
        for idx in nz:
            run = int(idx) - prev
            prev = int(idx) + 1
            while run >= 16:
                zcode, zlen = ac[0xF0]
                writer.write(zcode, zlen)
                run -= 16
            size, bitsv = _magnitude(int(zz[1 + idx]))
            code, length = ac[(run << 4) | size]
            writer.write(code, length)
            writer.write(bitsv, size)
        if prev != 63:
            code, length = ac[0x00]  # EOB
            writer.write(code, length)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 image (H,W) / (H,W,1) grayscale or (H,W,3) RGB -> baseline
    JFIF bytes. ``subsample=True`` writes 4:2:0 chroma; ``restart_interval``
    (in MCUs) emits DRI + RSTn markers."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("expected 1 or 3 channels")
    h0, w0 = img.shape[:2]
    if h0 == 0 or w0 == 0:
        raise ValueError("empty image")

    qlum = _ijg_scale(QUANT_LUM, quality)
    qchrom = _ijg_scale(QUANT_CHROM, quality)

    if color:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample:
            # 2x2 box average; pad odd dims by edge first
            cbp = _pad_edge(cb, (h0 + 1) // 2 * 2, (w0 + 1) // 2 * 2)
            crp = _pad_edge(cr, (h0 + 1) // 2 * 2, (w0 + 1) // 2 * 2)
            cb = cbp.reshape(-1, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(-1, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    else:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))

    qtabs = [qlum, qchrom]
    qblocks_zz = []
    for plane, (hs, vs), qid in zip(planes, samp, qids):
        ph, pw = 8 * vs * mcus_y, 8 * hs * mcus_x
        blocks = _blockify(_pad_edge(plane, ph, pw)) - 128.0
        coef = np.einsum("ij,rcjk,lk->rcil", DCT_M, blocks, DCT_M)
        q = qtabs[qid].reshape(8, 8).astype(np.float64)
        qb = np.round(coef / q).astype(np.int64)
        # zz[k] = raster[ZIGZAG[k]]: gathering at ZIGZAG yields zigzag order
        qblocks_zz.append(qb.reshape(qb.shape[0], qb.shape[1], 64)[..., ZIGZAG])

    dc_tabs = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS)]
    ac_tabs = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS)]
    if color:
        dc_tabs.append(_canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS))
        ac_tabs.append(_canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS))
    dc_of = [0] + ([1, 1] if color else [])
    comp_idx_of = list(range(len(planes)))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in enumerate(qtabs[: 2 if color else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in tab[ZIGZAG]
        )
    ncomp = 3 if color else 1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h0, w0, ncomp)
    for i in range(ncomp):
        out += struct.pack("BBB", i + 1, (samp[i][0] << 4) | samp[i][1], qids[i])
    huff_specs = [(0, 0, DC_LUM_BITS, DC_LUM_VALS), (1, 0, AC_LUM_BITS, AC_LUM_VALS)]
    if color:
        huff_specs += [
            (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
            (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
        ]
    for tc, th, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += struct.pack("BB", i + 1, (dc_of[i] << 4) | dc_of[i])
    out += b"\x00\x3f\x00"

    dc_codes = [dc_tabs[dc_of[i]] for i in range(ncomp)]
    ac_codes = [ac_tabs[dc_of[i]] for i in range(ncomp)]
    writer = _BitWriter()
    dc_pred = [0] * ncomp
    rst = 0
    since_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_rst == restart_interval:
                writer.flush()
                out += writer.buf
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                since_rst = 0
                dc_pred = [0] * ncomp
            order = []
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for hh in range(hs):
                        order.append((ci, my * vs + v, mx * hs + hh))
            _encode_blocks(
                writer, qblocks_zz, order, dc_codes, ac_codes, dc_pred,
                comp_idx_of,
            )
            since_rst += 1
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit cursor over one entropy segment. Reads are whole-symbol: a
    32-bit window is pulled once per Huffman symbol / value group (not per
    bit), which is what keeps the Python entropy layer tolerable — the
    16-bit peek feeds the per-table LUT below."""

    __slots__ = ("data", "pos", "total")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"  # peek window past the end
        self.pos = 0
        self.total = len(data) * 8

    def peek16(self) -> int:
        b = self.pos >> 3
        win = int.from_bytes(self.data[b : b + 4], "big")
        return (win >> (16 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int):
        self.pos += n
        if self.pos > self.total:
            raise ValueError("truncated entropy segment")

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.total:
            raise ValueError("truncated entropy segment")
        b = self.pos >> 3
        win = int.from_bytes(self.data[b : b + 4], "big")
        v = (win >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huff_table(bits, vals):
    """(bits, vals) -> flat 2^16 LUT: for a 16-bit lookahead ``p``,
    ``sym[p]`` is the decoded symbol (-1 = invalid code) and ``ln[p]`` its
    bit length. Every code of length L owns a 2^(16-L) slice — one array
    index decodes a whole symbol instead of one dict probe per bit."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            end = start + (1 << (16 - length))
            sym[start:end] = vals[i]
            ln[start:end] = length
            code += 1
            i += 1
        code <<= 1
    return sym, ln


def _read_symbol(reader: _BitReader, lut) -> int:
    sym, ln = lut
    p = reader.peek16()
    s = int(sym[p])
    if s < 0:
        raise ValueError("invalid Huffman code")
    reader.skip(int(ln[p]))
    return s


def _split_entropy(data: bytes, pos: int):
    """Entropy stream from ``pos`` -> (list of unstuffed segments split on
    RSTn, index just past the terminating marker's 0xFF). Jumps between
    0xFF candidates with ``bytes.find`` and bulk-slices the spans between
    them — no per-byte Python loop (a multi-MB scan has millions of
    bytes but only ~1 marker per ~100)."""
    segs = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            i = n
            break
        cur += data[i:j]
        if j + 1 >= n:
            i = j
            break
        m = data[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            i = j
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array: (H, W) for 1 component,
    (H, W, 3) RGB for 3 (YCbCr per JFIF). Tables come from the file's own
    DQT/DHT segments; SOF2/arithmetic raise ``ValueError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h0 = w0 = 0
    restart = 0
    i = 2
    n = len(data)
    scan = None
    while i < n:
        if data[i] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated marker")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq:
                    vals = np.frombuffer(
                        body[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        body[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                t = np.empty(64, dtype=np.int64)
                t[ZIGZAG] = vals  # stored zigzag -> raster
                qtabs[tq] = t
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _decode_huff_table(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-decodable)
            _, h0, w0, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for k in range(ns):
                cs, tt = body[1 + 2 * k : 3 + 2 * k]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            i = i + 2 + seglen
            break
        i += 2 + seglen
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")
    if len(scan) != len(comps):
        # one-component-per-scan (non-interleaved) baseline: decoding only
        # the first scan would emit silently wrong pixels — refuse loudly,
        # like progressive
        raise ValueError(
            "unsupported non-interleaved multi-scan baseline JPEG "
            f"(scan covers {len(scan)} of {len(comps)} components)"
        )

    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dc_lut"] = huff.get((0, s["dc"]))
        c["ac_lut"] = huff.get((1, s["ac"]))
        if c["dc_lut"] is None or c["ac_lut"] is None:
            raise ValueError("missing Huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("missing quant table")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["q"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)

    segs, _ = _split_entropy(data, i)
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {c["id"]: 0 for c in comps}
    since = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and since == restart:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = {c["id"]: 0 for c in comps}
                since = 0
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_symbol(reader, c["dc_lut"])
                        diff = _extend(reader.receive(size), size)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(reader, c["ac_lut"])
                            if rs == 0x00:  # EOB
                                break
                            run, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.receive(sz), sz)
                            k += 1
                        row = my * c["v"] + v
                        col = mx * c["h"] + hh
                        c["q"][row * c["bw"] + col] = zz
            since += 1

    planes = []
    for c in comps:
        q = qtabs[c["tq"]].reshape(8, 8).astype(np.float64)
        coefs = np.zeros((len(c["q"]), 64), dtype=np.float64)
        coefs[:, ZIGZAG] = c["q"]  # zigzag -> raster
        blocks = coefs.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,njk,kl->nil", DCT_M, blocks, DCT_M) + 128.0
        grid = pix.reshape(c["bh"], c["bw"], 8, 8).swapaxes(1, 2)
        plane = grid.reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution by sample-factor replication
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h0, :w0])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
