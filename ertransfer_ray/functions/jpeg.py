"""Pure-numpy JPEG codec (ITU-T T.81, 8-bit): baseline sequential AND
progressive.

Closes the JPEG gap in the stdlib-only codec family (``functions/codecs``):
web crawls are overwhelmingly JPEG, and the container ships no codec
library. Everything here is public-spec JPEG — JFIF markers, Annex-K
quantization + Huffman tables, zigzag, level-shifted 8×8 DCT-II, the
Annex-G progressive modes.

- :func:`decode_jpeg` handles real-world files: it takes ALL tables from
  the file's own DQT/DHT segments (so any spec-valid encoder's output
  decodes), grayscale and YCbCr with arbitrary sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers, 8- and 16-bit quant
  tables, one-component-per-scan sequential files, and progressive
  (SOF2: spectral selection + successive approximation, EOB runs, DC/AC
  refinement). Hierarchical/lossless/arithmetic processes are rejected
  with ``ValueError`` — honest scope, matching the crawl-side policy of
  skipping undecodable payloads.
- :func:`encode_jpeg` emits baseline JFIF with the Annex-K tables (IJG
  quality scaling), optional 4:2:0 subsampling and restart intervals.
- :func:`encode_jpeg_progressive` emits an SOF2 scan script exercising
  both spectral selection and successive approximation; its coefficients
  are identical to the baseline encoder's, which pins the progressive
  decoder BIT-IDENTICAL to the baseline decode in tests.

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


def _plan(img: np.ndarray, quality: int, subsample: bool) -> dict:
    """Shared encoder front half: color transform, optional 4:2:0, DCT,
    quantization — everything up to (but not including) entropy coding.
    Returns per-component quantized zigzag blocks + geometry/tables."""
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

    return {
        "qblocks_zz": qblocks_zz,
        "samp": samp,
        "qids": qids,
        "qtabs": qtabs,
        "h0": h0,
        "w0": w0,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "ncomp": len(planes),
    }


def _emit_headers(plan: dict, sof_marker: int, huff_specs, restart_interval: int) -> bytearray:
    """SOI + JFIF + DQT + SOFn + DHT(+DRI) — everything before the scans."""
    ncomp = plan["ncomp"]
    samp, qids, qtabs = plan["samp"], plan["qids"], plan["qtabs"]
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in enumerate(qtabs[: 2 if ncomp == 3 else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in tab[ZIGZAG]
        )
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, plan["h0"], plan["w0"], ncomp
    )
    for i in range(ncomp):
        out += struct.pack("BBB", i + 1, (samp[i][0] << 4) | samp[i][1], qids[i])
    for tc, th, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 image (H,W) / (H,W,1) grayscale or (H,W,3) RGB -> baseline
    JFIF bytes. ``subsample=True`` writes 4:2:0 chroma; ``restart_interval``
    (in MCUs) emits DRI + RSTn markers."""
    plan = _plan(img, quality, subsample)
    qblocks_zz = plan["qblocks_zz"]
    samp, qids = plan["samp"], plan["qids"]
    mcus_x, mcus_y = plan["mcus_x"], plan["mcus_y"]
    ncomp = plan["ncomp"]
    color = ncomp == 3

    dc_tabs = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS)]
    ac_tabs = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS)]
    if color:
        dc_tabs.append(_canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS))
        ac_tabs.append(_canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS))
    dc_of = [0] + ([1, 1] if color else [])
    comp_idx_of = list(range(ncomp))

    huff_specs = [(0, 0, DC_LUM_BITS, DC_LUM_VALS), (1, 0, AC_LUM_BITS, AC_LUM_VALS)]
    if color:
        huff_specs += [
            (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
            (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
        ]
    out = _emit_headers(plan, 0xC0, huff_specs, restart_interval)
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


#: every symbol a progressive AC scan can emit: (run, size) pairs, ZRL,
#: and the EOBn family 0x00..0xE0 — which the Annex-K tables do NOT carry
#: (they only have EOB0), so progressive scans use a flat custom table.
_PROG_AC_SYMBOLS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [r << 4 for r in range(15)]
)


def _flat_table(vals):
    """All symbols at one canonical code length (the smallest that leaves
    the all-ones code unused): spec-valid, compression-suboptimal. Used
    for progressive AC scans; written into the file's DHT like any table."""
    length = max(2, (len(vals) + 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, list(vals)


def _enc_ac_first_scan(blocks_zz, block_iter, ac_code, al) -> bytes:
    """Progressive AC first scan (G.1.2.2): magnitudes >> al, EOB runs."""
    w = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_code[nb << 4]
            w.write(code, ln)
            if nb:
                w.write(eobrun - (1 << nb), nb)
            eobrun = 0

    for row, col in block_iter:
        zz = blocks_zz[row, col]
        r = 0
        for k in range(1, 64):
            t = int(zz[k])
            v = abs(t) >> al
            if v == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, ln = ac_code[0xF0]
                w.write(code, ln)
                r -= 16
            size, bitsv = _magnitude(v if t > 0 else -v)
            code, ln = ac_code[(r << 4) | size]
            w.write(code, ln)
            w.write(bitsv, size)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    w.flush()
    return bytes(w.buf)


def _enc_ac_refine_scan(blocks_zz, block_iter, ac_code, al) -> bytes:
    """Progressive AC refinement scan (G.1.2.3): correction bits for
    already-nonzero coefficients, ±1 for newly visible ones, buffered
    correction bits riding behind EOBn/ZRL symbols — the IJG emit order,
    which is what the refinement decoder consumes."""
    w = _BitWriter()
    eobrun = 0
    pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_code[nb << 4]
            w.write(code, ln)
            if nb:
                w.write(eobrun - (1 << nb), nb)
            for b in pending:
                w.write(b, 1)
            pending = []
            eobrun = 0

    for row, col in block_iter:
        zz = blocks_zz[row, col]
        absv = [abs(int(zz[k])) >> al for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(1, 64):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                code, ln = ac_code[0xF0]
                w.write(code, ln)
                r -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if t > 1:  # already nonzero: one correction bit, run untouched
                br.append(t & 1)
                continue
            flush_eob()
            code, ln = ac_code[(r << 4) | 1]
            w.write(code, ln)
            w.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    w.flush()
    return bytes(w.buf)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """uint8 image -> progressive JFIF (SOF2). Scan script: interleaved DC
    first at Al=1, per-component AC first (Ss=1..63, Al=1), interleaved DC
    refinement (raw bits), per-component AC refinement — i.e. both
    successive approximation AND spectral selection, so a decoder must
    implement every Annex-G path to reproduce the baseline pixels. The
    quantized coefficients are identical to :func:`encode_jpeg`'s, so the
    decoded output is bit-identical to decoding the baseline encoding."""
    plan = _plan(img, quality, subsample)
    qblocks_zz = plan["qblocks_zz"]
    samp = plan["samp"]
    mcus_x, mcus_y = plan["mcus_x"], plan["mcus_y"]
    ncomp = plan["ncomp"]
    color = ncomp == 3
    AL = 1

    dc_specs = [(0, 0, DC_LUM_BITS, DC_LUM_VALS)]
    if color:
        dc_specs.append((0, 1, DC_CHROM_BITS, DC_CHROM_VALS))
    ac_bits, ac_vals = _flat_table(_PROG_AC_SYMBOLS)
    out = _emit_headers(plan, 0xC2, dc_specs + [(1, 0, ac_bits, ac_vals)], 0)
    dc_of = [0] + ([1, 1] if color else [])
    dc_tabs = [_canonical_codes(b, v) for _, _, b, v in dc_specs]
    ac_code = _canonical_codes(ac_bits, ac_vals)

    def sos(entries, ss, se, ah, al):
        seg = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(entries), len(entries))
        for cid, tt in entries:
            seg += struct.pack("BB", cid, tt)
        return seg + bytes([ss, se, (ah << 4) | al])

    def interleaved():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            yield ci, my * vs + v, mx * hs + hh

    def comp_blocks(ci):
        hs, vs = samp[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        # the decoder's block-grid math, verbatim — the two sides must
        # stay bit-identical on non-MCU-aligned subsampled images
        bh2, bw2 = _comp_block_dims(
            {"h": hs, "v": vs}, plan["h0"], plan["w0"], hmax, vmax
        )
        for row in range(bh2):
            for col in range(bw2):
                yield row, col

    # scan 1: DC first, interleaved, successive approximation Al=1
    out += sos([(i + 1, dc_of[i] << 4) for i in range(ncomp)], 0, 0, 0, AL)
    w = _BitWriter()
    preds = [0] * ncomp
    for ci, r, c in interleaved():
        dc = int(qblocks_zz[ci][r, c, 0]) >> AL
        size, bitsv = _magnitude(dc - preds[ci])
        preds[ci] = dc
        code, ln = dc_tabs[dc_of[ci]][size]
        w.write(code, ln)
        if size:
            w.write(bitsv, size)
    w.flush()
    out += w.buf
    # per-component AC first scans
    for ci in range(ncomp):
        out += sos([(ci + 1, 0x00)], 1, 63, 0, AL)
        out += _enc_ac_first_scan(qblocks_zz[ci], comp_blocks(ci), ac_code, AL)
    # DC refinement: one raw bit per block, interleaved
    out += sos([(i + 1, 0x00) for i in range(ncomp)], 0, 0, AL, 0)
    w = _BitWriter()
    for ci, r, c in interleaved():
        w.write(int(qblocks_zz[ci][r, c, 0]) & 1, 1)
    w.flush()
    out += w.buf
    # per-component AC refinement scans
    for ci in range(ncomp):
        out += sos([(ci + 1, 0x00)], 1, 63, AL, 0)
        out += _enc_ac_refine_scan(qblocks_zz[ci], comp_blocks(ci), ac_code, 0)
    out += b"\xff\xd9"
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


def _comp_block_dims(c, h0, w0, hmax, vmax):
    """Non-interleaved block grid of one component (T.81 A.1.1: ceil of
    the component's own sample dims — NOT the MCU-padded grid)."""
    xi = -(-w0 * c["h"] // hmax)
    yi = -(-h0 * c["v"] // vmax)
    return -(-yi // 8), -(-xi // 8)


def _decode_sequential_scan(
    segs, scan_comps, restart, mcus_y, mcus_x, h0, w0, hmax, vmax
):
    """One baseline/extended-sequential scan: DC+AC per block. Interleaved
    (all components, MCU order) when len(scan_comps) > 1, else the single
    component's own block raster."""
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {c["id"]: 0 for c in scan_comps}
    since = 0

    def next_segment():
        nonlocal seg_idx, reader, preds, since
        seg_idx += 1
        if seg_idx >= len(segs):
            raise ValueError("missing restart segment")
        reader = _BitReader(segs[seg_idx])
        preds = {c["id"]: 0 for c in scan_comps}
        since = 0

    def one_block(c, row, col):
        zz = c["q"][row * c["bw"] + col]
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

    if len(scan_comps) > 1:  # interleaved over MCUs
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and since == restart:
                    next_segment()
                for c in scan_comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            one_block(c, my * c["v"] + v, mx * c["h"] + hh)
                since += 1
    else:  # non-interleaved: the component's own block raster
        c = scan_comps[0]
        bh2, bw2 = _comp_block_dims(c, h0, w0, hmax, vmax)
        for row in range(bh2):
            for col in range(bw2):
                if restart and since == restart:
                    next_segment()
                one_block(c, row, col)
                since += 1


def _refine_coef(block, k, p1, m1, reader):
    """Correction bit for an already-nonzero coefficient (G.1.2.3)."""
    if reader.receive(1) and (int(block[k]) & p1) == 0:
        block[k] += p1 if block[k] >= 0 else m1


def _decode_progressive_scan(
    segs, scan_comps, restart, params, mcus_y, mcus_x, h0, w0, hmax, vmax
):
    """One SOF2 scan (T.81 Annex G): DC first/refine (interleaved or not),
    AC first/refine (single component by spec). EOB runs, ZRL-in-refine,
    and per-restart eobrun/pred resets included."""
    ss, se, ah, al = params
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {c["id"]: 0 for c in scan_comps}
    state = {"eobrun": 0}
    since = 0

    def next_segment():
        nonlocal seg_idx, reader, preds, since
        seg_idx += 1
        if seg_idx >= len(segs):
            raise ValueError("missing restart segment")
        reader = _BitReader(segs[seg_idx])
        preds = {c["id"]: 0 for c in scan_comps}
        state["eobrun"] = 0
        since = 0

    def dc_block(c, row, col):
        zz = c["q"][row * c["bw"] + col]
        if ah == 0:  # first DC scan: huffman-coded diff, scaled by 2^Al
            size = _read_symbol(reader, c["dc_lut"])
            diff = _extend(reader.receive(size), size)
            preds[c["id"]] += diff
            zz[0] = preds[c["id"]] << al
        else:  # refinement: one raw bit (two's-complement OR restores it)
            if reader.receive(1):
                zz[0] = int(zz[0]) | (1 << al)

    def ac_first(c, row, col):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        zz = c["q"][row * c["bw"] + col]
        k = ss
        while k <= se:
            rs = _read_symbol(reader, c["ac_lut"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + ext bits blocks
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            zz[k] = _extend(reader.receive(s), s) << al
            k += 1

    def ac_refine(c, row, col):
        zz = c["q"][row * c["bw"] + col]
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _read_symbol(reader, c["ac_lut"])
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break
                    # r == 15 (ZRL): pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement symbol")
                    val = p1 if reader.receive(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        _refine_coef(zz, k, p1, m1, reader)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    _refine_coef(zz, k, p1, m1, reader)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:  # DC scan (Se must be 0 per spec)
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC")
        if len(scan_comps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart and since == restart:
                        next_segment()
                    for c in scan_comps:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                dc_block(c, my * c["v"] + v, mx * c["h"] + hh)
                    since += 1
        else:
            c = scan_comps[0]
            bh2, bw2 = _comp_block_dims(c, h0, w0, hmax, vmax)
            for row in range(bh2):
                for col in range(bw2):
                    if restart and since == restart:
                        next_segment()
                    dc_block(c, row, col)
                    since += 1
        return
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan_comps[0]
    fn = ac_first if ah == 0 else ac_refine
    bh2, bw2 = _comp_block_dims(c, h0, w0, hmax, vmax)
    for row in range(bh2):
        for col in range(bw2):
            if restart and since == restart:
                next_segment()
            fn(c, row, col)
            since += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array: (H, W) for 1 component, (H, W, 3) RGB
    for 3 (YCbCr per JFIF). Handles baseline/extended sequential (SOF0/1,
    interleaved or one-component-per-scan) and progressive (SOF2: spectral
    selection + successive approximation, EOB runs, DC/AC refinement).
    Tables come from the file's own DQT/DHT segments; hierarchical,
    lossless and arithmetic-coded processes raise ``ValueError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = None
    h0 = w0 = hmax = vmax = mcus_x = mcus_y = 0
    restart = 0
    progressive = False
    saw_scan = False
    i = 2
    n = len(data)
    while i < n:
        # once a scan decoded, trailer garbage (truncated EOI, appended
        # junk) must not reject the pixels already in hand — real crawl
        # files end dirty; stop parsing instead of raising
        if data[i] != 0xFF:
            if saw_scan:
                break
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            if saw_scan:
                break
            raise ValueError("truncated marker")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            if saw_scan:
                break
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
        elif marker == 0xC4:  # DHT (may be redefined between scans)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _decode_huff_table(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            _, h0, w0, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w0 // (8 * hmax))
            mcus_y = -(-h0 // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["q"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            if saw_scan:  # junk trailer that happens to look like an SOF
                break
            raise ValueError(f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for k in range(ns):
                cs, tt = body[1 + 2 * k : 3 + 2 * k]
                c = by_id.get(cs)
                if c is None:
                    raise ValueError("scan references unknown component")
                c["dc_lut"] = huff.get((0, tt >> 4))
                c["ac_lut"] = huff.get((1, tt & 0x0F))
                scan_comps.append(c)
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            if 1 < ns < len(comps):
                raise ValueError(
                    "unsupported partial-interleave scan "
                    f"({ns} of {len(comps)} components)"
                )
            # table presence: DC needed unless AC-only scan, and vice versa
            for c in scan_comps:
                needs_dc = ss == 0 and not (progressive and ah > 0)
                needs_ac = se > 0
                if needs_dc and c["dc_lut"] is None:
                    raise ValueError("missing DC Huffman table")
                if needs_ac and c["ac_lut"] is None:
                    raise ValueError("missing AC Huffman table")
                if c["tq"] not in qtabs:
                    raise ValueError("missing quant table")
            segs, end = _split_entropy(data, i + 2 + seglen)
            if progressive:
                _decode_progressive_scan(
                    segs, scan_comps, restart, (ss, se, ah, al),
                    mcus_y, mcus_x, h0, w0, hmax, vmax,
                )
            else:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad sequential scan header")
                _decode_sequential_scan(
                    segs, scan_comps, restart,
                    mcus_y, mcus_x, h0, w0, hmax, vmax,
                )
            saw_scan = True
            i = end
            continue
        i += 2 + seglen
    if comps is None or not saw_scan:
        raise ValueError("missing SOF/SOS")

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
