"""Baseline JPEG codec (functions/jpeg): round-trip PSNR bounds across
modes/geometries, spec-structure checks, table validity, error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ertransfer_ray.functions import jpeg as J
from ertransfer_ray.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h, w, color=True):
    yy, xx = np.mgrid[0:h, 0:w]
    if color:
        return np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
        ).astype(np.uint8)
    return ((yy * 5 + xx * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,color,subsample,min_psnr",
    [
        ((48, 64), False, False, 40.0),  # gray sawtooth (%256 wrap edges)
        ((48, 64), True, False, 45.0),
        ((48, 64), True, True, 40.0),   # 4:2:0 chroma averaging is lossier
        ((37, 29), False, False, 40.0),  # non-multiple-of-8
        ((45, 35), True, True, 38.0),    # odd dims + subsampling
        ((1, 1), False, False, 40.0),
        ((9, 17), True, False, 40.0),
    ],
)
def test_roundtrip_psnr(shape, color, subsample, min_psnr):
    img = _gradient(*shape, color=color)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    assert _psnr(img, out) >= min_psnr


def test_solid_color_near_exact():
    img = np.full((16, 24, 3), 200, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert _psnr(img, out) >= 55.0


def test_restart_markers_roundtrip():
    img = _gradient(48, 64)
    data = encode_jpeg(img, quality=85, restart_interval=3)
    # DRI segment present, and at least one RSTn marker in the stream
    assert b"\xff\xdd" + struct.pack(">HH", 4, 3) in data
    assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
    assert _psnr(img, decode_jpeg(data)) >= 45.0


def test_deterministic_and_sniffable():
    from ertransfer_ray.functions.codecs import sniff_mime

    img = _gradient(20, 20)
    a, b = encode_jpeg(img, quality=80), encode_jpeg(img, quality=80)
    assert a == b
    assert a[:3] == b"\xff\xd8\xff"
    assert sniff_mime(a) == "image/jpeg"
    assert a.endswith(b"\xff\xd9")


def test_byte_stuffing_survives_noise():
    """Random noise at high quality produces 0xFF entropy bytes; a decode
    that ignores stuffing would desync and raise or corrupt badly."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=95)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert _psnr(img, out) >= 25.0  # quantization-bounded, not structural


def test_annex_k_tables_are_valid_huffman():
    """bits/vals consistency + Kraft inequality for every encoder table —
    a mis-transcribed table would be structurally invalid, not just
    suboptimal."""
    for bits, vals in [
        (J.DC_LUM_BITS, J.DC_LUM_VALS),
        (J.DC_CHROM_BITS, J.DC_CHROM_VALS),
        (J.AC_LUM_BITS, J.AC_LUM_VALS),
        (J.AC_CHROM_BITS, J.AC_CHROM_VALS),
        J._flat_table(J._PROG_AC_SYMBOLS),  # the progressive AC table
    ]:
        assert sum(bits) == len(vals)
        assert len(set(vals)) == len(vals)
        kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
        assert kraft <= 1.0
        # canonical assignment must not produce an all-ones max-length code
        codes = J._canonical_codes(bits, vals)
        for code, length in codes.values():
            assert code < (1 << length)


def test_quality_monotonic_size():
    img = _gradient(64, 64)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_zigzag_is_permutation():
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))
    # spot-check the spec's first diagonal
    assert J.ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_decoder_error_paths():
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(data[:40])  # truncated before SOS
    # lossless flag: rewrite SOF0 (C0) marker to SOF3 (C3)
    lossless = data.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(lossless)


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: 0xFF fill bytes may pad any marker — real encoders
    emit them and the parser must skip, not misparse."""
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=85)
    padded = data.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    assert _psnr(img, decode_jpeg(padded)) >= 40.0


@pytest.mark.parametrize(
    "shape,subsample",
    [
        ((48, 64, 3), False),
        ((48, 64, 3), True),
        ((37, 29), False),
        ((45, 35, 3), True),
        ((9, 17, 3), False),
        ((1, 1), False),
    ],
)
def test_progressive_bit_identical_to_baseline(shape, subsample):
    """The progressive scan script (DC Al=1 + refine, per-component AC
    first + refine) carries the SAME quantized coefficients as the
    baseline encoding, so decode must be bit-identical — this pins every
    Annex-G decoder path (EOB runs, ZRL-in-refine, correction bits,
    successive approximation) against the already-validated baseline.
    Random noise maximizes the refinement traffic."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsample=subsample))
    assert np.array_equal(base, prog)


def test_progressive_property_bit_identical():
    """Hypothesis: for ANY image/geometry/quality/subsampling, the
    progressive encoding decodes bit-identically to the baseline one —
    the two carry the same quantized coefficients by construction."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        color=st.booleans(),
        subsample=st.booleans(),
        quality=st.integers(30, 95),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, color, subsample, quality, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        sub = subsample and color
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsample=sub)
        )
        assert np.array_equal(base, prog)

    check()


def test_progressive_smooth_and_sniffable():
    img = _gradient(40, 40)
    data = encode_jpeg_progressive(img, quality=90)
    assert b"\xff\xc2" in data  # SOF2
    assert np.array_equal(decode_jpeg(data), decode_jpeg(encode_jpeg(img, quality=90)))


def test_sequential_noninterleaved_scans():
    """One-component-per-scan SEQUENTIAL files (spec-legal, occasionally
    emitted): splice three grayscale entropy streams into one 3-component
    SOF0 file and decode."""
    from ertransfer_ray.functions.jpeg import _rgb_to_ycbcr

    img = _gradient(24, 24)
    y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8)
                 for p in _rgb_to_ycbcr(img))
    streams = []
    for plane in (y, cb, cr):
        d = encode_jpeg(plane, quality=90)
        s = d.find(b"\xff\xda")
        streams.append(d[s + 2 + 8 : -2])  # entropy between SOS hdr and EOI
        header_src = d  # headers identical across the three gray encodes
    sof = header_src.find(b"\xff\xc0")
    out = bytearray(header_src[:sof])  # SOI+APP0+DQT(lum)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 9, 8, 24, 24, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0)
    dht_start = header_src.find(b"\xff\xc4")
    out += header_src[dht_start : header_src.find(b"\xff\xda")]
    for cid, stream in zip((1, 2, 3), streams):
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([cid, 0x00])
        out += b"\x00\x3f\x00" + stream
    out += b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    # expected: same coefficients via the gray decodes + the module's own
    # color formula (gray path rounds planes first -> allow off-by-2)
    yd, cbd, crd = (decode_jpeg(encode_jpeg(p, quality=90)).astype(np.float64)
                    for p in (y, cb, cr))
    exp = np.clip(np.round(np.stack([
        yd + 1.402 * (crd - 128.0),
        yd - 0.344136 * (cbd - 128.0) - 0.714136 * (crd - 128.0),
        yd + 1.772 * (cbd - 128.0),
    ], axis=-1)), 0, 255)
    assert np.abs(got.astype(np.float64) - exp).max() <= 2.0


def test_dirty_trailer_tolerated_after_scan():
    """Real crawl files end dirty: truncated EOI or appended junk after
    the entropy data must not reject pixels already decoded."""
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=85)
    clean = decode_jpeg(data)
    # drop EOI, leave a dangling 0xFF
    assert np.array_equal(decode_jpeg(data[:-2] + b"\xff"), clean)
    # appended junk containing marker-like bytes (incl. a fake SOF3)
    assert np.array_equal(
        decode_jpeg(data[:-2] + b"\x00junk\xff\xc3\x99"), clean
    )
    # but pre-scan truncation still raises
    with pytest.raises(ValueError):
        decode_jpeg(data[:40])


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), np.uint8))


def test_decode_image_stage_handles_jpeg():
    """The multimodal actor path: JPEG payload in, feature row out."""
    import pyarrow as pa

    from ertransfer_ray.stages.multimodal import DecodeImage

    img = _gradient(24, 32)
    batch = pa.table(
        {
            "url": pa.array(["http://a/x.jpg", "http://a/bad.bin"]),
            "mime": pa.array(["image/jpeg", "application/octet-stream"]),
            "payload": pa.array(
                [encode_jpeg(img, quality=88), b"not an image"], pa.binary()
            ),
        }
    )
    out = DecodeImage(fake=False)(batch)
    assert out.num_rows == 1  # bad payload skipped
    row = out.to_pylist()[0]
    assert row["mime"] == "image/jpeg"
    assert (row["height"], row["width"]) == (24, 32)
