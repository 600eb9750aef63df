"""Pure-stdlib codec round-trips (functions/codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from ertransfer_ray.functions.codecs import (
    audio_features,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    image_embedding,
    pool_grid,
    resize_nearest,
    sniff_mime,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4), (1, 1), (16, 3, 3)]
)
def test_png_roundtrip_every_filter_and_layout(filter_type, shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_png(encode_png(img, filter_type))
    assert dec.shape == img.shape and (dec == img).all()


def test_png_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.sampled_from([1, 2, 3, 4]),
        st.integers(0, 4),
        st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, filt, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_png(encode_png(img, filt)) == img).all()

    check()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


@pytest.mark.parametrize("shape", [(4, 4, 3), (3, 5, 3), (1, 1, 3), (2, 7, 3)])
def test_bmp_roundtrip_including_row_padding(shape):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 8000, endpoint=False, dtype=np.float32)
    mono = (0.5 * np.sin(2 * np.pi * 220 * t)).reshape(-1, 1)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (8000, 1)
    assert np.abs(s - mono).max() < 1e-3
    stereo = np.stack([mono[:, 0], -mono[:, 0]], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, 8000))
    assert s2.shape == (8000, 2) and np.abs(s2 - stereo).max() < 1e-3


def test_sniff_mime():
    png = encode_png(np.zeros((2, 2), np.uint8))
    bmp = encode_bmp(np.zeros((2, 2, 3), np.uint8))
    wav = encode_wav(np.zeros((16, 1), np.float32), 8000)
    assert sniff_mime(png) == "image/png"
    assert sniff_mime(bmp) == "image/bmp"
    assert sniff_mime(wav) == "audio/wav"
    assert sniff_mime(b"????????????") == "application/octet-stream"


def test_pool_grid_exact_on_divisible():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    grid = pool_grid(img, 2, 2)
    assert np.allclose(grid, [[2.5, 4.5], [10.5, 12.5]])


def test_image_embedding_unit_norm_and_shape():
    rng = np.random.default_rng(3)
    for shape in [(64, 48, 3), (10, 10), (5, 9, 4)]:
        e = image_embedding(rng.integers(0, 256, shape, dtype=np.uint8), 8)
        assert e.shape == (8,) and abs(np.linalg.norm(e) - 1.0) < 1e-5
    flat = image_embedding(np.full((8, 8), 77, np.uint8), 8)
    assert np.allclose(flat, 0)  # constant image -> zero after centering


def test_resize_nearest_shapes():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    assert resize_nearest(img, 5, 3).shape == (5, 3, 3)
    assert resize_nearest(img, 20, 12).shape == (20, 12, 3)
    assert (resize_nearest(img, 10, 6) == img).all()


def test_audio_features_unit_norm():
    t = np.linspace(0, 1, 4000, dtype=np.float32).reshape(-1, 1)
    f = audio_features(t, 13)
    assert f.shape == (13,) and abs(np.linalg.norm(f) - 1.0) < 1e-5
    assert np.allclose(audio_features(np.zeros((0, 1), np.float32), 5), 0)
