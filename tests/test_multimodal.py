import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.stages.multimodal import (
    IMAGE_FEATURE_SCHEMA,
    DecodeImage,
    decode_images,
    make_media_table,
    sample_frames,
)


def _media(n=6):
    rng = np.random.default_rng(5)
    payloads = [rng.bytes(1000 + 100 * i) for i in range(n)]
    return make_media_table([f"img-{i}" for i in range(n)], payloads)


def _png_bmp_media():
    from ertransfer_ray.functions.codecs import encode_bmp, encode_png

    rng = np.random.default_rng(11)
    png = encode_png(rng.integers(0, 256, (12, 9, 3), dtype=np.uint8))
    bmp = encode_bmp(rng.integers(0, 256, (7, 5, 3), dtype=np.uint8))
    return make_media_table(
        ["u-png", "u-bmp", "u-bad"], [png, bmp, b"not an image"]
    )


def test_real_decode_png_bmp_skips_undecodable():
    out = DecodeImage(fake=False, embed_dim=8)(_png_bmp_media())
    assert out.schema.equals(IMAGE_FEATURE_SCHEMA)
    assert out.column("url").to_pylist() == ["u-png", "u-bmp"]
    assert out.column("mime").to_pylist() == ["image/png", "image/bmp"]
    assert out.column("width").to_pylist() == [9, 5]
    assert out.column("height").to_pylist() == [12, 7]
    for emb in out.column("embedding").to_pylist():
        assert len(emb) == 8 and abs(np.linalg.norm(emb) - 1.0) < 1e-5
    # same pixels, different container -> different embeddings is expected;
    # same payload decodes identically on a second pass
    again = DecodeImage(fake=False, embed_dim=8)(_png_bmp_media())
    assert again.equals(out)


def test_real_decode_on_error_raise():
    with pytest.raises(Exception):
        DecodeImage(fake=False, on_error="raise")(_png_bmp_media())


def test_real_decode_actor_pool_pipeline():
    ds = rd.from_arrow(_png_bmp_media())
    out = decode_images(ds, fake=False, batch_size=2, concurrency=1).to_pandas()
    assert sorted(out["url"]) == ["u-bmp", "u-png"]


def test_real_resize_reencodes_png():
    from ertransfer_ray.functions.codecs import decode_png
    from ertransfer_ray.stages.multimodal import ResizeImage

    out = ResizeImage(width=4, height=6, fake=False)(_png_bmp_media())
    assert out.column("url").to_pylist() == ["u-png", "u-bmp"]
    for payload in out.column("payload").to_pylist():
        img = decode_png(bytes(payload))
        assert img.shape == (6, 4, 3)


def test_fake_decode_schema_and_determinism():
    tbl = _media()
    out1 = DecodeImage(fake=True)(tbl)
    out2 = DecodeImage(fake=True)(tbl)
    assert out1.schema.equals(IMAGE_FEATURE_SCHEMA)
    assert out1.equals(out2)
    assert out1.column("n_bytes").to_pylist()[0] == 1000
    emb = out1.column("embedding").to_pylist()[0]
    assert len(emb) == 8
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5


def test_decode_actor_pool_pipeline():
    ds = rd.from_arrow(_media(10))
    out = decode_images(ds, fake=True, batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 10
    assert set(out.columns) == set(IMAGE_FEATURE_SCHEMA.names)


def test_frame_sampler_explodes_rows():
    ds = rd.from_arrow(_media(3))
    out = sample_frames(ds, k=4, batch_size=2, concurrency=1).to_pandas()
    assert len(out) == 12
    assert set(out["frame_index"]) == {0, 1, 2, 3}
    assert all(isinstance(b, bytes) for b in out["frame_payload"])


def test_audio_decode_schema_and_determinism():
    from ertransfer_ray.stages.multimodal import (
        AUDIO_FEATURE_SCHEMA,
        DecodeAudio,
        decode_audio,
    )

    tbl = make_media_table(["a-0", "a-1"], [b"x" * 3200, b"y" * 6400],
                           mime="audio/fake")
    out1 = DecodeAudio(fake=True)(tbl)
    out2 = DecodeAudio(fake=True)(tbl)
    assert out1.schema.equals(AUDIO_FEATURE_SCHEMA)
    assert out1.equals(out2)
    assert out1.column("duration_ms").to_pylist() == [100, 200]
    feats = out1.column("features").to_pylist()[0]
    assert len(feats) == 13 and abs(np.linalg.norm(feats) - 1.0) < 1e-5
    # actor-pool path carries every key through
    ds = rd.from_arrow(tbl)
    got = decode_audio(ds, batch_size=1, concurrency=2).to_pandas()
    assert set(got["url"]) == {"a-0", "a-1"}


def test_resize_images_changes_dims_preserves_rest():
    from ertransfer_ray.stages.multimodal import resize_images

    ds = rd.from_arrow(_media(4))
    feats = decode_images(ds, fake=True, batch_size=2, concurrency=2)
    resized = resize_images(feats, width=224, height=224,
                            batch_size=2, concurrency=2).to_pandas()
    assert (resized["width"] == 224).all() and (resized["height"] == 224).all()
    orig = decode_images(rd.from_arrow(_media(4)), fake=True,
                         batch_size=2, concurrency=2).to_pandas()
    merged = resized.merge(orig, on="url", suffixes=("_r", "_o"))
    assert (merged["checksum_r"] == merged["checksum_o"]).all()
    assert len(resized) == 4


def test_real_audio_decode_wav():
    from ertransfer_ray.functions.codecs import encode_wav
    from ertransfer_ray.stages.multimodal import AUDIO_FEATURE_SCHEMA, DecodeAudio

    t = np.linspace(0, 1, 16000, endpoint=False, dtype=np.float32)
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t).reshape(-1, 1), 16000)
    tbl = make_media_table(["w-0", "w-bad"], [wav, b"not audio"],
                           mime="audio/wav")
    out = DecodeAudio(fake=False, n_features=13)(tbl)
    assert out.schema.equals(AUDIO_FEATURE_SCHEMA)
    assert out.column("url").to_pylist() == ["w-0"]  # bad row skipped
    assert out.column("duration_ms").to_pylist() == [1000]
    feats = out.column("features").to_pylist()[0]
    assert len(feats) == 13 and abs(np.linalg.norm(feats) - 1.0) < 1e-5
    with pytest.raises(Exception):
        DecodeAudio(fake=False, on_error="raise")(tbl)
