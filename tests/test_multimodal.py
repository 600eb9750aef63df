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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)


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

    with pytest.raises(NotImplementedError):
        DecodeAudio(fake=False)
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
