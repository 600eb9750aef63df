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
