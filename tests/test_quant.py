"""Int8 embedding quantization: roundtrip error bound, scale-invariant
cosine recall through the unchanged top-k path, storage shrink."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.stages.knn import brute_force_topk
from ertransfer_ray.stages.quant import dequantize_embeddings, quantize_embeddings


def _emb_table(n=600, d=64, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    from ertransfer_ray.functions.arrays import matrix_to_list_column

    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": matrix_to_list_column(x, pa.float32()),
        }
    ), x


def test_roundtrip_error_bound(ray_session):
    t, x = _emb_table()
    ds = rd.from_arrow(t).repartition(4)
    back = dequantize_embeddings(quantize_embeddings(ds)).to_pandas()
    back = back.sort_values("vec_id", ignore_index=True)
    got = np.stack(back["embedding"].to_numpy())
    bound = np.abs(x).max(axis=1, keepdims=True) / 254.0 + 1e-6
    assert (np.abs(got - x) <= bound).all()


def test_quantized_topk_recall(ray_session):
    t, x = _emb_table()
    ds = rd.from_arrow(t)
    rng = np.random.default_rng(9)
    queries = rng.normal(size=(5, x.shape[1]))
    exact = brute_force_topk(ds, queries, k=10)
    quant = brute_force_topk(quantize_embeddings(ds), queries, k=10)
    for q in range(5):
        a = set(exact[exact.qid == q]["vec_id"])
        b = set(quant[quant.qid == q]["vec_id"])
        assert len(a & b) / 10 >= 0.9, (q, a - b)


def test_int8_column_is_4x_smaller(ray_session):
    t, _ = _emb_table(n=2000)
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, f"{d}/f32.parquet", compression=None)
        qt = pa.concat_tables(
            quantize_embeddings(rd.from_arrow(t)).iter_batches(
                batch_format="pyarrow"
            )
        )
        pq.write_table(qt, f"{d}/i8.parquet", compression=None)
        ratio = os.path.getsize(f"{d}/f32.parquet") / os.path.getsize(f"{d}/i8.parquet")
        assert ratio > 3.0, ratio


def test_int8_rides_ivf_path(ray_session):
    """The IVF scale path normalizes vectors before centroid assignment,
    so the quantized column drops in unchanged there as well."""
    from ertransfer_ray.stages.knn import ivf_topk

    t, x = _emb_table()
    ds = rd.from_arrow(t)
    rng = np.random.default_rng(11)
    queries = rng.normal(size=(3, x.shape[1]))
    f = ivf_topk(ds, queries, k=10, num_buckets=8, nprobe=4)
    q8 = ivf_topk(quantize_embeddings(ds), queries, k=10, num_buckets=8, nprobe=4)
    for q in range(3):
        a = set(f[f.qid == q]["vec_id"])
        b = set(q8[q8.qid == q]["vec_id"])
        assert len(a & b) / 10 >= 0.8, (q, a ^ b)
