import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.stages.knn import brute_force_topk, ivf_topk


def _emb(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )
    ), vecs


def test_brute_force_exact_vs_numpy():
    ds, vecs = _emb()
    q = vecs[7].astype(np.float64)
    out = brute_force_topk(ds, q, k=5)
    v = vecs.astype(np.float64)
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    exp = np.argsort(-cos)[:5]
    assert out["vec_id"].tolist() == exp.tolist()
    assert out["vec_id"].iloc[0] == 7 and abs(out["cosine"].iloc[0] - 1.0) < 1e-9
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_brute_force_multi_query():
    ds, vecs = _emb()
    out = brute_force_topk(ds, vecs[:3].astype(np.float64), k=2)
    assert set(out["qid"]) == {0, 1, 2}
    for q in range(3):
        assert out[out["qid"] == q]["vec_id"].iloc[0] == q  # self first


def test_ivf_recall_reasonable():
    ds, vecs = _emb(400)
    q = vecs[11].astype(np.float64)
    exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
    approx = set(ivf_topk(ds, q, k=10, num_buckets=8, nprobe=4)["vec_id"].tolist())
    # probing half the buckets should recover most of the true top-10
    assert len(exact & approx) >= 5
    assert 11 in approx  # the query vector itself lives in a probed bucket
