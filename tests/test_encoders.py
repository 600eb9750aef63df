"""Encoder stages: hashed-ngram embedder, distributed-PCA autoencoder,
IVF KNN join, DeepBlocker candidate generation (T3/T4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.stages.encoders import (
    HashedNgramEncoder,
    deepblocker_topk,
    encode_texts,
    fit_linear_autoencoder,
    ivf_knn_join,
    project_embeddings,
)


def test_hashed_ngram_encoder_deterministic_and_unit_norm():
    enc = HashedNgramEncoder(dim=64, ngram=3, seed=13)
    texts = ["apple pie recipe", "apple pie recipes", "quantum flux capacitor", ""]
    a = enc.encode(texts)
    b = enc.encode(texts)
    np.testing.assert_array_equal(a, b)
    norms = np.linalg.norm(a.astype(np.float64), axis=1)
    np.testing.assert_allclose(norms[:3], 1.0, atol=1e-5)


def test_hashed_ngram_encoder_batch_split_invariant():
    enc = HashedNgramEncoder(dim=64)
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    whole = enc.encode(texts)
    parts = np.vstack([enc.encode(texts[:1]), enc.encode(texts[1:])])
    np.testing.assert_array_equal(whole, parts)


def test_hashed_ngram_encoder_similarity_ordering():
    enc = HashedNgramEncoder(dim=256)
    v = enc.encode(
        ["the quick brown fox jumps", "the quick brown fox jumped", "zzz qqq 123"]
    ).astype(np.float64)
    near = float(v[0] @ v[1])
    far = float(v[0] @ v[2])
    assert near > 0.7 > far


def test_encode_texts_stage(ray_session):
    ds = rd.from_arrow(
        pa.table({"id": [1, 2], "agValue": ["hello world", "other text"]})
    )
    out = encode_texts(ds, dim=32).take_all()
    assert {r["id"] for r in out} == {1, 2}
    assert all(len(r["embedding"]) == 32 for r in out)


def test_linear_autoencoder_matches_direct_pca(ray_session):
    rng = np.random.default_rng(3)
    # anisotropic cloud: 3 dominant directions in 8-d
    basis = rng.standard_normal((3, 8))
    x = rng.standard_normal((500, 3)) * np.array([5.0, 2.0, 1.0]) @ basis
    x += rng.standard_normal((500, 8)) * 0.01 + 7.0
    tbl = pa.table(
        {"id": list(range(500)),
         "embedding": pa.array(x.astype(np.float32).tolist(), pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(tbl).repartition(4)
    ae = fit_linear_autoencoder(ds, dim_out=3)
    # direct PCA on the same float32-rounded data
    xf = np.asarray(x.astype(np.float32), dtype=np.float64)
    c = xf - xf.mean(axis=0)
    _, svals, vt = np.linalg.svd(c, full_matrices=False)
    direct = vt[:3].T
    # same subspace: projector difference ~ 0 (signs/rotation-free check)
    p1 = ae.components @ ae.components.T
    p2 = direct @ direct.T
    assert np.abs(p1 - p2).max() < 1e-6
    assert ae.explained > 0.99
    assert ae.reconstruction_error(xf) < 1e-3


def test_linear_autoencoder_parallelism_invariant(ray_session):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((200, 6)).astype(np.float32)
    tbl = pa.table({"id": list(range(200)),
                    "embedding": pa.array(x.tolist(), pa.list_(pa.float32()))})
    a1 = fit_linear_autoencoder(rd.from_arrow(tbl).repartition(1), dim_out=2)
    a8 = fit_linear_autoencoder(rd.from_arrow(tbl).repartition(8), dim_out=2)
    np.testing.assert_allclose(a1.components, a8.components, atol=1e-9)
    np.testing.assert_allclose(a1.mean, a8.mean, atol=1e-9)


def test_project_embeddings_stage(ray_session):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    tbl = pa.table({"id": list(range(50)),
                    "embedding": pa.array(x.tolist(), pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    ae = fit_linear_autoencoder(ds, dim_out=4)
    out = project_embeddings(ds, ae).take_all()
    assert all(len(r["embedding"]) == 4 for r in out)
    by_id = {r["id"]: np.asarray(r["embedding"], dtype=np.float64) for r in out}
    want = ae.encode(x.astype(np.float64))
    np.testing.assert_allclose(by_id[0], want[0], atol=1e-5)


def _cluster_vectors(n_clusters: int, per: int, dim: int, seed: int):
    """Well-separated clusters: members of a cluster are near-duplicates."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 10
    ids, vecs, truth = [], [], {}
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            ids.append(i)
            truth[i] = c
            vecs.append(centers[c] + rng.standard_normal(dim) * 0.05)
            i += 1
    return ids, np.asarray(vecs, dtype=np.float32), truth


def test_ivf_knn_join_recall_vs_bruteforce(ray_session):
    ids, vecs, truth = _cluster_vectors(n_clusters=8, per=6, dim=16, seed=7)
    tbl = pa.table({"id": ids, "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    a = rd.from_arrow(tbl).repartition(2)
    b = rd.from_arrow(tbl).repartition(2)
    out = ivf_knn_join(a, b, k=3, num_buckets=8, nprobe=3).take_all()
    df = pd.DataFrame(out)
    # every A row got k results
    assert (df.groupby("tableA_id").size() == 3).all()
    # top-3 neighbours of a clustered point are from its own cluster
    same = [truth[r.tableA_id] == truth[r.tableB_id] for r in df.itertuples()]
    assert np.mean(same) > 0.95


def test_deepblocker_topk_finds_true_matches(ray_session):
    # near-duplicate agValues across two tables; matches are i <-> i
    base = [
        "garmin forerunner 235 gps running watch black",
        "apple iphone 12 pro max 256gb pacific blue",
        "dyson v11 cordless vacuum cleaner nickel",
        "kitchenaid artisan stand mixer 5 quart red",
        "sony wh-1000xm4 wireless noise canceling headphones",
        "lego star wars millennium falcon building kit",
        "patagonia better sweater fleece jacket mens",
        "nespresso vertuo next coffee espresso machine",
        "samsung 65 inch qled 4k smart tv q80",
        "bose soundlink revolve bluetooth speaker silver",
    ]
    a = pa.table({"id": list(range(10)), "agValue": base})
    b = pa.table(
        {"id": list(range(10)),
         "agValue": [s.replace("black", "blk") + " new" for s in base]}
    )
    pairs = deepblocker_topk(
        rd.from_arrow(a), rd.from_arrow(b), k=2, dim=128, dim_out=8,
        num_buckets=4, nprobe=2,
    ).take_all()
    df = pd.DataFrame(pairs)
    found = set(zip(df["tableA_id"], df["tableB_id"]))
    recall = np.mean([(i, i) in found for i in range(10)])
    assert recall >= 0.9


def test_deepblocker_reverse_swaps_sides(ray_session):
    a = pa.table({"id": [0, 1], "agValue": ["aaa bbb ccc", "ddd eee fff"]})
    b = pa.table({"id": [10, 11, 12],
                  "agValue": ["aaa bbb ccd", "ddd eee ffg", "zzz yyy xxx"]})
    fwd = pd.DataFrame(
        deepblocker_topk(rd.from_arrow(a), rd.from_arrow(b), k=1,
                         dim=64, dim_out=4, num_buckets=2, nprobe=2).take_all()
    )
    rev = pd.DataFrame(
        deepblocker_topk(rd.from_arrow(a), rd.from_arrow(b), k=1, reverse=True,
                         dim=64, dim_out=4, num_buckets=2, nprobe=2).take_all()
    )
    # forward: k per A record → 2 rows; reverse: k per B record → 3 rows
    assert len(fwd) == 2 and len(rev) == 3
    assert set(rev.columns) == {"tableA_id", "tableB_id", "score"}
    # reverse output keeps A ids in tableA_id
    assert set(rev["tableA_id"]).issubset({0, 1})
    assert set(rev["tableB_id"]).issubset({10, 11, 12})


def test_deepblocker_reverse_forwards_capture(ray_session):
    """capture= must be honored under reverse=True, with keys in the
    CALLER's table order (proj_a <- table_a even though the inner call
    swaps sides)."""
    a = pa.table({"id": [0, 1], "agValue": ["aaa bbb ccc", "ddd eee fff"]})
    b = pa.table({"id": [10, 11, 12],
                  "agValue": ["aaa bbb ccd", "ddd eee ffg", "zzz yyy xxx"]})
    cap: dict = {}
    deepblocker_topk(rd.from_arrow(a), rd.from_arrow(b), k=1, reverse=True,
                     dim=64, dim_out=4, num_buckets=2, nprobe=2,
                     capture=cap).take_all()
    assert set(cap) == {"proj_a", "proj_b", "centroids"}
    pa_ids = {r["id"] for r in cap["proj_a"].take_all()}
    pb_ids = {r["id"] for r in cap["proj_b"].take_all()}
    assert pa_ids == {0, 1} and pb_ids == {10, 11, 12}
    assert cap["centroids"].ndim == 2
