"""Distributed KMeans (A9 diagnostics family): fit, assignment, and the
per-cluster F1/P/R report, parity vs the reference's formulas."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.stages.kmeans import (
    assign_clusters,
    cluster_label_report,
    fit_kmeans,
)


def _blobs(seed=3, per=60, centers=((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0))):
    rng = np.random.default_rng(seed)
    xs, truth = [], []
    for ci, c in enumerate(centers):
        xs.append(np.asarray(c) + rng.standard_normal((per, 2)) * 0.4)
        truth.extend([ci] * per)
    x = np.vstack(xs)
    return x, np.asarray(truth)


def test_fit_kmeans_recovers_blobs(ray_session):
    x, truth = _blobs()
    tbl = pa.table({"id": list(range(len(x))),
                    "x0": x[:, 0].tolist(), "x1": x[:, 1].tolist()})
    ds = rd.from_arrow(tbl).repartition(4)
    model = fit_kmeans(ds, ["x0", "x1"], k=3, seed=17)
    assert model.k == 3 and model.sizes.sum() == len(x)
    # each blob maps to exactly one centroid
    assigned = pd.DataFrame(
        assign_clusters(ds, model, ["x0", "x1"], id_cols=["id"]).take_all()
    ).sort_values("id")
    purity = (
        pd.DataFrame({"t": truth, "c": assigned["cluster"].to_numpy()})
        .groupby("t")["c"].nunique()
    )
    assert (purity == 1).all()
    assert model.inertia < 2.0 * len(x)  # tight blobs → small inertia


def test_fit_kmeans_embedding_column(ray_session):
    x, _ = _blobs(seed=5)
    tbl = pa.table({"id": list(range(len(x))),
                    "embedding": pa.array(x.tolist(), pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl)
    model = fit_kmeans(ds, "embedding", k=3, seed=17)
    assert model.sizes.sum() == len(x) and (model.sizes > 0).all()


def test_fit_kmeans_parallelism_tolerant(ray_session):
    x, _ = _blobs(seed=7)
    tbl = pa.table({"id": list(range(len(x))),
                    "x0": x[:, 0].tolist(), "x1": x[:, 1].tolist()})
    # local_threshold=0 forces the DISTRIBUTED sufficient-statistics path
    m1 = fit_kmeans(rd.from_arrow(tbl).repartition(1), ["x0", "x1"], k=3,
                    seed=17, local_threshold=0)
    m8 = fit_kmeans(rd.from_arrow(tbl).repartition(8), ["x0", "x1"], k=3,
                    seed=17, local_threshold=0)
    # same init (seeded sample is read-order stable) → same result within fp noise
    np.testing.assert_allclose(
        np.sort(m1.centroids, axis=0), np.sort(m8.centroids, axis=0), atol=1e-8
    )


def test_kmeans_local_fast_path_matches_distributed(ray_session):
    x, _ = _blobs(seed=9)
    tbl = pa.table({"id": list(range(len(x))),
                    "x0": x[:, 0].tolist(), "x1": x[:, 1].tolist()})
    ds = rd.from_arrow(tbl).repartition(4)
    local = fit_kmeans(ds, ["x0", "x1"], k=3, seed=17)  # below threshold
    dist = fit_kmeans(ds, ["x0", "x1"], k=3, seed=17, local_threshold=0)
    np.testing.assert_allclose(
        np.sort(local.centroids, axis=0), np.sort(dist.centroids, axis=0),
        atol=1e-8,
    )
    assert sorted(local.sizes.tolist()) == sorted(dist.sizes.tolist())


def test_fit_kmeans_one_dim_probabilities(ray_session):
    # reference kmeans_probability: 1-D KMeans over prob_class1
    probs = np.concatenate([np.full(50, 0.05), np.full(50, 0.95)])
    probs += np.linspace(0, 0.01, 100)
    tbl = pa.table({"pair": list(range(100)), "prob_class1": probs.tolist()})
    model = fit_kmeans(rd.from_arrow(tbl), ["prob_class1"], k=2, seed=1)
    lo, hi = np.sort(model.centroids.ravel())
    assert lo < 0.1 and hi > 0.9
    assert sorted(model.sizes.tolist()) == [50, 50]


def test_cluster_label_report_formula_parity(ray_session):
    # hand-computed parity with sklearn_clusters.py:10-13
    df = pd.DataFrame(
        {"cluster": [0, 0, 0, 1, 1], "label": [1, 1, 0, 0, 1]}
    )
    rep = cluster_label_report(rd.from_pandas(df))
    total_pos = 3.0
    r0 = rep[rep["cluster"] == 0].iloc[0]
    assert r0["size"] == 3 and r0["pos"] == 2
    assert r0["precision"] == 2 / 3
    assert r0["recall"] == 2 / total_pos
    assert r0["f1"] == 2 * 2 / (3 + total_pos)
    r1 = rep[rep["cluster"] == 1].iloc[0]
    assert r1["f1"] == 2 * 1 / (2 + total_pos)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # k larger than the number of distinct points: extra centroids stay put
    tbl = pa.table({"x0": [0.0, 0.0, 10.0], "x1": [0.0, 0.0, 0.0]})
    model = fit_kmeans(rd.from_arrow(tbl), ["x0", "x1"], k=3, seed=2)
    assert model.sizes.sum() == 3
    assert np.isfinite(model.centroids).all()


def test_kmeans_empty_input_raises(ray_session):
    import pytest

    tbl = pa.table({"x0": pa.array([], pa.float64()),
                    "x1": pa.array([], pa.float64())})
    with pytest.raises(ValueError, match="empty"):
        fit_kmeans(rd.from_arrow(tbl), ["x0", "x1"], k=2)


def test_autoencoder_empty_input_raises(ray_session):
    import pytest

    from ertransfer_ray.stages.encoders import fit_linear_autoencoder

    tbl = pa.table({"id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="empty"):
        fit_linear_autoencoder(rd.from_arrow(tbl), dim_out=2)
