"""functions/plot.py raster renderer + stages/tsne.py exact t-SNE —
the matplotlib/sklearn-free closures of the reference's PNG diagnostics
(clustering/Probabilities/entrypoint.py:108 histogram PNG;
clustering/Embeddings/embeddings.py:29-49 t-SNE + KMeans(2) report)."""

import os

import numpy as np
import pandas as pd
import pytest

from ertransfer_ray.functions.codecs import decode_png
from ertransfer_ray.functions.plot import Canvas, bar_chart, save_png, scatter
from ertransfer_ray.stages.tsne import embedding_cluster_diagnostic, tsne


def test_bar_chart_roundtrips_through_own_png(tmp_path):
    bins = np.arange(0.0, 1.0, 0.01)
    rng = np.random.default_rng(0)
    c0, _ = np.histogram(rng.beta(2, 8, 2000), bins=np.arange(0, 1.01, 0.01))
    c1, _ = np.histogram(rng.beta(8, 2, 200), bins=np.arange(0, 1.01, 0.01))
    img = bar_chart(bins, {"0": c0, "1": c1}, 0.01)
    p = str(tmp_path / "h.png")
    save_png(p, img)
    back = decode_png(open(p, "rb").read())
    assert np.array_equal(back, img)
    assert img.shape == (400, 640, 3)


def test_bar_chart_bar_heights_track_counts():
    # two bars, counts 10 vs 1000 on a log axis: the taller bar's colored
    # column must start strictly higher (smaller y) and both must exist
    bins = np.array([0.0, 0.5])
    c = np.array([10, 1000])
    img = bar_chart(bins, {"0": c}, 0.5, log_y=True)
    nonwhite = (img < 250).any(axis=2)
    # exclude axis/legend border rows: look at two x columns inside each bar
    col_low = nonwhite[:, 120].nonzero()[0]
    col_high = nonwhite[:, 400].nonzero()[0]
    assert len(col_low) and len(col_high)
    assert col_high.min() < col_low.min()  # 1000-bar top is higher up


def test_bar_chart_deterministic_bytes():
    bins = np.arange(0.0, 1.0, 0.01)
    c = (np.arange(100) % 7) * 3
    a = bar_chart(bins, {"0": c, "1": c[::-1]}, 0.01)
    b = bar_chart(bins, {"0": c, "1": c[::-1]}, 0.01)
    assert np.array_equal(a, b)


def test_scatter_draws_all_classes_in_distinct_colors():
    xy = np.array([[0.0, 0.0], [10.0, 10.0]])
    img = scatter(xy, np.array([0, 1]), alpha=1.0)
    flat = img.reshape(-1, 3)
    colors = {tuple(c) for c in flat[(flat < 250).any(axis=1)]}
    assert (31, 119, 180) in colors and (255, 127, 14) in colors


def test_canvas_text_renders_known_glyph():
    cv = Canvas(20, 12)
    cv.text(1, 1, "1")
    ink = (cv.img < 250).any(axis=2)
    assert ink.sum() == sum(bin(b).count("1") for b in (4, 12, 4, 4, 4, 4, 14))


def test_tsne_separates_blobs_and_is_deterministic():
    rng = np.random.default_rng(1)
    centers = rng.normal(0, 5, (3, 16))
    X = np.vstack([c + rng.normal(0, 0.4, (60, 16)) for c in centers])
    lab = np.repeat([0, 1, 2], 60)
    Y = tsne(X, 2, seed=0, n_iter=300)
    d = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    purity = (lab[d.argmin(1)] == lab).mean()
    assert purity >= 0.95
    Y2 = tsne(X, 2, seed=0, n_iter=300)
    assert np.array_equal(Y, Y2)


def test_tsne_degenerate_inputs():
    assert tsne(np.zeros((0, 4))).shape == (0, 2)
    assert tsne(np.ones((1, 4))).shape == (1, 2)
    # tiny n forces perplexity clamp; must still run
    out = tsne(np.random.default_rng(0).normal(0, 1, (5, 3)), 2, n_iter=50)
    assert out.shape == (5, 2) and np.isfinite(out).all()


def test_embedding_cluster_diagnostic_artifacts_and_separation(tmp_path):
    rng = np.random.default_rng(2)
    c0, c1 = rng.normal(0, 5, (2, 12))
    X = np.vstack(
        [c0 + rng.normal(0, 0.4, (80, 12)), c1 + rng.normal(0, 0.4, (80, 12))]
    )
    y = np.repeat([0, 1], 80)
    rep = embedding_cluster_diagnostic(X, y, str(tmp_path), seed=0, n_iter=250)
    # one KMeans cluster must capture the positives (reference printout
    # semantics: per-cluster F1 vs the labels)
    best_f1 = max(rep["cluster0"]["f1"], rep["cluster1"]["f1"])
    assert best_f1 >= 0.95
    assert os.path.exists(tmp_path / "scatter_TSNE2d.png")
    png = decode_png(open(tmp_path / "scatter_TSNE2d.png", "rb").read())
    assert png.shape == (480, 640, 3)
    txt = open(tmp_path / "tsne_report.txt").read()
    assert "Cluster 0: F1" in txt and "Cluster 1: F1" in txt


def test_embedding_cluster_diagnostic_samples_to_cap(tmp_path):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (150, 8))
    y = (rng.random(150) > 0.5).astype(int)
    rep = embedding_cluster_diagnostic(
        X, y, str(tmp_path), max_points=40, seed=0, n_iter=60
    )
    assert rep["n"] == 40 and rep["xy"].shape == (40, 2)


def test_clustering_report_writes_real_histogram_png(tmp_path):
    from ertransfer_ray.pipelines.tuning import write_clustering_report

    preds = pd.DataFrame(
        {
            "left_url": [f"a{i}" for i in range(6)],
            "right_url": [f"b{i}" for i in range(6)],
            "prob": [0.1, 0.2, 0.6, 0.9, 0.95, 0.97],
            "label": [0, 0, 1, 1, 1, 1],
        }
    )
    write_clustering_report(preds, "dX", str(tmp_path), default=True)
    p = tmp_path / "dX_histogram.png"
    assert p.exists()
    img = decode_png(open(p, "rb").read())
    assert img.shape[2] == 3 and (img < 250).any()
