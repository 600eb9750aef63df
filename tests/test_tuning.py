"""A7/S11 conformance: reference clustering-metric formulas, the 10-run
tune protocol's determinism and statistics, and the report byte format
(/root/reference/clustering/Probabilities/clustering.py:70-102,
entrypoint.py:81-106)."""

import os

import numpy as np
import pandas as pd

from ertransfer_ray.pipelines.tuning import (
    exact_clusters,
    format_clustering_report,
    probability_histogram,
    stratified_tune_split,
    tune_sim_threshold,
    unique_mapping_clusters,
    write_clustering_report,
)


def _preds():
    return pd.DataFrame(
        {
            "left_url": ["a1", "a2", "a2", "c1", "d1"],
            "right_url": ["b1", "b1", "b2", "c2", "d2"],
            "prob": [0.95, 0.90, 0.80, 0.40, 0.30],
            "label": [1, 0, 1, 0, 1],
        }
    )


def test_unique_mapping_metrics_hand_computed():
    f1, p, r, ct = unique_mapping_clusters(_preds(), sim_threshold=0.5)
    # greedy: a1-b1 accepted, a2-b1 blocked (b1 used), a2-b2 accepted,
    # stop below 0.5 → candidates=2, TP=2, GT=3 → F1 = 2·2/(2+3)
    assert f1 == 2 * 2 / (2 + 3)
    assert p == 1.0
    assert r == 2 / 3
    assert ct >= 0


def test_exact_clusters_metrics_hand_computed():
    f1, p, r, ct = exact_clusters(_preds(), sim_threshold=0.5)
    # a2's top-1 is b1 (0.90>0.80) but b1's top-1 is a1 → only (a1,b1)
    # survives the reciprocal intersection: candidates=1, TP=1, GT=3
    assert f1 == 2 * 1 / (1 + 3)
    assert p == 1.0
    assert r == 1 / 3


def test_exact_clusters_threshold_is_strict():
    df = pd.DataFrame(
        {"left_url": ["a"], "right_url": ["b"], "prob": [0.5], "label": [1]}
    )
    f1, *_ = exact_clusters(df, sim_threshold=0.5)
    assert f1 == 0.0  # prob > θ strict, reference clustering.py:14
    f1u, *_ = unique_mapping_clusters(df, sim_threshold=0.5)
    assert f1u == 1.0  # greedy breaks only on prob < θ, clustering.py:49


def _big_preds(n=200, seed=1):
    rng = np.random.default_rng(seed)
    lab = (rng.random(n) < 0.3).astype(int)
    prob = np.clip(0.55 * lab + rng.random(n) * 0.45, 0, 1)
    return pd.DataFrame(
        {
            "left_url": [f"a{i}" for i in range(n)],
            "right_url": [f"b{i}" for i in range(n)],
            "prob": prob,
            "label": lab,
        }
    )


def test_stratified_tune_split_exact_counts_and_determinism():
    df = _big_preds()
    tune, rest = stratified_tune_split(df, 0.2, seed=7, run_id=0)
    assert len(tune) + len(rest) == len(df)
    for lab in (0, 1):
        n = (df["label"] == lab).sum()
        assert (tune["label"] == lab).sum() == int(round(0.2 * n))
    t2, _ = stratified_tune_split(df, 0.2, seed=7, run_id=0)
    assert tune.equals(t2)
    t3, _ = stratified_tune_split(df, 0.2, seed=7, run_id=1)
    assert not tune.equals(t3)  # runs resample, like the reference's 10 draws


def test_tune_protocol_statistics_and_determinism():
    df = _big_preds()
    res = tune_sim_threshold(df, method="unique", num_runs=3, seed=11)
    assert len(res["runs"]) == 3
    np.testing.assert_allclose(
        res["mean"],
        res["runs"][["f1", "tune_time", "cluster_time"]].mean().to_numpy(),
    )
    np.testing.assert_allclose(
        res["std"],
        res["runs"][["f1", "tune_time", "cluster_time"]].std(ddof=1).to_numpy(),
    )
    res2 = tune_sim_threshold(df, method="unique", num_runs=3, seed=11)
    assert res["best_theta"] == res2["best_theta"]
    assert res["runs"]["f1"].tolist() == res2["runs"]["f1"].tolist()
    # tuned θ separates the synthetic positives (prob ≥ 0.55 iff label=1
    # plus noise) decently
    assert res["mean"][0] > 0.6


def test_report_byte_format():
    results = {
        "unique": {
            "best": [0.8, 1.0, 0.5, 0.01],
            "best_theta": 0.42,
            "tune_time": 0.2,
            "runs": None,
            "mean": [0.8, 0.2, 0.01],
            "std": [0.0, 0.0, 0.0],
        },
        "exact": {
            "best": [0.5, 1.0, 0.25, 0.02],
            "best_theta": 0.5,
            "tune_time": 0,
            "runs": None,
            "mean": [0.5, 0, 0.02],
            "std": [0, 0, 0],
        },
    }
    expected = (
        "Unique Mapping Clustering\n"
        "F1\tP\tR\tCluster Time\tTune Time\tThreshold\n"
        "0.8\t1.0\t0.5\t0.01\t0.2\t0.42\n"
        "Average F1 +- STD: 0.8\t0.0\n"
        "Average Tune Time +- STD: 0.2\t0.0\n"
        "Average Cluster Time +- STD: 0.01\t0.0\n"
        "Exact Clustering\n"
        "F1\tP\tR\tCluster Time\tTune Time\tThreshold\n"
        "0.5\t1.0\t0.25\t0.02\t0\t0.5\n"
        "Average F1 +- STD: 0.5\t0\n"
        "Average Tune Time +- STD: 0\t0\n"
        "Average Cluster Time +- STD: 0.02\t0\n"
    )
    assert format_clustering_report(results) == expected


def test_write_clustering_report_artifacts(tmp_path):
    out = str(tmp_path)
    res = write_clustering_report(
        _preds(), "d99", out, default=True
    )
    report = open(os.path.join(out, "d99_clustering.txt")).read()
    assert report.startswith("Unique Mapping Clustering\n")
    assert "Exact Clustering" in report
    assert "Average F1 +- STD: 0.8\t0" in report  # hand-computed above
    hist = pd.read_csv(os.path.join(out, "d99_histogram.txt"), sep="\t")
    assert len(hist) == 100
    assert hist["count_1"].sum() == 3 and hist["count_0"].sum() == 2
    assert res["unique"]["mean"][0] == 0.8


def test_probability_histogram_bins():
    h = probability_histogram(_preds())
    # bin edges are the reference's np.arange grid (inexact floats), so
    # locate bins by proximity rather than exact edge equality
    lo = h["bin_lo"].to_numpy()
    assert h["count_1"].to_numpy()[np.abs(lo - 0.95).argmin() - 1 :][:2].sum() == 1
    assert h["count_0"].to_numpy()[np.abs(lo - 0.90).argmin() - 1 :][:2].sum() == 1
