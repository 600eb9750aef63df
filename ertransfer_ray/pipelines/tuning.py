"""A7 + S11: the reference's clustering threshold-tuning protocol and its
report artifact.

Reference protocol (/root/reference/clustering/Probabilities/clustering.py:70-102,
driven at entrypoint.py:71-106): for each of ``num_runs`` repetitions draw a
20 % label-stratified tune sample, sweep θ ∈ [0, 1) step 0.01 on it, apply
the argmax-F1 θ to the remaining 80 %, and report mean ± std (ddof=1) of
final F1 / summed tune time / apply-time across repetitions, for BOTH
clustering methods (Unique Mapping = D5 greedy, Exact = D4 reciprocal
top-1). The report file ``<ds>_clustering.txt`` (entrypoint.py:81-106) plus
a probability histogram (entrypoint.py:10-30, 108) are the S11 artifacts.

Differences by design (SURVEY §7.4 determinism rule): the reference's
``train_test_split`` draw is unseeded — every invocation differs. Here the
tune sample is a pure function of (pair key, seed, run_id): per label
stratum, rows are ranked by stable hash and the smallest ``tune_frac``
fraction is the tune set, so two runs at any parallelism produce identical
reports.

Metric formulas are the reference's clustering metrics verbatim
(clustering.py:31-40): F1 = 2·TP/(candidates+GT), P = TP/candidates,
R = TP/GT — with a zero guard the reference lacks.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from ..functions.hashing import stable_hash64
from ..stages.clustering import greedy_unique_mapping

THETA_GRID = np.arange(0.0, 1.0, 0.01)


def _metrics(selected: pd.DataFrame, data: pd.DataFrame) -> tuple[float, float, float]:
    num_candidates = len(selected)
    tp = int(selected["label"].sum()) if num_candidates else 0
    gt = int(data["label"].sum())
    f1 = 2 * tp / (num_candidates + gt) if (num_candidates + gt) else 0.0
    p = tp / num_candidates if num_candidates else 0.0
    r = tp / gt if gt else 0.0
    return f1, p, r


def unique_mapping_clusters(data: pd.DataFrame, sim_threshold: float = 0.7):
    """D5 greedy 1:1 matching + the reference's clustering metrics.
    Returns (F1, P, R, cluster_time) like clustering.py:42-67."""
    t0 = time.process_time()
    sel_pairs = greedy_unique_mapping(data, theta=sim_threshold)
    key = set(zip(sel_pairs["left_url"], sel_pairs["right_url"]))
    selected = data[
        [(a, b) in key for a, b in zip(data["left_url"], data["right_url"])]
    ]
    f1, p, r = _metrics(selected, data)
    return f1, p, r, time.process_time() - t0


def exact_clusters(data: pd.DataFrame, sim_threshold: float = 0.7, limit: int = 1):
    """D4 reciprocal top-``limit`` intersection + metrics
    (clustering.py:7-40). Vectorized: one sort, two groupby-heads, an inner
    merge — not the reference's per-id Python loop. Ties broken by the
    partner key for determinism (the reference inherits sort stability)."""
    t0 = time.process_time()
    above = data[data["prob"] > sim_threshold]
    srt = above.sort_values(
        ["prob", "left_url", "right_url"], ascending=[False, True, True]
    )
    top_a = srt.groupby("left_url", sort=False).head(limit)[["left_url", "right_url"]]
    top_b = srt.groupby("right_url", sort=False).head(limit)[["left_url", "right_url"]]
    both = top_a.merge(top_b, on=["left_url", "right_url"])
    key = set(zip(both["left_url"], both["right_url"]))
    selected = data[
        [(a, b) in key for a, b in zip(data["left_url"], data["right_url"])]
    ]
    f1, p, r = _metrics(selected, data)
    return f1, p, r, time.process_time() - t0


CLUSTER_METHODS = {
    "unique": unique_mapping_clusters,
    "exact": exact_clusters,
}


def stratified_tune_split(
    data: pd.DataFrame, tune_frac: float, seed: int, run_id: int
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic stratified split: per label stratum, rank rows by
    stable_hash(pair_key, seed, run_id) and take the smallest ``tune_frac``
    fraction as the tune set (the reference's unseeded
    ``train_test_split(train_size=0.2, stratify=label)``,
    clustering.py:77)."""
    key = (
        data["left_url"].astype(str)
        + "|"
        + data["right_url"].astype(str)
        + f"|{seed}|{run_id}"
    ).to_numpy(dtype=object)
    h = stable_hash64(key)
    tune_mask = np.zeros(len(data), dtype=bool)
    labels = data["label"].to_numpy()
    for lab in np.unique(labels):
        idx = np.nonzero(labels == lab)[0]
        n_tune = int(round(tune_frac * len(idx)))
        order = idx[np.argsort(h[idx], kind="stable")]
        tune_mask[order[:n_tune]] = True
    return data[tune_mask], data[~tune_mask]


def tune_sim_threshold(
    data: pd.DataFrame,
    method: str = "unique",
    num_runs: int = 10,
    tune_frac: float = 0.2,
    thetas: np.ndarray | None = None,
    seed: int = 42,
) -> dict:
    """The reference's full tuning loop (clustering.py:70-102): per run,
    sweep θ on a stratified tune sample, apply argmax-F1 θ to the rest,
    collect (final F1, summed tune time, apply cluster time); report
    mean ± std (ddof=1, like np.std(..., ddof=1) at clustering.py:91).

    ``data`` columns: left_url, right_url, prob, label.
    Returns {"best": (F1,P,R,cluster_time) of the last run, "best_theta",
    "tune_time", "runs": DataFrame, "mean": [f1, tune, cluster],
    "std": [...]}.
    """
    cluster_method = CLUSTER_METHODS[method]
    thetas = THETA_GRID if thetas is None else thetas
    collected = []
    best_settings = None
    best_theta = float("nan")
    tune_time = 0.0
    for run_id in range(num_runs):
        tune, rest = stratified_tune_split(data, tune_frac, seed, run_id)
        y = [list(cluster_method(tune, sim_threshold=float(s))) for s in thetas]
        y = np.array(y)
        best_idx = int(np.argmax(y[:, 0]))
        best_theta = float(thetas[best_idx])
        tune_time = float(y[:, 3].sum())
        best_settings = list(cluster_method(rest, sim_threshold=best_theta))
        collected.append([best_settings[0], tune_time, best_settings[3]])
    arr = np.array(collected)
    mean = arr.mean(axis=0)
    std = arr.std(axis=0, ddof=1) if num_runs > 1 else np.zeros(3)
    runs = pd.DataFrame(arr, columns=["f1", "tune_time", "cluster_time"])
    runs.insert(0, "run", np.arange(num_runs))
    return {
        "best": best_settings,
        "best_theta": best_theta,
        "tune_time": tune_time,
        "runs": runs,
        "mean": mean.tolist(),
        "std": std.tolist(),
    }


# ---------------------------------------------------------------------------
# S11 report artifacts
# ---------------------------------------------------------------------------

_METHOD_TITLES = {
    "unique": "Unique Mapping Clustering",
    "exact": "Exact Clustering",
}


def format_clustering_report(results: dict[str, dict]) -> str:
    """Byte format of ``<ds>_clustering.txt``
    (/root/reference/clustering/Probabilities/entrypoint.py:81-106): per
    method a title line, a tab-separated header, the last run's
    F1/P/R/cluster-time + tune-time + threshold row, then the three
    mean ± std lines."""
    lines: list[str] = []
    for method, res in results.items():
        lines.append(_METHOD_TITLES.get(method, method))
        lines.append("\t".join(["F1", "P", "R", "Cluster Time", "Tune Time", "Threshold"]))
        row = list(res["best"]) + [res["tune_time"], res["best_theta"]]
        lines.append("\t".join(str(v) for v in row))
        mean, std = res["mean"], res["std"]
        lines.append(f"Average F1 +- STD: {mean[0]}\t{std[0]}")
        lines.append(f"Average Tune Time +- STD: {mean[1]}\t{std[1]}")
        lines.append(f"Average Cluster Time +- STD: {mean[2]}\t{std[2]}")
    return "\n".join(lines) + "\n"


def probability_histogram(
    data: pd.DataFrame, bin_width: float = 0.01
) -> pd.DataFrame:
    """Per-label probability histogram, the reference's plot data
    (entrypoint.py:10-30): bins [0, 1] step 0.01, one count column per
    label. Rendered as a table AND a real PNG (functions/plot.py)."""
    bins = np.arange(0.0, 1.0 + bin_width, bin_width)
    out = {"bin_lo": bins[:-1]}
    for lab in (0, 1):
        x = data.loc[data["label"] == lab, "prob"].to_numpy()
        out[f"count_{lab}"], _ = np.histogram(x, bins=bins)
    return pd.DataFrame(out)


def write_clustering_report(
    predictions_df: pd.DataFrame,
    ds_name: str,
    out_dir: str,
    default: bool = False,
    num_runs: int = 10,
    seed: int = 42,
) -> dict:
    """The S11 step: tune (or apply θ=0.5 in ``default`` mode, mirroring
    entrypoint.py:71-76/89-94) both clustering methods, write
    ``<ds>_clustering.txt`` + ``<ds>_histogram.txt`` + a real
    ``<ds>_histogram.png`` (rendered by functions/plot.py over the repo's
    own PNG encoder — no matplotlib needed). Returns the per-method
    results dict."""
    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, dict] = {}
    for method in ("unique", "exact"):
        if default:
            best = list(CLUSTER_METHODS[method](predictions_df, sim_threshold=0.5))
            results[method] = {
                "best": best,
                "best_theta": 0.5,
                "tune_time": 0,
                "runs": None,
                "mean": [best[0], 0, best[3]],
                "std": [0, 0, 0],
            }
        else:
            results[method] = tune_sim_threshold(
                predictions_df, method=method, num_runs=num_runs, seed=seed
            )
    with open(os.path.join(out_dir, f"{ds_name}_clustering.txt"), "w") as f:
        f.write(format_clustering_report(results))
    hist = probability_histogram(predictions_df)
    hist.to_csv(
        os.path.join(out_dir, f"{ds_name}_histogram.txt"), sep="\t", index=False
    )
    # PNG artifact (entrypoint.py:108 plot_histogram): rendered by the
    # repo's own raster plotter + PNG encoder (functions/plot.py) — real,
    # deterministic bytes with no matplotlib dependency. Same shape as the
    # reference's figure: per-label translucent bars on a log y axis.
    from ..functions.plot import bar_chart, save_png

    img = bar_chart(
        hist["bin_lo"].to_numpy(),
        {"0": hist["count_0"].to_numpy(), "1": hist["count_1"].to_numpy()},
        bin_width=0.01,
        log_y=True,
    )
    save_png(os.path.join(out_dir, f"{ds_name}_histogram.png"), img)
    return results
