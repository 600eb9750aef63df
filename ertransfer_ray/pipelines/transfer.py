"""Transfer-source selection (A4 + A5 composed).

The reference's headline "transfer" trick: per dataset, take the
distribution of pair-embedding cosine similarities, histogram every ordered
dataset pair over their SHARED value range (100 bins), smooth (``LS``:
add 0.005·N/bins to every bin before normalizing, or ``FM``: clamp the
normalized density at 1e-12), and compute the pairwise KL-divergence matrix
``entropy(dist_i, dist_j)``; the closest labeled source for an unlabeled
target is the row-minimal source (/root/reference/methods/embeddings/
entrypoint.py:229-270, KL-Divergence_LS_DA.txt writer included).

Engine shape: each min/max and each histogram is ONE streaming
``map_batches`` pass with a driver-side reduce of ``bins`` counters
(windows.global_histogram) — no shuffle, no materialization, so a "dataset"
here can be 100 TB. Because the reference defines bins over the PAIRWISE
shared range, each ordered pair needs its own histogram pass: the full
matrix over N datasets costs N min/max scans + 2·N·(N-1) histogram scans,
and plain source selection costs 2·|sources| scans over the target +1 per
source. N is dataset count (~12 in the reference), not data size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.groupby import partial_aggregate
from ..stages.windows import arrow_min_max, global_histogram

EPS = 1e-12


def _min_max(ds, value_col: str) -> tuple[float, float]:
    lo, hi, _ = arrow_min_max(ds, value_col)
    return float(lo), float(hi)


def _smoothed_density(counts: np.ndarray, smoothing: str | None) -> np.ndarray:
    """The reference's exact smoothing arithmetic (entrypoint.py:247-260):
    LS adds 0.005·total/bins to every bin BEFORE normalizing; FM clamps the
    normalized density at 1e-12 AFTER."""
    c = counts.astype(np.float64)
    if smoothing == "LS":
        c = c + 0.005 * c.sum() / len(c)
    s = c.sum()
    d = c / s if s else c
    if smoothing == "FM":
        d[d < EPS] = EPS
    return d


def _kl(p: np.ndarray, q: np.ndarray) -> float:
    """scipy.stats.entropy(p, q) semantics: normalize both, sum p·log(p/q)
    over p>0, +inf where q=0 under p>0 (the reference relies on smoothing to
    avoid that, and so do we — no silent extra clamping here)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    p = p / p.sum() if p.sum() else p
    q = q / q.sum() if q.sum() else q
    mask = p > 0
    if np.any(q[mask] == 0):
        return float("inf")
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def _pair_kl(
    ds_i, ds_j, value_col: str, rng_i, rng_j, bins: int, smoothing: str | None
) -> float:
    lo = min(rng_i[0], rng_j[0])
    hi = max(rng_i[1], rng_j[1])
    hist_i = global_histogram(ds_i, value_col, bins=bins, value_range=(lo, hi))
    hist_j = global_histogram(ds_j, value_col, bins=bins, value_range=(lo, hi))
    return _kl(
        _smoothed_density(hist_i["count"].to_numpy(), smoothing),
        _smoothed_density(hist_j["count"].to_numpy(), smoothing),
    )


def pairwise_kl_matrix(
    datasets: dict[str, "object"],
    value_col: str,
    bins: int = 100,
    smoothing: str | None = "LS",
) -> pd.DataFrame:
    """The reference's full KL matrix (entrypoint.py:235-270): one row per
    (dataset_i, dataset_j) ordered pair, histograms over the pair's shared
    range. Returns a tidy frame (dataset_1, dataset_2, kl_divergence) —
    the KL-Divergence_LS_DA.txt layout."""
    names = list(datasets)
    ranges = {n: _min_max(datasets[n], value_col) for n in names}
    rows = []
    for i in names:
        for j in names:
            rows.append(
                {
                    "dataset_1": i,
                    "dataset_2": j,
                    "kl_divergence": _pair_kl(
                        datasets[i], datasets[j], value_col,
                        ranges[i], ranges[j], bins, smoothing,
                    ),
                }
            )
    return pd.DataFrame(rows)


def select_transfer_source(
    target_ds,
    candidate_sources: dict[str, "object"],
    value_col: str,
    bins: int = 100,
    smoothing: str | None = "LS",
) -> tuple[str, pd.DataFrame]:
    """Pick the labeled source whose similarity distribution is closest to
    the unlabeled target: argmin over KL(target ‖ source), each computed
    over the pair's shared range exactly as the reference's matrix row for
    the target would be. Ties break on source name for determinism.

    Returns ``(best_source_name, scores)`` where ``scores`` is a frame
    (source, kl_divergence) sorted ascending.
    """
    if not candidate_sources:
        raise ValueError("select_transfer_source: no candidate sources")
    t_rng = _min_max(target_ds, value_col)
    rows = []
    for name in sorted(candidate_sources):
        src = candidate_sources[name]
        kl = _pair_kl(
            target_ds, src, value_col, t_rng, _min_max(src, value_col),
            bins, smoothing,
        )
        rows.append({"source": name, "kl_divergence": kl})
    scores = pd.DataFrame(rows).sort_values(
        ["kl_divergence", "source"], ignore_index=True
    )
    return str(scores["source"][0]), scores


def write_kl_report(path: str, matrix: pd.DataFrame) -> str:
    """The reference's tab-separated KL report byte format
    (entrypoint.py:229-232,266-268: header 'Dataset 1\\tDataset 2\\t
    KL Divergence', one appended row per ordered pair, str(float) values)."""
    with open(path, "w") as f:
        print(*["Dataset 1", "Dataset 2", "KL Divergence"], sep="\t", file=f)
        for _, r in matrix.iterrows():
            print(*[r["dataset_1"], r["dataset_2"], r["kl_divergence"]],
                  sep="\t", file=f)
    return path
