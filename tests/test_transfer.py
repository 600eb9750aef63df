import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.pipelines.transfer import (
    pairwise_kl_matrix,
    select_transfer_source,
    write_kl_report,
)


def _ds(values: np.ndarray):
    return rd.from_arrow(pa.table({"sim": pa.array(values, pa.float64())}))


def _dists():
    rng = np.random.default_rng(42)
    target = rng.normal(0.62, 0.05, 4000).clip(0, 1)
    close = rng.normal(0.60, 0.05, 4000).clip(0, 1)   # near-identical shape
    far = rng.normal(0.20, 0.10, 4000).clip(0, 1)     # very different
    mid = rng.normal(0.45, 0.08, 4000).clip(0, 1)
    return target, {"close": close, "far": far, "mid": mid}


def test_select_transfer_source_picks_known_closest():
    target, sources = _dists()
    best, scores = select_transfer_source(
        _ds(target), {n: _ds(v) for n, v in sources.items()}, "sim"
    )
    assert best == "close"
    by = dict(zip(scores["source"], scores["kl_divergence"]))
    assert by["close"] < by["mid"] < by["far"]


def _reference_kl(sims_i, sims_j, smoothing="LS", bins=100, e=1e-12):
    """Driver-local transcription of the reference's loop body
    (methods/embeddings/entrypoint.py:238-264) as the oracle."""
    lo = min(sims_i.min(), sims_j.min())
    hi = max(sims_i.max(), sims_j.max())
    out = []
    for s in (sims_i, sims_j):
        d, _ = np.histogram(s, bins=bins, range=(lo, hi))
        d = d.astype(float)
        if smoothing == "LS":
            d = d + 0.005 * d.sum() / bins
        d = d / d.sum()
        if smoothing == "FM":
            d[d < e] = e
        out.append(d)
    p, q = out
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def test_matrix_matches_reference_arithmetic():
    target, sources = _dists()
    data = {"target": target, **sources}
    mat = pairwise_kl_matrix({n: _ds(v) for n, v in data.items()}, "sim")
    for _, r in mat.iterrows():
        want = _reference_kl(data[r["dataset_1"]], data[r["dataset_2"]])
        assert abs(r["kl_divergence"] - want) < 1e-9, (r["dataset_1"], r["dataset_2"])
    # diagonal is zero under LS smoothing
    diag = mat[mat["dataset_1"] == mat["dataset_2"]]["kl_divergence"]
    assert (diag.abs() < 1e-12).all()


def test_fm_smoothing_and_report_format(tmp_path):
    target, sources = _dists()
    data = {"a": target, "b": sources["far"]}
    mat = pairwise_kl_matrix({n: _ds(v) for n, v in data.items()}, "sim",
                             smoothing="FM")
    for _, r in mat.iterrows():
        want = _reference_kl(data[r["dataset_1"]], data[r["dataset_2"]],
                             smoothing="FM")
        # scipy entropy (and _kl) renormalize after the FM clamp; the local
        # transcription doesn't — agree to relative 1e-9
        assert abs(r["kl_divergence"] - want) < 1e-9 * max(1.0, abs(want))
    path = write_kl_report(str(tmp_path / "kl.txt"), mat)
    lines = open(path).read().splitlines()
    assert lines[0] == "Dataset 1\tDataset 2\tKL Divergence"
    assert len(lines) == 1 + len(mat)
    first = lines[1].split("\t")
    assert first[:2] == ["a", "a"] and float(first[2]) == 0.0
