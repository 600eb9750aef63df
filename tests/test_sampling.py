"""Corpus mixing (rate_sample) + global-quantile filtering: determinism
across parallelism, rate accuracy, above/below complement, empty edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.stages.sampling import _mix_hash, filter_by_quantile, rate_sample


def _docs(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{int(v)}" for v in rng.integers(0, 4, n)]),
            "score": pa.array(rng.normal(size=n)),
        }
    )


def test_rate_sample_is_parallelism_independent_and_pure():
    t = _docs()
    rates = {"s0": 0.25, "s1": 0.5, "s2": 0.0}
    kept = [
        set(
            rate_sample(
                rd.from_arrow(t).repartition(p), rates, key_col="source"
            )
            .to_pandas()["doc_id"]
        )
        for p in (1, 7)
    ]
    assert kept[0] == kept[1]
    # pure function of (id, key): brute-force the rule
    ids = t.column("doc_id").to_numpy()
    srcs = t.column("source").to_pylist()
    th = {"s0": 25, "s1": 50, "s2": 0}
    want = {
        int(i)
        for i, s in zip(ids, srcs)
        if int(_mix_hash(np.array([i]))[0] % 100) < th.get(s, 100)
    }
    assert kept[0] == want


def test_rate_sample_rates_are_approximately_honored():
    t = _docs(8000)
    out = rate_sample(
        rd.from_arrow(t), {"s0": 0.2, "s1": 1.0, "s2": 0.0}, key_col="source"
    ).to_pandas()
    base = pd.Series(t.column("source").to_pylist()).value_counts()
    got = out["source"].value_counts()
    assert "s2" not in got.index                      # 0 % drops everything
    assert got["s1"] == base["s1"]                    # 100 % keeps everything
    assert abs(got["s0"] / base["s0"] - 0.2) < 0.05   # hash-uniform ≈ 20 %
    assert got.get("s3", 0) == base["s3"]             # default rate 1.0


def test_filter_by_quantile_above_below_partition():
    t = _docs(3000)
    ds = rd.from_arrow(t).repartition(5)
    above = filter_by_quantile(ds, "score", 0.75, keep="above").to_pandas()
    below = filter_by_quantile(ds, "score", 0.75, keep="below").to_pandas()
    assert len(above) + len(below) == t.num_rows
    assert set(above["doc_id"]).isdisjoint(set(below["doc_id"]))
    thresh = np.quantile(t.column("score").to_numpy(), 0.75)
    assert (above["score"].to_numpy() > thresh).all()
    assert (below["score"].to_numpy() <= thresh).all()
    # ~25 % above (continuous scores: no ties at the threshold)
    assert abs(len(above) / t.num_rows - 0.25) < 0.01


def test_empty_corpus_edges():
    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            }
        )
    )
    assert len(rate_sample(empty, {"s0": 0.5}, key_col="source").to_pandas()) == 0
    assert len(filter_by_quantile(empty, "score", 0.5).to_pandas()) == 0
