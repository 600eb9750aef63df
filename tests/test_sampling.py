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


def test_approx_quantile_rank_bracketing():
    """The estimate separates the sorted data at the right rank: it lies
    within one bin width of the closed interval between the two order
    statistics bracketing the continuous rank q*(n-1)."""
    from ertransfer_ray.stages.sampling import approx_quantile

    t = _docs(5000)
    ds = rd.from_arrow(t).repartition(7)
    v = np.sort(t.column("score").to_numpy())
    binw = (v[-1] - v[0]) / 4096
    for q in (0.1, 0.5, 0.9, 0.99):
        approx = approx_quantile(ds, "score", q, bins=4096)
        r = q * (len(v) - 1)
        lo_stat = v[int(np.floor(r))]
        hi_stat = v[min(int(np.ceil(r)), len(v) - 1)]
        assert lo_stat - binw <= approx <= hi_stat + binw, (q, approx)


def test_filter_by_quantile_approx_matches_exact_within_band():
    """The approx arm's selection differs from exact only by rows whose
    value sits within one bin width of the exact threshold."""
    t = _docs(3000)
    ds = rd.from_arrow(t).repartition(5)
    exact = filter_by_quantile(ds, "score", 0.9, keep="above").to_pandas()
    approx = filter_by_quantile(
        ds, "score", 0.9, keep="above", method="approx", bins=1 << 20
    ).to_pandas()
    from ertransfer_ray.stages.sampling import approx_quantile

    v = t.column("score").to_numpy()
    t_exact = np.quantile(v, 0.9)
    t_approx = approx_quantile(ds, "score", 0.9, bins=1 << 20)
    binw = (v.max() - v.min()) / (1 << 20)
    band = (min(t_exact, t_approx) - binw, max(t_exact, t_approx) + binw)
    diff = set(exact["doc_id"]) ^ set(approx["doc_id"])
    scores = dict(zip(t.column("doc_id").to_pylist(), v))
    assert len(diff) <= 2 and all(
        band[0] <= scores[d] <= band[1] for d in diff
    ), (diff, band)


def test_approx_quantile_constant_and_empty():
    from ertransfer_ray.stages.sampling import approx_quantile

    const = rd.from_arrow(
        pa.table({"score": pa.array(np.full(100, 3.5))})
    )
    assert approx_quantile(const, "score", 0.7) == 3.5
    empty = rd.from_arrow(pa.table({"score": pa.array([], pa.float64())}))
    assert approx_quantile(empty, "score", 0.5) is None


def test_consistent_sample_k():
    from ertransfer_ray.stages.sampling import _mix_hash, consistent_sample_k

    t = _docs(4000)
    ds = rd.from_arrow(t).repartition(9)
    got = consistent_sample_k(ds, 50).to_pandas().sort_values("doc_id")
    # reference: global bottom-50 by the same hash
    ids = t.column("doc_id").to_numpy()
    h = _mix_hash(ids)
    want = sorted(ids[np.lexsort((ids, h))[:50]])
    assert list(got["doc_id"]) == want
    # bottom-k consistency: any full-corpus winner that lives in the
    # first half must also win in the half-corpus sample (removing rows
    # can only ADD winners, never displace surviving ones)
    half = rd.from_arrow(t.slice(0, 2000)).repartition(4)
    got_half = set(consistent_sample_k(half, 50).to_pandas()["doc_id"])
    assert {d for d in want if d < 2000} <= got_half


def test_temperature_rates_formula_and_validation():
    import numpy as np
    import pytest

    from ertransfer_ray.stages.sampling import temperature_rates

    counts = {"en": 400, "fr": 100, "de": 100}
    # tau=1 keeps the natural mixture; tau=0 flattens to equal volume
    assert temperature_rates(counts, 1.0) == {"en": 1.0, "fr": 1.0, "de": 1.0}
    flat = temperature_rates(counts, 0.0)
    assert flat["fr"] == flat["de"] == 1.0 and abs(flat["en"] - 0.25) < 1e-9
    half = temperature_rates(counts, 0.5)
    assert abs(half["en"] - np.floor(0.5 * 1000 + 0.5) / 1000) < 1e-12
    with pytest.raises(ValueError):
        temperature_rates(counts, 1.5)
    with pytest.raises(ValueError):
        temperature_rates({"a": 0}, 0.5)
    assert temperature_rates({}, 0.5) == {}


def test_temperature_sample_downsamples_toward_flat():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ertransfer_ray.stages.sampling import temperature_sample

    rng = np.random.default_rng(5)
    n_big, n_small = 4000, 250
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_big + n_small, dtype=np.int64),
            "source": ["big"] * n_big + ["small"] * n_small,
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out, rates = temperature_sample(ds, temperature=0.5, mod=1000)
    got = out.to_pandas()
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 0.25) < 1e-9  # sqrt(250/4000)=0.25
    # the small source survives whole; the big one lands near its rate
    assert (got["source"] == "small").sum() == n_small
    kept_big = (got["source"] == "big").sum()
    assert abs(kept_big / n_big - 0.25) < 0.03
    # deterministic across parallelism
    out2, _ = temperature_sample(rd.from_pandas(df).repartition(13),
                                 temperature=0.5, mod=1000)
    assert sorted(out2.to_pandas()["doc_id"]) == sorted(got["doc_id"])


def test_weighted_sample_k_matches_bruteforce_and_biases_heavy_rows():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ertransfer_ray.stages.sampling import _mix_hash, weighted_sample_k

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 2 == 0, 100, 1).astype(np.int64)  # heavy evens
    w[5] = 0  # never sampled
    df = pd.DataFrame({"doc_id": ids, "token_count": w})

    # brute force: same key formula, global top-k
    u = (_mix_hash(ids).astype(np.float64) + 0.5) / 4294967296.0
    key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1), -np.inf)
    order = np.lexsort((ids, -key))[:150]
    want = set(ids[order])

    for parts in (1, 6):
        ds = rd.from_pandas(df).repartition(parts)
        got = weighted_sample_k(ds, 150, "token_count").to_pandas()
        assert set(got["doc_id"]) == want, parts
    assert 5 not in want
    # heavy rows dominate the sample
    heavy = sum(1 for i in want if i % 2 == 0)
    assert heavy > 120

    with pytest.raises(ValueError):
        weighted_sample_k(rd.from_pandas(df), 0, "token_count")
    # all-zero weights: empty sample, schema preserved
    zero = df.assign(token_count=0)
    out = weighted_sample_k(rd.from_pandas(zero), 10, "token_count")
    assert out.count() == 0
