import numpy as np
import pandas as pd
import ray.data as rd

from ertransfer_ray.stages.windows import (
    global_histogram,
    kl_divergence,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)


def _events():
    ts = pd.to_datetime(
        [
            "2024-01-01 00:05",
            "2024-01-01 00:50",
            "2024-01-01 01:10",
            "2024-01-01 03:00",
            "2024-01-01 03:10",
        ]
    )
    return rd.from_pandas(
        pd.DataFrame(
            {"ts": ts, "event_type": ["a", "a", "a", "b", "b"],
             "user_id": [1, 1, 1, 2, 2], "value": [1.0, 2.0, 3.0, 4.0, 5.0]}
        )
    )


def test_tumbling():
    out = tumbling_window_agg(_events()).to_pandas().sort_values(
        ["event_type", "window_start"], ignore_index=True
    )
    assert out["n_events"].tolist() == [2, 1, 2]
    assert out["sum_value"].tolist() == [3.0, 3.0, 9.0]


def test_sessionize_gap():
    out = sessionize(_events(), gap="30min").to_pandas().sort_values(
        ["user_id", "session_start"], ignore_index=True
    )
    # user 1: 00:05 | 00:50-01:10 (gap 45min breaks, 20min keeps); user 2: one session
    assert len(out) == 3
    u1 = out[out["user_id"] == 1]
    assert u1["n_events"].tolist() == [1, 2]
    u2 = out[out["user_id"] == 2]
    assert u2["n_events"].tolist() == [2]


def test_sliding_window():
    out = sliding_window_agg(_events(), key_col="event_type").to_pandas()
    # every event appears in exactly 2 windows (1h window, 30min slide)
    assert out["n_events"].sum() == 10


def test_histogram_and_smoothing():
    df = pd.DataFrame({"v": np.concatenate([np.zeros(10), np.ones(10) * 9.99, [10.0]])})
    ds = rd.from_pandas(df)
    h = global_histogram(ds, "v", bins=10, value_range=(0.0, 10.0))
    assert h["count"].sum() == 21
    assert h["count"].iloc[0] == 10
    assert h["count"].iloc[9] == 11  # right edge inclusive, np.histogram semantics
    hs = global_histogram(ds, "v", bins=10, value_range=(0.0, 10.0), smoothing="LS")
    assert (hs["density"] > 0).all()
    assert abs(hs["density"].sum() - 1.0) < 1e-9


def test_kl_divergence():
    p = np.array([0.5, 0.5, 0.0])
    assert kl_divergence(p, p) < 1e-12
    q = np.array([0.9, 0.05, 0.05])
    assert kl_divergence(p, q) > 0.1


def test_grouped_quantiles_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ertransfer_ray.stages.windows import grouped_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "v": rng.normal(0, 10, 500),
    })
    got = (
        grouped_quantiles(rd.from_pandas(df), "k", "v", qs=(0.5, 0.9, 0.99))
        .to_pandas().sort_values("k", ignore_index=True)
    )
    want = df.groupby("k")["v"].quantile([0.5, 0.9, 0.99]).unstack()
    for q, c in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
        np.testing.assert_allclose(
            got[c].to_numpy(), want[q].to_numpy(), rtol=1e-12
        )


def test_grouped_approx_quantiles_rank_bracketing_and_layouts():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ertransfer_ray.stages.windows import grouped_approx_quantiles

    rng = np.random.default_rng(31)
    n = 6000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=n),
            "v": rng.normal(0, 100, size=n),
        }
    )
    df.loc[df.index[:50], "v"] = np.nan        # nulls excluded
    df.loc[df["k"] == "c", "v"] = 7.0          # constant group
    bins = 512
    outs = []
    for parts in (2, 9):
        ds = rd.from_pandas(df).repartition(parts)
        out = (
            grouped_approx_quantiles(ds, "k", "v", qs=(0.5, 0.9), bins=bins)
            .to_pandas().sort_values("k", ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # layout-invariant

    got = outs[0].set_index("k")
    clean = df.dropna(subset=["v"])
    for k, g in clean.groupby("k"):
        lo, hi = g["v"].min(), g["v"].max()
        width = (hi - lo) / bins if hi > lo else 0.0
        assert got.loc[k, "n"] == len(g)
        for q, col in ((0.5, "q50_approx"), (0.9, "q90_approx")):
            est = got.loc[k, col]
            # rank bracketing: the order statistic at floor(q*(n-1)) lies
            # in [est, est + width]
            true = np.sort(g["v"].to_numpy())[int(np.floor(q * (len(g) - 1)))]
            assert est - 1e-9 <= true <= est + width + 1e-9, (k, q)
    assert got.loc["c", "q50_approx"] == 7.0 and got.loc["c", "q90_approx"] == 7.0
