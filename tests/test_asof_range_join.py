"""Property tests: distributed asof_join / range_join ≡ driver-side brute
force on random inputs (duplicate keys, ties, missing keys, empty sides,
null keys/times). The brute force enumerates candidates per left row — an
implementation-independent oracle (no merge_asof on the oracle side)."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ertransfer_ray.stages.joins import asof_join, range_join

_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=20
)


def _brute_asof_rid(ldf, rdf, direction, tolerance):
    """Expected matched rid per left row (None = no match): best right_on,
    ties broken by LARGEST rid — the documented tie_breakers contract."""
    out = []
    for _, l in ldf.iterrows():
        cand = rdf[rdf["rk"] == l["k"]]
        if direction == "backward":
            cand = cand[cand["rt"] <= l["t"]]
            if tolerance is not None:
                cand = cand[l["t"] - cand["rt"] <= tolerance]
            best = cand["rt"].max() if len(cand) else None
        else:
            cand = cand[cand["rt"] >= l["t"]]
            if tolerance is not None:
                cand = cand[cand["rt"] - l["t"] <= tolerance]
            best = cand["rt"].min() if len(cand) else None
        if best is None:
            out.append(None)
        else:
            out.append(int(cand[cand["rt"] == best]["rid"].max()))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    _ROWS,
    _ROWS,
    st.sampled_from(["backward", "forward"]),
    st.sampled_from(["left", "inner"]),
    st.sampled_from([None, 3]),
    st.sampled_from([None, 4]),
)
def test_asof_join_matches_bruteforce(lrows, rrows, direction, how, tolerance, band):
    if not lrows:
        return
    ldf = pd.DataFrame(
        {
            "k": np.asarray([a for a, _ in lrows], dtype=np.int64),
            "t": np.asarray([b for _, b in lrows], dtype=np.int64),
            "lid": np.arange(len(lrows), dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": np.asarray([a for a, _ in rrows], dtype=np.int64),
            "rt": np.asarray([b for _, b in rrows], dtype=np.int64),
            "rid": np.arange(len(rrows), dtype=np.int64),
        }
    )
    got = asof_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        on="t",
        by="k",
        right_on="rt",
        right_by="rk",
        how=how,
        direction=direction,
        tolerance=tolerance,
        tie_breakers=["rid"],
        band=band,  # None = plain by-key exchange; numeric = hot-key salt
        num_buckets=3,
    ).to_pandas()
    want = _brute_asof_rid(ldf, rdf, direction, tolerance)
    if how == "inner":
        want_map = {i: r for i, r in enumerate(want) if r is not None}
        assert len(got) == len(want_map)
        if len(got):
            got_map = dict(
                zip(got["lid"].astype("int64"), got["rid"].astype("int64"))
            )
            assert got_map == want_map
    else:
        assert len(got) == len(ldf)
        got = got.sort_values("lid", ignore_index=True)
        for i, exp in enumerate(want):
            cell = got.loc[got["lid"] == i, "rid"].iloc[0]
            if exp is None:
                assert pd.isna(cell)
            else:
                assert int(cell) == exp


def test_asof_join_null_keys_and_times_never_match():
    """SQL semantics: a null by-key or null on-value matches nothing —
    how='left' keeps the row unmatched, how='inner' drops it."""
    ldf = pd.DataFrame(
        {
            "k": np.array([1.0, np.nan, 1.0], dtype=np.float64),
            "t": pd.to_datetime(["2024-01-05", "2024-01-05", None]),
            "lid": np.array([0, 1, 2], dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": np.array([1.0], dtype=np.float64),
            "rt": pd.to_datetime(["2024-01-01"]),
            "rid": np.array([7], dtype=np.int64),
        }
    )
    left = asof_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        on="t",
        by="k",
        right_on="rt",
        right_by="rk",
        how="left",
        num_buckets=2,
    ).to_pandas()
    assert len(left) == 3
    by_lid = left.set_index(left["lid"].astype("int64"))
    assert int(by_lid.loc[0, "rid"]) == 7
    assert pd.isna(by_lid.loc[1, "rid"])
    assert pd.isna(by_lid.loc[2, "rid"])

    inner = asof_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        on="t",
        by="k",
        right_on="rt",
        right_by="rk",
        how="inner",
        num_buckets=2,
    ).to_pandas()
    assert list(inner["lid"].astype("int64")) == [0]


def test_asof_join_band_timestamp_parity_hot_key():
    """Banded == unbanded as-of on temporal data with one hot key carrying
    90% of rows — carry-in rows must supply matches whose order lives in an
    EARLIER band than the probing event."""
    rng = np.random.default_rng(11)
    n = 400
    base = pd.Timestamp("2024-03-01")
    ldf = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.9, 1, 2).astype(np.int64),
            "t": (base + pd.to_timedelta(rng.integers(0, 96 * 60, n), unit="m"))
            .astype("datetime64[us]"),
            "lid": np.arange(n, dtype=np.int64),
        }
    )
    m = n // 8  # sparse right side → most probes carry across bands
    rdf = pd.DataFrame(
        {
            "rk": np.where(rng.random(m) < 0.9, 1, 2).astype(np.int64),
            "rt": (base + pd.to_timedelta(rng.integers(0, 96 * 60, m), unit="m"))
            .astype("datetime64[us]"),
            "rid": np.arange(m, dtype=np.int64),
        }
    )

    def matches(band):
        got = asof_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            on="t",
            by="k",
            right_on="rt",
            right_by="rk",
            how="left",
            tie_breakers=["rid"],
            band=band,
            num_buckets=4,
        ).to_pandas()
        assert len(got) == n
        got = got.sort_values("lid", ignore_index=True)
        return [None if pd.isna(v) else int(v) for v in got["rid"]]

    plain = matches(None)
    assert sum(v is not None for v in plain) > 300  # non-trivial fixture
    assert matches(pd.Timedelta(hours=2)) == plain
    assert matches(pd.Timedelta(minutes=45)) == plain


_INTERVALS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-2, 5)),
    min_size=0,
    max_size=15,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    _ROWS,
    _INTERVALS,
    st.sampled_from(["both", "left", "right", "neither"]),
    st.sampled_from([None, 2, 7]),
)
def test_range_join_matches_bruteforce(lrows, intervals, closed, band):
    if not lrows:
        return
    ldf = pd.DataFrame(
        {
            "k": np.asarray([a for a, _ in lrows], dtype=np.int64),
            "t": np.asarray([b for _, b in lrows], dtype=np.int64),
            "lid": np.arange(len(lrows), dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": np.asarray([a for a, _, _ in intervals], dtype=np.int64),
            "lo": np.asarray([b for _, b, _ in intervals], dtype=np.int64),
            "hi": np.asarray([b + w for _, b, w in intervals], dtype=np.int64),
            "rid": np.arange(len(intervals), dtype=np.int64),
        }
    )
    got = range_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        by="k",
        right_by="rk",
        point="t",
        start="lo",
        end="hi",
        closed=closed,
        band=band,  # None = plain by-key exchange; numeric = hot-key salt
        num_buckets=3,
    ).to_pandas()
    lo_ok = (lambda t, lo: t >= lo) if closed in ("both", "left") else (lambda t, lo: t > lo)
    hi_ok = (lambda t, hi: t <= hi) if closed in ("both", "right") else (lambda t, hi: t < hi)
    want = {
        (int(l["lid"]), int(r["rid"]))
        for _, l in ldf.iterrows()
        for _, r in rdf.iterrows()
        if l["k"] == r["rk"] and lo_ok(l["t"], r["lo"]) and hi_ok(l["t"], r["hi"])
    }
    got_pairs = (
        set(zip(got["lid"].astype("int64"), got["rid"].astype("int64")))
        if len(got)
        else set()
    )
    assert got_pairs == want
    assert len(got) == len(want)  # no duplicate pairs


def test_range_join_band_timestamp_parity_hot_key():
    """Banded == unbanded on temporal intervals with MIXED timestamp units
    (us points, ns interval ends) and one hot key carrying 90% of rows —
    the exact shape the band salt exists for."""
    rng = np.random.default_rng(7)
    n = 300
    base = pd.Timestamp("2024-03-01")
    ldf = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.9, 1, 2).astype(np.int64),
            "t": (base + pd.to_timedelta(rng.integers(0, 72 * 60, n), unit="m"))
            .astype("datetime64[us]"),
            "lid": np.arange(n, dtype=np.int64),
        }
    )
    starts = base + pd.to_timedelta(rng.integers(0, 72 * 60, n // 3), unit="m")
    rdf = pd.DataFrame(
        {
            "rk": np.where(rng.random(n // 3) < 0.9, 1, 2).astype(np.int64),
            "lo": starts.astype("datetime64[us]"),
            "hi": (starts + pd.Timedelta(hours=2)).astype("datetime64[ns]"),
            "rid": np.arange(n // 3, dtype=np.int64),
        }
    )

    def pairs(band):
        got = range_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="k",
            right_by="rk",
            point="t",
            start="lo",
            end="hi",
            closed="both",
            band=band,
            num_buckets=4,
        ).to_pandas()
        return set(zip(got["lid"].astype("int64"), got["rid"].astype("int64")))

    plain = pairs(None)
    assert len(plain) > 100  # non-trivial fixture
    assert pairs(pd.Timedelta(hours=1)) == plain
    assert pairs(pd.Timedelta(minutes=37)) == plain  # granule ∤ window width
