"""Property test: bucketed cogroup join ≡ pandas merge on random inputs
(duplicate keys, missing keys, empty sides), with source dtypes restored."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ertransfer_ray.stages.joins import bucketed_join

_KEYS = st.lists(st.integers(0, 8), min_size=0, max_size=25)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # None/NaN → one sentinel; numeric compare in float (join misses widen)
    out = pd.DataFrame(
        {
            "k": df["k"].astype(str),
            "x": df["x"].astype(np.float64),
            "y": pd.to_numeric(df["y"], errors="coerce").fillna(-999.0),
        }
    )
    return out.sort_values(["k", "x", "y"], ignore_index=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(_KEYS, _KEYS, st.sampled_from(["inner", "left"]))
def test_bucketed_join_matches_pandas_merge(lkeys, rkeys, how):
    if not lkeys:
        return  # empty probe side covered by unit tests
    ldf = pd.DataFrame(
        {"k": [f"k{v}" for v in lkeys], "x": np.arange(len(lkeys), dtype=np.int32)}
    )
    rdf = pd.DataFrame(
        {"k": [f"k{v}" for v in rkeys], "y": np.arange(len(rkeys), dtype=np.int8)}
    )
    got_df = bucketed_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf), "k", how=how, num_buckets=3
    ).to_pandas()
    want = ldf.merge(rdf, on="k", how=how)
    assert len(got_df) == len(want)
    if len(want) == 0:
        return
    got_c = _canon(got_df)
    want_c = _canon(want)
    pd.testing.assert_frame_equal(got_c, want_c)
    # dtype restoration: lossless casts applied when no NaN was introduced
    if how == "inner":
        assert got_df["x"].dtype == np.int32
        assert got_df["y"].dtype == np.int8


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(_KEYS, _KEYS, st.sampled_from(["inner", "left"]))
def test_bucketed_join_int_keys_match_pandas_merge(lkeys, rkeys, how):
    """Integer join keys ride the native-int _jk path (round 3) — must
    still agree with the pandas merge oracle."""
    if not lkeys:
        return
    ldf = pd.DataFrame({"k": np.asarray(lkeys, dtype=np.int64),
                        "x": np.arange(len(lkeys), dtype=np.int32)})
    rdf = pd.DataFrame({"k": np.asarray(rkeys, dtype=np.int64),
                        "y": np.arange(len(rkeys), dtype=np.int8)})
    got = bucketed_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf), "k", how=how, num_buckets=3
    ).to_pandas()
    want = ldf.merge(rdf, on="k", how=how)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(_canon(got), _canon(want))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(_KEYS, _KEYS, st.booleans())
def test_anti_semi_join_matches_pandas_isin(pkeys, bkeys, anti):
    from ertransfer_ray.stages.joins import bucketed_anti_semi_join

    if not pkeys:
        return
    probe = pd.DataFrame({"k": np.asarray(pkeys, dtype=np.int64),
                          "x": np.arange(len(pkeys), dtype=np.int64)})
    build = pd.DataFrame({"k": np.asarray(bkeys, dtype=np.int64)})
    got_ds = bucketed_anti_semi_join(
        rd.from_pandas(probe), rd.from_pandas(build), "k",
        anti=anti, num_buckets=3,
    )
    mask = probe["k"].isin(set(bkeys))
    want = probe[~mask] if anti else probe[mask]
    assert got_ds.count() == len(want)
    if len(want) == 0:
        return  # Dataset.to_pandas drops columns on zero rows (Ray quirk)
    # cast BEFORE sorting: the probe columns can come back object-typed,
    # and object sort orders "10" < "2"
    got = got_ds.to_pandas().astype("int64").sort_values(["k", "x"], ignore_index=True)
    want = want.sort_values(["k", "x"], ignore_index=True).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_join_preserves_int64_ids_beyond_float53():
    """Mixed tagged-union buckets must not route int64 ids through float64:
    ids above 2^53 (hash-valued ids) would silently change. Covers both
    bucketed_join carried columns and anti-semi-join probe columns."""
    from ertransfer_ray.stages.joins import bucketed_anti_semi_join

    big = (1 << 60) + 1  # not representable in float64
    ldf = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                        "payload_id": np.array([big, big + 3], dtype=np.int64)})
    rdf = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                        "y": np.array([10, 20], dtype=np.int64)})
    out = bucketed_join(rd.from_pandas(ldf), rd.from_pandas(rdf), "k",
                        num_buckets=2).to_pandas()
    got = dict(zip(out["k"].astype("int64"), out["payload_id"].astype("int64")))
    assert got == {1: big, 2: big + 3}

    probe = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                          "pid": np.array([big, big + 1, big + 2], dtype=np.int64)})
    build = pd.DataFrame({"k": np.array([2], dtype=np.int64)})
    kept = bucketed_anti_semi_join(
        rd.from_pandas(probe), rd.from_pandas(build), "k", anti=True,
        num_buckets=2,
    ).to_pandas()
    assert sorted(kept["pid"].astype("int64")) == [big, big + 2]
