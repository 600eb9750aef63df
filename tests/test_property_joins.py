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
