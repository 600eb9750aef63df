"""Property tests: the distributed CC path must agree with the driver
union-find oracle on arbitrary small graphs (self-loops, duplicate and
reversed edges, multi-component, random adjacency — the shapes the
contraction rework has to get right), and the shared count pass must agree
with a pandas value_counts oracle."""

import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ertransfer_ray.stages.clustering import connected_components
from ertransfer_ray.stages.groupby import counted_key_survivors

_EDGE = st.tuples(st.integers(0, 23), st.integers(0, 23))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_EDGE, min_size=1, max_size=50))
def test_cc_distributed_matches_driver_union_find(pairs):
    edges = pd.DataFrame(
        [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs],
        columns=["left_url", "right_url"],
    )
    dist = (
        connected_components(rd.from_pandas(edges), driver_threshold=0)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    drv = (
        connected_components(rd.from_pandas(edges))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    pd.testing.assert_frame_equal(dist, drv)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(st.integers(-5, 5), min_size=1, max_size=80),
    st.integers(2, 4),
)
def test_counted_survivors_match_value_counts(keys, max_count):
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).materialize()
    got = counted_key_survivors(ds, "k", 4, 10_000, min_count=2, max_count=max_count)
    vc = pd.Series(keys).value_counts()
    want = sorted(vc.index[(vc.values >= 2) & (vc.values <= max_count)].tolist())
    assert sorted(got.to_pylist()) == want
