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


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_EDGE, min_size=1, max_size=40))
def test_cc_128bit_matches_driver_union_find(pairs):
    """key_bits=128 distributed path vs the driver union-find oracle."""
    edges = pd.DataFrame(
        [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs],
        columns=["left_url", "right_url"],
    )
    wide = (
        connected_components(rd.from_pandas(edges), driver_threshold=0,
                             key_bits=128)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    drv = (
        connected_components(rd.from_pandas(edges))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    pd.testing.assert_frame_equal(wide, drv)


def test_cc_128bit_survives_forced_single_word_collisions():
    """THE reason the wide path exists: mask one 64-bit word to a handful of
    bits (forced collisions in that word — the fixture the 64-bit bound
    warns about) and the (hi, lo) pair must still separate components.
    An implementation keying on either word alone over-merges and fails."""
    # 40 disjoint 2-node components; any cross-component merge is detectable
    edges = pd.DataFrame(
        {
            "left_url": [f"a{i:03d}" for i in range(40)],
            "right_url": [f"b{i:03d}" for i in range(40)],
        }
    )
    want = (
        connected_components(rd.from_pandas(edges))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    for mask in [(0x7, -1), (-1, 0x7)]:  # hi degenerate, then lo degenerate
        got = (
            connected_components(
                rd.from_pandas(edges), driver_threshold=0, key_bits=128,
                _key_mask=mask,
            )
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)
