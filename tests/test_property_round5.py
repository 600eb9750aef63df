"""Hypothesis property tests for the round-5 additions: packing scan,
Misra–Gries exactness-certified top-k, bloom one-sidedness, weighted
sampling. Deterministic profiles (no deadline) since each draw runs a
real Ray pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ertransfer_ray.stages.bloom import BloomFilter, bloom_params
from ertransfer_ray.stages.heavyhitters import _mg_block_summary
from ertransfer_ray.stages.packing import pack_sequences

_slow = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def corpora(draw):
    n = draw(st.integers(1, 25))
    texts = draw(
        st.lists(
            st.text(alphabet="ab c", max_size=30), min_size=n, max_size=n
        )
    )
    return {i: t for i, t in enumerate(texts)}


@given(corpora(), st.integers(1, 7), st.integers(1, 4))
@_slow
def test_pack_sequences_property(texts, seq_len, parts):
    ids = sorted(texts)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
            }
        )
    ).repartition(parts)
    got = (
        pack_sequences(ds, seq_len=seq_len)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pos = 0
    for i, did in enumerate(ids):
        c = len(texts[did].strip().split()) if texts[did].strip() else 0
        row = got.iloc[i]
        assert row["doc_id"] == did and row["token_count"] == c
        assert row["start_pos"] == pos
        assert row["seq_first"] == pos // seq_len
        assert row["seq_last"] == (pos + max(c, 1) - 1) // seq_len
        pos += c


@given(
    st.dictionaries(st.text(alphabet="xyz", min_size=1, max_size=3),
                    st.integers(1, 500), min_size=1, max_size=40),
    st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_mg_summary_error_bound_property(counts, s):
    """Every retained counter underestimates by exactly delta; every
    dropped term had count <= delta; delta <= total/(s+1)."""
    ser = pd.Series(counts)
    kept, delta = _mg_block_summary(ser, s)
    assert len(kept) <= s
    assert delta <= ser.sum() // (s + 1) if len(ser) > s else delta == 0
    for t, v in ser.items():
        if t in kept.index:
            assert kept[t] == v - delta and kept[t] > 0
        else:
            assert v <= delta


@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=1, max_size=300,
                unique=True),
       st.integers(64, 2**14), st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative_property(keys, m_raw, k):
    m = 1 << int(np.log2(m_raw))  # power of two
    bf = BloomFilter(max(m, 64), k)
    h = np.array(keys, dtype=np.int64)
    bf.add(h)
    assert bf.contains(h).all()


@given(st.integers(1, 10**7), st.floats(0.0005, 0.3))
@settings(max_examples=300, deadline=None)
def test_bloom_params_property(n, fpp):
    m, k = bloom_params(n, fpp)
    assert m >= 64 and m & (m - 1) == 0
    assert 1 <= k <= 16
    # the chosen m is at least the textbook requirement (rounded up)
    assert m >= -n * np.log(fpp) / (np.log(2.0) ** 2) / 2  # within the pow2 step
