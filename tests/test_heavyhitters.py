"""Misra–Gries two-pass heavy hitters: brute-force parity under forced
truncation, layout invariance, certification failure on flat data, and
the exact-fallback arm."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.stages.heavyhitters import (
    _mg_block_summary,
    top_k_terms,
)


def _brute_top(texts: list[str], k: int) -> pd.DataFrame:
    ex = pd.Series(texts).fillna("").str.lower().str.split().explode().dropna()
    vc = ex.value_counts()
    df = pd.DataFrame({"term": vc.index.to_numpy(dtype=object), "n": vc.to_numpy(np.int64)})
    return (
        df.sort_values(["n", "term"], ascending=[False, True], ignore_index=True)
        .head(k)
        .reset_index(drop=True)
    )


def _ds(texts: list[str], parts: int = 4):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})).repartition(parts)


def _zipf_texts(n_docs: int, vocab: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    # Zipf-ish ranks: heavy head, long tail — vocab far above the counter
    # budget used in the tests so per-block truncation actually happens
    ranks = rng.zipf(1.3, size=n_docs * 20)
    ranks = ranks[ranks <= vocab]
    words = np.char.add("w", ranks.astype(str))
    per_doc = np.array_split(words, n_docs)
    return [" ".join(d) for d in per_doc]


def test_mg_block_summary_properties():
    counts = pd.Series({"a": 100, "b": 40, "c": 39, "d": 5, "e": 5, "f": 1})
    kept, delta = _mg_block_summary(counts, 3)
    assert delta == 5  # the (s+1)-th largest
    assert len(kept) <= 3
    # every retained counter is exact minus delta; dropped terms were <= delta
    assert kept["a"] == 95 and kept["b"] == 35 and kept["c"] == 34
    assert set(counts.index) - set(kept.index) == {"d", "e", "f"}
    # no truncation path
    kept2, delta2 = _mg_block_summary(counts, 10)
    assert delta2 == 0 and kept2.equals(counts)


def test_top_k_matches_bruteforce_under_truncation():
    texts = _zipf_texts(300, vocab=2000, seed=7)
    want = _brute_top(texts, 10)
    for parts in (2, 8):
        got = top_k_terms(_ds(texts, parts), k=10, counters=64, candidates=80)
        pd.testing.assert_frame_equal(got, want), parts


def test_flat_distribution_raises_then_fallback_matches():
    # near-uniform counts: nothing is provably heavy at a tiny budget
    rng = np.random.default_rng(3)
    words = np.char.add("u", rng.integers(0, 500, 20_000).astype(str))
    texts = [" ".join(d) for d in np.array_split(words, 100)]
    with pytest.raises(ValueError, match="not certifiable"):
        top_k_terms(_ds(texts), k=10, counters=16, candidates=20)
    got = top_k_terms(
        _ds(texts), k=10, counters=16, candidates=20, on_unprovable="exact"
    )
    pd.testing.assert_frame_equal(got, _brute_top(texts, 10))


def test_tiny_vocab_certifies_trivially():
    # vocab below the counter budget: zero truncation => bound == 0 and the
    # result certifies even when ties make the k-th count non-dominant
    texts = ["x y z"] * 50 + ["x y"] * 5
    got = top_k_terms(_ds(texts, 3), k=2, counters=64)
    pd.testing.assert_frame_equal(got, _brute_top(texts, 2))


def test_empty_and_null_corpus():
    got = top_k_terms(_ds(["", "   "], 2), k=5)
    assert got.empty
    assert list(got.columns) == ["term", "n"]
