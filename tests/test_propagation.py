"""GNEM-shape score propagation (pair-graph neighbor-mean smoothing,
/root/reference/methods/gnem/transform.py:16-46 dataflow)."""

import pandas as pd
import pytest
import ray.data as rd

from ertransfer_ray.pipelines.er_pipeline import ERConfig, run_er
from ertransfer_ray.pipelines.metrics import pairwise_f1
from ertransfer_ray.stages.em_matcher import propagate_scores


def _preds():
    # pair graph: (a,b)–(a,c) share endpoint a; (d,e) isolated
    return rd.from_pandas(
        pd.DataFrame(
            {
                "left_url": ["a", "a", "d"],
                "right_url": ["b", "c", "e"],
                "prob": [0.9, 0.5, 0.8],
            }
        )
    )


def test_propagation_hand_computed():
    out = (
        propagate_scores(_preds(), alpha=0.5)
        .to_pandas()
        .sort_values(["left_url", "right_url"], ignore_index=True)
    )
    m = {(l, r): p for l, r, p in out.itertuples(index=False)}
    # (a,b): neighbor (a,c)=0.5 → 0.5·0.9 + 0.5·0.5 = 0.7
    assert m[("a", "b")] == pytest.approx(0.7)
    # (a,c): neighbor (a,b)=0.9 → 0.5·0.5 + 0.5·0.9 = 0.7
    assert m[("a", "c")] == pytest.approx(0.7)
    # isolated pair keeps its score
    assert m[("d", "e")] == pytest.approx(0.8)


def test_propagation_alpha_zero_is_identity():
    base = _preds().to_pandas().sort_values(["left_url", "right_url"], ignore_index=True)
    out = (
        propagate_scores(_preds(), alpha=0.0)
        .to_pandas()
        .sort_values(["left_url", "right_url"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(base, out, check_dtype=False)


def test_propagation_preserves_flagship_f1(pages_corpus):
    pages = rd.from_arrow(pages_corpus["pages"])
    res = run_er(pages, ERConfig(gnem_smooth_alpha=0.2))
    assign = res["clusters"].to_pandas()
    truth = pages_corpus["truth_pairs"].to_pandas()
    m = pairwise_f1(assign, truth)
    assert m["f1"] >= 0.99, m
