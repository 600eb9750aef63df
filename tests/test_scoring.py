import pandas as pd
import ray.data as rd

from ertransfer_ray.stages.scoring import (
    PairScorer,
    compute_pair_features,
    matcher_metrics,
    score_pairs,
)


def _pair_df():
    return pd.DataFrame(
        {
            "left_url": ["a", "b"],
            "right_url": ["x", "y"],
            "left_title": ["quick brown fox", "alpha beta"],
            "right_title": ["quick brown fox", "gamma delta"],
            "left_payload": ["quick brown fox jumps high", "alpha beta words here now"],
            "right_payload": ["quick brown fox jumps high", "totally different content okay"],
        }
    )


def test_features_separate_dup_from_nondup():
    f = compute_pair_features(_pair_df())
    assert f["text_jaccard"][0] == 1.0 and f["title_jw"][0] == 1.0
    assert f["text_jaccard"][1] < 0.2 and f["title_jw"][1] < 0.8


def test_scorer_probability_separation():
    out = PairScorer()(_pair_df())
    assert out["prob"][0] > 0.95
    assert out["prob"][1] < 0.05
    assert list(out.columns) == ["left_url", "right_url", "prob"]


def test_scorer_actor_pool_in_dataset():
    ds = rd.from_pandas(_pair_df())
    out = score_pairs(ds, concurrency=2, batch_size=1).to_pandas()
    assert len(out) == 2
    assert set(out.columns) == {"left_url", "right_url", "prob"}


def test_matcher_metrics_guards():
    preds = pd.DataFrame(
        {"left_url": ["a"], "right_url": ["b"], "prob": [0.9]}
    )
    m = matcher_metrics(preds, truth_pos={("a", "b")})
    assert m["f1"] == 1.0
    # zero predictions → zero metrics, no division error (reference guard)
    m0 = matcher_metrics(preds[preds.prob > 2], truth_pos={("a", "b")})
    assert m0 == {"tp": 0, "predicted": 0, "truth": 1,
                  "precision": 0.0, "recall": 0.0, "f1": 0.0}
