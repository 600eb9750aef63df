import numpy as np
import pandas as pd
import ray.data as rd

from ertransfer_ray.stages.em_matcher import em_score_pairs, neighbor_lists


def _pairs(n_match=40, n_non=160, seed=3):
    """Synthetic pair rows whose features separate: matches share most
    text, non-matches share little."""
    rng = np.random.default_rng(seed)
    rows = []
    vocab = [f"w{i}" for i in range(50)]
    for i in range(n_match + n_non):
        base = rng.choice(vocab, 12, replace=False).tolist()
        if i < n_match:
            other = base[:10] + rng.choice(vocab, 2).tolist()  # high overlap
        else:
            other = rng.choice(vocab, 12, replace=False).tolist()  # random
        rows.append(
            {
                "left_url": f"L{i}",
                "right_url": f"R{i}",
                "left_title": " ".join(base[:3]),
                "right_title": " ".join(other[:3]),
                "left_payload": " ".join(base),
                "right_payload": " ".join(other),
                "is_match": i < n_match,
            }
        )
    return pd.DataFrame(rows)


def test_em_separates_without_labels():
    df = _pairs()
    preds_ds, params = em_score_pairs(rd.from_pandas(df.drop(columns=["is_match"])))
    preds = preds_ds.to_pandas().merge(
        df[["left_url", "is_match"]], on="left_url"
    )
    match_probs = preds[preds["is_match"]]["prob"]
    non_probs = preds[~preds["is_match"]]["prob"]
    # unsupervised separation: matches overwhelmingly above, non-matches below
    assert (match_probs > 0.5).mean() >= 0.9
    assert (non_probs < 0.5).mean() >= 0.9
    # match component mean similarity exceeds non-match component's
    assert params["mu"][1].mean() > params["mu"][0].mean()


def test_em_deterministic():
    df = _pairs().drop(columns=["is_match"])
    p1, _ = em_score_pairs(rd.from_pandas(df))
    p2, _ = em_score_pairs(rd.from_pandas(df))
    a = p1.to_pandas().sort_values("left_url", ignore_index=True)
    b = p2.to_pandas().sort_values("left_url", ignore_index=True)
    assert np.allclose(a["prob"], b["prob"])


def test_neighbor_lists():
    pairs = pd.DataFrame(
        {
            "left_url": ["a", "a", "a", "b"],
            "right_url": ["x", "y", "x", "z"],
        }
    )
    out = neighbor_lists(rd.from_pandas(pairs)).to_pandas().sort_values(
        "url", ignore_index=True
    )
    assert out["url"].tolist() == ["a", "b"]
    assert list(out[out["url"] == "a"]["neighbors"].iloc[0]) == ["x", "y"]  # deduped, sorted
    assert out["degree"].tolist() == [2, 1]
