"""Trained quality classifier: separation on a held-out split,
parallelism invariance of the closed-form fit, empty-corpus error."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.stages.quality_clf import (
    score_quality,
    train_quality_classifier,
)

_GOOD = "the theory of relativity describes gravity as curved spacetime geometry".split()
_BAD = "click here buy cheap viagra casino winner free prize lottery jackpot".split()


def _corpus(words, n, seed, start_id):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(words, 30)) for _ in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + n), pa.int64()),
            "text": texts,
        }
    )


def test_separates_held_out(ray_session):
    pos = rd.from_arrow(_corpus(_GOOD, 120, 1, 0))
    neg = rd.from_arrow(_corpus(_BAD, 120, 2, 1000))
    clf = train_quality_classifier(pos, neg)
    held_pos = rd.from_arrow(_corpus(_GOOD, 40, 3, 2000))
    held_neg = rd.from_arrow(_corpus(_BAD, 40, 4, 3000))
    p = score_quality(held_pos, clf).to_pandas()["quality_prob"]
    n = score_quality(held_neg, clf).to_pandas()["quality_prob"]
    assert p.min() > 0.5 > n.max()  # fully separable vocabularies


def test_fit_is_parallelism_invariant(ray_session):
    pos_t, neg_t = _corpus(_GOOD, 100, 5, 0), _corpus(_BAD, 100, 6, 500)
    w1 = train_quality_classifier(
        rd.from_arrow(pos_t), rd.from_arrow(neg_t)
    ).w
    w2 = train_quality_classifier(
        rd.from_arrow(pos_t).repartition(13), rd.from_arrow(neg_t).repartition(7)
    ).w
    np.testing.assert_allclose(w1, w2, atol=1e-8)


def test_empty_training_raises(ray_session):
    empty = rd.from_arrow(_corpus(_GOOD, 0, 7, 0))
    with pytest.raises(ValueError, match="no training rows"):
        train_quality_classifier(empty, empty)
