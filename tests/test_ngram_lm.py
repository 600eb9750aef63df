"""Bigram-LM cross-entropy: hand-computed parity on a tiny corpus,
short-doc edge cases, parallelism invariance, and the count-rank caps."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ertransfer_ray.stages.ngram_lm import score_bigram_ce, train_bigram_lm

DOCS = [
    "a b a b c",
    "a a a",
    "c b a",
    "x",  # 1 token → no bigram → dropped
    "",  # splits to [''] → 1 token → dropped
    "b c b c b c",
]


def _reference_ce(texts, k=0.5):
    toks = [t.split(" ") for t in texts]
    uni, big = {}, {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for i, ts in enumerate(toks):
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        nll = [
            -math.log2((big.get(p, 0) + k) / (uni[p[0]] + k * V)) for p in pairs
        ]
        out[i] = (len(pairs), round(sum(nll) / len(nll), 6))
    return out


def _run(texts, **train_kw):
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    model = train_bigram_lm(ds, **train_kw)
    return (
        score_bigram_ce(ds, model)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def test_hand_computed_parity(ray_session):
    got = _run(DOCS)
    want = _reference_ce(DOCS)
    assert list(got["doc_id"]) == sorted(want)
    for _, r in got.iterrows():
        n, ce = want[r["doc_id"]]
        assert r["n_bigrams"] == n
        assert abs(r["cross_entropy"] - ce) < 1e-9


def test_parallelism_invariance(ray_session):
    """Counts combined through the exchange equal single-block counts."""
    texts = DOCS * 40
    one = _run(texts)
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(16)
    model = train_bigram_lm(ds)
    many = (
        score_bigram_ce(ds, model)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_caps_keep_top_by_count(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": ["a a a b", "a c"]}))
    model = ray.get(train_bigram_lm(ds, max_vocab=2, max_bigrams=1))
    assert set(model["uni"].index) == {"a", "b"} or set(model["uni"].index) == {
        "a",
        "c",
    }
    assert model["uni"].index[0] == "a"  # top unigram survives
    assert model["V"] == 3  # V measured before the cap
    assert len(model["big"]) == 1 and model["big"].iloc[0] == 2  # 'a a' ×2


def test_unseen_tokens_score_via_smoothing(ray_session):
    train = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b a b"]}))
    model = train_bigram_lm(train)
    test = rd.from_arrow(pa.table({"doc_id": [7], "text": ["z q"]}))
    got = score_bigram_ce(test, model).to_pandas()
    # c(z q)=0, c(z)=0, V=2 → p = 0.5 / (0.5*2) = 0.5 → 1 bit
    assert got.loc[0, "cross_entropy"] == 1.0


def test_capped_vocab_no_code_collision(ray_session):
    """max_vocab leaves bigrams with out-of-vocab endpoints (code -1); an
    earlier int-code form let them collide with valid codes and return
    wrong counts. Scoring must equal a dict-based reference over the SAME
    capped model."""
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["a b a b a b", "b a", "b z", "a z"],
            }
        )
    )
    ref = train_bigram_lm(ds, max_vocab=2)
    model = ray.get(ref)
    uni, big, V, k = model["uni"], model["big"], model["V"], model["k"]
    got = (
        score_bigram_ce(ds, ref)
        .to_pandas()
        .set_index("doc_id")["cross_entropy"]
    )
    for doc_id, text in [(0, "a b a b a b"), (1, "b a"), (2, "b z"), (3, "a z")]:
        ws = text.split(" ")
        nll = []
        for x, y in zip(ws, ws[1:]):
            cb = float(big.get(x + "\x01" + y, 0.0))
            cu = float(uni.get(x, 0.0))
            nll.append(-math.log2((cb + k) / (cu + k * V)))
        want = round(sum(nll) / len(nll), 6)
        assert abs(got[doc_id] - want) < 1e-9, (doc_id, got[doc_id], want)
