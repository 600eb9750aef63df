"""M15 conformance: truncate-longer-first budget loop, CLS/SEP layouts,
padding — vs hand-computed expectations at max_len 128 and a property test
of the closed-form lengths against the reference's loop
(/root/reference/methods/emtransformer/feature_extraction.py:9-28,31-152)."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ertransfer_ray.functions.lm_tokenize import (
    CLS_ID,
    PAD_ID,
    SEP_ID,
    PairTokenizer,
    basic_tokenize,
    encode_pair,
    tokenize_pairs,
    truncate_seq_pair,
    truncated_lengths,
)


def _toks(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_truncation_hand_computed_at_128():
    # pair budget at max_seq_length=128, BERT layout: 128 - 3 = 125
    budget = 128 - 3
    # both long: loop equalizes to ceil/floor of 125 → (63, 62)
    a, b = truncate_seq_pair(_toks("a", 200), _toks("b", 200), budget)
    assert (len(a), len(b)) == (63, 62)
    # short a: only b pops → (30, 95)
    a, b = truncate_seq_pair(_toks("a", 30), _toks("b", 300), budget)
    assert (len(a), len(b)) == (30, 95)
    # short b: only a pops → (123, 2)
    a, b = truncate_seq_pair(_toks("a", 150), _toks("b", 2), budget)
    assert (len(a), len(b)) == (123, 2)
    # fits → untouched
    a, b = truncate_seq_pair(_toks("a", 60), _toks("b", 65), budget)
    assert (len(a), len(b)) == (60, 65)
    # truncation keeps PREFIXES (pops from the end); (4,6) at budget 5
    # drains b to parity then alternates → (3,2)
    a, b = truncate_seq_pair(_toks("a", 4), _toks("b", 6), 5)
    assert a == ["a0", "a1", "a2"] and b == ["b0", "b1"]


@settings(max_examples=300, deadline=None)
@given(
    la=st.integers(0, 400),
    lb=st.integers(0, 400),
    m=st.integers(0, 300),
)
def test_closed_form_matches_reference_loop(la, lb, m):
    a, b = truncate_seq_pair(_toks("a", la), _toks("b", lb), m)
    assert (len(a), len(b)) == truncated_lengths(la, lb, m)


def test_encode_pair_bert_layout():
    enc = encode_pair(["x", "y"], ["z"], max_seq_length=10)
    # [CLS] x y [SEP] z [SEP] + 4 pads
    assert enc["tokens"] == ["[CLS]", "x", "y", "[SEP]", "z", "[SEP]"]
    ids = enc["input_ids"]
    assert ids[0] == CLS_ID and ids[3] == SEP_ID and ids[5] == SEP_ID
    assert list(ids[6:]) == [PAD_ID] * 4
    assert list(enc["input_mask"]) == [1] * 6 + [0] * 4
    # segments: CLS gets cls_token_segment_id (1, reference default), A-run
    # 0s through its SEP, B-run 1s through its SEP
    assert list(enc["segment_ids"]) == [1, 0, 0, 0, 1, 1, 0, 0, 0, 0]


def test_encode_pair_xlnet_and_roberta_variants():
    x = encode_pair(["x"], ["z"], 8, cls_token_at_end=True)
    assert x["tokens"][-1] == "[CLS]"  # XLNet pattern: A [SEP] B [SEP] [CLS]
    r = encode_pair(["x"], ["z"], 8, sep_token_extra=True)
    assert r["tokens"] == ["[CLS]", "x", "[SEP]", "[SEP]", "z", "[SEP]"]
    p = encode_pair(["x"], ["z"], 8, pad_on_left=True)
    assert list(p["input_ids"][:3]) == [PAD_ID] * 3
    assert list(p["input_mask"][:3]) == [0] * 3
    assert p["tokens"][0] == "[CLS]"


def test_encode_pair_budget_accounting():
    # 128-length pair encodes to exactly 128 with no pad when both long
    enc = encode_pair(_toks("a", 200), _toks("b", 200), 128)
    assert len(enc["tokens"]) == 128
    assert enc["input_mask"].sum() == 128
    r = encode_pair(_toks("a", 200), _toks("b", 200), 128, sep_token_extra=True)
    assert len(r["tokens"]) == 128  # -4 budget: 62+62 tokens + CLS + 3 SEP


def test_tokenizer_determinism_and_ids():
    t1 = basic_tokenize("The Quick-Brown fox!")
    assert t1 == ["the", "quick", "-", "brown", "fox", "!"]
    e1 = encode_pair(t1, ["fox"], 16)
    e2 = encode_pair(t1, ["fox"], 16)
    np.testing.assert_array_equal(e1["input_ids"], e2["input_ids"])
    # same surface token → same id everywhere (hash vocab)
    fox_pos = [i for i, t in enumerate(e1["tokens"]) if t == "fox"]
    assert len(fox_pos) == 2
    assert e1["input_ids"][fox_pos[0]] == e1["input_ids"][fox_pos[1]] >= 1000


def test_tokenize_pairs_stage():
    pairs = rd.from_pandas(
        pd.DataFrame(
            {
                "left_url": ["u1", "u2"],
                "right_url": ["v1", "v2"],
                "left_payload": ["alpha beta gamma", ""],
                "right_payload": ["alpha beta", "delta"],
            }
        )
    )
    out = tokenize_pairs(pairs, max_seq_length=12).to_pandas()
    assert set(out.columns) == {
        "left_url", "right_url", "input_ids", "input_mask", "segment_ids"
    }
    assert all(len(v) == 12 for v in out["input_ids"])
    # keys travel with batches (SURVEY §2.9 alignment rule)
    assert out.sort_values("left_url")["left_url"].tolist() == ["u1", "u2"]


# ---------------------------------------------------------------------------
# round 4: real WordPiece vocab drop-in (VERDICT item 5)
# ---------------------------------------------------------------------------

_TINY_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]",
               "hello", "world", "un", "##aff", "##able", ","]


def _write_vocab(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(_TINY_VOCAB) + "\n", encoding="utf-8")
    return str(p)


def test_wordpiece_vocab_greedy_longest_match(tmp_path):
    from ertransfer_ray.functions.lm_tokenize import WordPieceVocab

    v = WordPieceVocab(_write_vocab(tmp_path))
    assert v.wordpiece("hello") == ["hello"]
    assert v.wordpiece("unaffable") == ["un", "##aff", "##able"]
    assert v.wordpiece("zzz") == ["[UNK]"]            # no piece covers it
    assert v.wordpiece("unaffzzz") == ["[UNK]"]       # mid-word dead end
    assert v.pad_id == 0 and v.cls_id == 2 and v.sep_id == 3


def test_pair_tokenizer_real_vocab_ids(tmp_path):
    """Hand-computed ids through PairTokenizer.__init__(vocab_path=...) —
    reference layout methods/emtransformer/feature_extraction.py:31-152
    with ids from the vocab FILE instead of the hash fallback."""
    import pandas as pd

    from ertransfer_ray.functions.lm_tokenize import PairTokenizer

    tok = PairTokenizer(
        left_col="a", right_col="b", max_seq_length=16,
        vocab_path=_write_vocab(tmp_path),
    )
    out = tok(pd.DataFrame({"a": ["Hello world"], "b": ["unaffable zzz"]}))
    # [CLS] hello world [SEP] un ##aff ##able [UNK] [SEP] + 7 pad
    assert out["input_ids"][0].tolist() == [
        2, 4, 5, 3, 6, 7, 8, 1, 3, 0, 0, 0, 0, 0, 0, 0
    ]
    assert out["input_mask"][0].tolist() == [1] * 9 + [0] * 7
    # cls_token_segment_id=1 default; A-run 0s, B-run 1s, pad 0s
    assert out["segment_ids"][0].tolist() == [
        1, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0
    ]


def test_pair_tokenizer_real_vocab_through_ray(tmp_path):
    import pandas as pd
    import ray.data as rd

    from ertransfer_ray.functions.lm_tokenize import tokenize_pairs

    pairs = rd.from_pandas(
        pd.DataFrame(
            {"left_url": ["u1"], "right_url": ["u2"],
             "left_payload": ["hello , world"], "right_payload": ["unaffable"]}
        )
    )
    got = tokenize_pairs(
        pairs, concurrency=1, max_seq_length=12, vocab_path=_write_vocab(tmp_path)
    ).to_pandas()
    # [CLS] hello , world [SEP] un ##aff ##able [SEP] + 3 pad
    assert list(got["input_ids"][0]) == [2, 4, 9, 5, 3, 6, 7, 8, 3, 0, 0, 0]
