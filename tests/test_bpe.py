"""BPE tokenizer training: hand-computed merges, deterministic ties,
parallelism invariance, exact segmentation, and the vocab-file export
consumed by the existing WordPiece loader."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.functions.lm_tokenize import WordPieceVocab
from ertransfer_ray.stages.bpe import (
    bpe_segment,
    train_bpe,
    train_bpe_vocab,
    word_counts,
    write_vocab,
)


def test_train_bpe_hand_computed_merges():
    # the classic Sennrich example family: "low"x5 "lower"x2 "newest"x6
    # "widest"x3 — position-aware symbols, so merges carry ## continuations
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, alphabet = train_bpe(freqs, num_merges=4, min_pair_freq=1)
    # pair counts round 1: ("##e","##s")=9 and ("##s","##t")=9 tie;
    # lexicographic pair order breaks the tie deterministically
    assert merges[0] == ("##e", "##s")
    assert merges[1] == ("##es", "##t")   # 9 again after the first merge
    # round 3: ("l","##o") and ("##o","##w") tie at 7; '#' < 'l' so the
    # continuation pair wins, then l + ##ow completes the stem
    assert merges[2] == ("##o", "##w")
    assert merges[3] == ("l", "##ow")
    assert "##e" in alphabet and "l" in alphabet and "w" in alphabet


def test_bpe_segment_applies_merges_in_rank_order():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, _ = train_bpe(freqs, num_merges=10, min_pair_freq=1)
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe_segment("newest", ranks) == ["newest"] or \
        "".join(s.replace("##", "") for s in bpe_segment("newest", ranks)) == "newest"
    # an unseen word still segments into learned pieces + leftovers
    pieces = bpe_segment("lowest", ranks)
    assert "".join(p.replace("##", "") for p in pieces) == "lowest"
    assert pieces[0].startswith("low") or pieces[0] == "l"
    assert bpe_segment("", ranks) == []


def test_word_counts_and_vocab_parallelism_invariant():
    rng = np.random.default_rng(2)
    vocab_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [
        " ".join(rng.choice(vocab_words, size=rng.integers(1, 12)))
        for _ in range(300)
    ]

    def ds(parts):
        return rd.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(parts)

    wc2 = word_counts(ds(2))
    wc9 = word_counts(ds(9))
    assert wc2 == wc9
    brute = pd.Series(" ".join(texts).split()).value_counts().to_dict()
    assert wc2 == brute

    v2, m2 = train_bpe_vocab(ds(2), num_merges=30)
    v9, m9 = train_bpe_vocab(ds(9), num_merges=30)
    assert v2 == v9 and m2 == m9
    # the most frequent word ends up a single learned token
    top = max(brute, key=lambda w: (brute[w], w))
    assert top in v2


def test_vocab_export_loads_into_wordpiece(tmp_path):
    texts = ["running runner run " * 20]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    vocab, merges = train_bpe_vocab(ds, num_merges=50, min_pair_freq=1)
    path = write_vocab(vocab, str(tmp_path / "vocab.txt"))
    wp = WordPieceVocab(path)
    # ids follow file order; specials resolved from the file
    assert wp.vocab["[PAD]"] == 0 and wp.vocab["[UNK]"] == 1
    pieces = wp.tokenize(["running"])
    assert "".join(p.replace("##", "") for p in pieces) == "running"
    assert all(p in wp.vocab for p in pieces)
    # a word with characters the corpus never saw falls back to [UNK]
    assert wp.tokenize(["zq!"]) == ["[UNK]"]
