import pyarrow as pa
import ray.data as rd

from ertransfer_ray.functions.textstats import (
    TextStats,
    bpe_ish_token_count,
    language_id,
    quality_score,
    token_count_batch,
)


def test_token_count_batch():
    arr = pa.chunked_array([pa.array(["a b  c", "  x ", "", "one"])])
    assert token_count_batch(arr).to_pylist() == [3, 1, 0, 1]


def test_bpe_ish_counts_punct():
    assert bpe_ish_token_count(["hello, world!"]).tolist() == [4]


def test_language_id():
    langs, confs = language_id(
        ["the cat is in the house and it is warm",
         "der Hund ist nicht mit der Katze",
         "le chat est dans la maison pour une nuit",
         "xyzzy qwerty"]
    )
    assert langs == ["en", "de", "fr", "und"]
    assert confs[0] > 0 and confs[3] == 0.0


def test_quality_score_ordering():
    good = "This is a reasonably long and well formed sentence about the topic of interest with many words."
    short = "hi"
    punct = "!!! ??? ;;; ... !!! ??? ;;;" * 3
    s = quality_score([good, short, punct])
    assert s[0] > s[1] and s[0] > s[2]


def test_textstats_stage_in_dataset():
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["the quick brown fox runs", "short"]})
    )
    out = ds.map_batches(TextStats, batch_format="pyarrow", concurrency=1).to_pandas()
    assert set(out.columns) >= {
        "doc_id", "text", "lang_pred", "lang_conf", "token_count",
        "bpe_token_count", "quality", "fingerprint",
    }
    assert out["token_count"].tolist() == [5, 1]


def test_repetition_stats_hand_computed():
    from ertransfer_ray.functions.textstats import repetition_stats

    out = repetition_stats([
        "a b a b",        # words: 4 total / 2 distinct; 2grams: a b, b a, a b → 3 total / 2 distinct
        "x y z",          # no repeats
        "",               # empty
        "w",              # single word → no 2grams
    ])
    assert out["n_words"].tolist() == [4, 3, 0, 1]
    assert out["n_2grams"].tolist() == [3, 2, 0, 0]
    assert out["dup_word_frac"].round(6).tolist() == [0.5, 0.0, 0.0, 0.0]
    import numpy as np
    np.testing.assert_allclose(
        out["dup_2gram_frac"].to_numpy(), [1 / 3, 0.0, 0.0, 0.0], rtol=1e-12
    )
