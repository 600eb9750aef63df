import numpy as np

from ertransfer_ray.functions import hashing as H


def test_stable_hash64_deterministic():
    a = H.stable_hash64(["foo", "bar", "foo"])
    b = H.stable_hash64(["foo", "bar", "foo"])
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_minhash_similar_sets_agree_more():
    docs = [
        list("abcdefghij"),
        list("abcdefghiX"),  # 9/11 jaccard ≈ 0.82
        list("zyxwvutsrq"),  # disjoint
    ]
    sig = H.minhash_signatures(docs, num_perm=256, seed=3)
    agree01 = (sig[0] == sig[1]).mean()
    agree02 = (sig[0] == sig[2]).mean()
    assert agree01 > 0.6
    assert agree02 < 0.2


def test_minhash_empty_doc():
    sig = H.minhash_signatures([[], ["a"]], num_perm=16)
    assert (sig[0] == np.uint64((1 << 32) - 1)).all()


def test_lsh_band_keys_shapes_and_prefix():
    sig = H.minhash_signatures([["a", "b"], ["a", "b"], ["q"]], num_perm=32)
    bands = H.lsh_band_keys(sig, num_bands=8)
    assert len(bands) == 8
    # identical docs share every band key
    for b in bands:
        assert b[0] == b[1]
    assert bands[0][0].startswith("mh0:")
    assert bands[7][0].startswith("mh7:")


def test_simhash_near_duplicates_close():
    a = "the quick brown fox jumps over the lazy dog extra tokens here".split()
    b = "the quick brown fox jumps over the lazy dog extra tokens there".split()
    c = "completely different words with no overlap whatsoever at all".split()
    s = H.simhash64([a, b, c])
    dab = H.hamming_distance64(s[0:1], s[1:2])[0]
    dac = H.hamming_distance64(s[0:1], s[2:3])[0]
    assert dab < dac
    assert dab <= 16


def test_rolling_fingerprint_identical_and_different():
    f = H.rolling_fingerprint(["hello world this is a document", "hello world this is a document", "zzz"])
    assert f[0] == f[1]
    assert f[0] != f[2]
