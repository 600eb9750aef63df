"""Reference-shaped splitter workflow tests (F2/F3 contracts): dirty-ER
entity tables → labeled candidate-pair splits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.pipelines.splitter import (
    filter_valid_matches,
    label_pairs,
    merge_splits_to_matches,
    prepare_entity_table,
    run_splitter,
    stratified_split,
    topk_similarity_join,
)


def _tables(n=60, seed=11):
    """Product-shaped A/B tables (FIXTURES F2): B records are perturbed
    copies of A records; matches = identity pairs."""
    rng = np.random.default_rng(seed)
    adjectives = ["red", "blue", "fast", "slim", "bold", "calm"]
    nouns = ["widget", "gadget", "panel", "router", "sensor", "valve"]
    rows_a, rows_b, matches = [], [], []
    for i in range(n):
        name = f"{adjectives[i % 6]} {nouns[(i // 6) % 6]} {1000 + i}"
        desc = " ".join(rng.choice(["premium", "series", "model", "compact",
                                    "deluxe", "standard", "edition"], 6).tolist())
        rows_a.append({"id": i, "name": name, "description": desc, "price": f"{10 + i}.99"})
        words = (name + " " + desc).split()
        if len(words) > 4 and rng.random() < 0.5:
            del words[int(rng.integers(1, len(words)))]
        rows_b.append({"id": 1000 + i, "name": " ".join(words[:3]),
                       "description": " ".join(words[3:]), "price": f"{10 + i}.99"})
        matches.append({"tableA_id": i, "tableB_id": 1000 + i})
    return (
        rd.from_pandas(pd.DataFrame(rows_a)),
        rd.from_pandas(pd.DataFrame(rows_b)),
        pd.DataFrame(matches),
    )


def test_prepare_entity_table_agvalue():
    ds = rd.from_arrow(
        pa.table({"id": [1], "name": ["The Fast\tWidget"], "price": [None]})
    )
    out = prepare_entity_table(ds, clean=True).to_pandas()
    assert list(out.columns) == ["id", "agValue"]
    assert "fast" in out["agValue"][0] and "\t" not in out["agValue"][0]


def test_filter_valid_matches():
    m = pd.DataFrame({"tableA_id": [1, 2], "tableB_id": [10, 99]})
    out = filter_valid_matches(m, {1, 2}, {10})
    assert len(out) == 1


def test_topk_join_recovers_matches():
    a, b, matches = _tables()
    ap = prepare_entity_table(a).materialize()
    bp = prepare_entity_table(b).materialize()
    pairs = topk_similarity_join(ap, bp, k=5).to_pandas()
    got = set(zip(pairs["tableA_id"], pairs["tableB_id"]))
    truth = set(zip(matches["tableA_id"], matches["tableB_id"]))
    recall = len(got & truth) / len(truth)
    # reference tunes blocking to ≥0.90 recall (splitters/KNN-Join/settings.py:1)
    assert recall >= 0.9, recall
    # K bound respected
    per_a = pairs.groupby("tableA_id").size()
    assert per_a.max() <= 5


def test_label_and_split_deterministic():
    a, b, matches = _tables()
    ap = prepare_entity_table(a).materialize()
    bp = prepare_entity_table(b).materialize()
    pairs = topk_similarity_join(ap, bp, k=3)
    labeled = label_pairs(pairs, matches)
    s1 = stratified_split(labeled, seed=7).to_pandas().sort_values(
        ["tableA_id", "tableB_id"], ignore_index=True
    )
    s2 = stratified_split(labeled, seed=7).to_pandas().sort_values(
        ["tableA_id", "tableB_id"], ignore_index=True
    )
    assert s1.equals(s2)
    assert set(s1["split"]) <= {"train", "valid", "test"}
    assert set(s1["label"]) <= {0, 1}
    # roughly 60/20/20
    frac = s1["split"].value_counts(normalize=True)
    assert frac.get("train", 0) > 0.4


def test_run_splitter_end_to_end_and_merger():
    a, b, matches = _tables()
    res = run_splitter(a, b, matches, k=5, seed=3)
    assert res["blocking_recall"] >= 0.9
    stats = res["stats"]
    assert set(stats.columns) == {"split", "num_entries", "num_matches", "precision", "recall"}
    # A1 recall column sums to blocking recall across splits
    assert abs(stats["recall"].sum() - res["blocking_recall"]) < 1e-9
    # D2 merger round-trip: positives in splits == labeled matches found
    merged = merge_splits_to_matches(res["splits"])
    truth = set(zip(matches["tableA_id"], matches["tableB_id"]))
    assert set(zip(merged["tableA_id"], merged["tableB_id"])) <= truth
    assert len(merged) == int(res["blocking_recall"] * len(truth) + 0.5)
