import numpy as np
import pandas as pd
import pytest

from ertransfer_ray.pipelines.splitter import (
    random_split,
    sample_negative_pairs,
    threshold_grid_search,
)
from ertransfer_ray.sources.csv_normalize import (
    read_entity_csv,
    read_matches_csv,
    sniff_delimiter,
    strip_namespace_columns,
)


def test_sniff_delimiter():
    assert sniff_delimiter("id,name,price\n") == ","
    assert sniff_delimiter("id;name;price\n") == ";"
    assert sniff_delimiter("id|name|price|x\n") == "|"
    assert sniff_delimiter("id>name>price\n") == ">"


def test_read_entity_csv_semicolon_and_namespace(tmp_path):
    p = tmp_path / "tableA.csv"
    p.write_text("id;http://schema.org/name;price\n1;abc;9.5\n2;def;1.0\n")
    df = read_entity_csv(str(p))
    assert list(df.columns) == ["id", "name", "price"]
    assert len(df) == 2


def test_read_entity_csv_requires_id(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("key,name\n1,x\n")
    with pytest.raises(ValueError, match="id"):
        read_entity_csv(str(p))


def test_read_matches_renames_d1_d2(tmp_path):
    p = tmp_path / "matches.csv"
    p.write_text("D1|D2\n1|10\n2|20\n")
    df = read_matches_csv(str(p))
    assert list(df.columns) == ["tableA_id", "tableB_id"]
    assert df["tableB_id"].tolist() == [10, 20]


def test_strip_namespace_columns():
    df = pd.DataFrame({"http://x/y/title": [1], "id": [2]})
    assert list(strip_namespace_columns(df).columns) == ["title", "id"]


# ---------------------------------------------------------------------------
# random-split + negative sampling + tuner
# ---------------------------------------------------------------------------

def _fixture():
    a = pd.DataFrame({"id": range(20), "name": [f"a{i}" for i in range(20)]})
    b = pd.DataFrame({"id": range(100, 130), "name": [f"b{i}" for i in range(30)]})
    matches = pd.DataFrame({"tableA_id": [0, 1, 2], "tableB_id": [100, 101, 102]})
    return a, b, matches


def test_negative_sampling_deterministic_and_disjoint():
    a, b, matches = _fixture()
    n1 = sample_negative_pairs(sorted(a["id"]), sorted(b["id"]), matches, limit=50, seed=9)
    n2 = sample_negative_pairs(sorted(a["id"]), sorted(b["id"]), matches, limit=50, seed=9)
    assert n1.equals(n2)
    assert len(n1) == 50
    golden = set(zip(matches["tableA_id"], matches["tableB_id"]))
    assert not any((a_, b_) in golden for a_, b_ in zip(n1["tableA_id"], n1["tableB_id"]))
    assert (n1["label"] == 0).all()
    # no duplicate pairs
    assert not n1.duplicated(["tableA_id", "tableB_id"]).any()


def test_random_split_positive_roundtrip_and_integrity():
    a, b, matches = _fixture()
    res = random_split(a, b, matches, neg_pairs_limit=30, seed=4)
    pairs = res["pairs"]
    pos = pairs[pairs["label"] == 1][["tableA_id", "tableB_id"]]
    # reference asserts positives round-trip matches exactly (splitter.py:24-25)
    assert set(zip(pos["tableA_id"], pos["tableB_id"])) == set(
        zip(matches["tableA_id"], matches["tableB_id"])
    )
    assert set(pairs["split"]) <= {"train", "valid", "test"}
    assert len(pairs) == 33
    # M11: missing id hard-fails
    bad = matches.copy()
    bad.loc[0, "tableB_id"] = 999
    with pytest.raises(ValueError, match="missing ids"):
        random_split(a, b, bad)


def test_threshold_grid_search_finds_separating_theta():
    preds = pd.DataFrame(
        {
            "left_url": ["a1", "a2", "a3", "a4"],
            "right_url": ["b1", "b2", "b3", "b4"],
            "prob": [0.9, 0.85, 0.3, 0.2],
        }
    )
    truth = {("a1", "b1"), ("a2", "b2")}
    for method in ("threshold", "greedy"):
        res = threshold_grid_search(preds, truth, method=method)
        assert res["best_f1"] == 1.0
        # F1=1 exactly when 0.3 ≤ θ < 0.85 under strict prob>θ (first argmax)
        assert 0.29 <= res["best_theta"] <= 0.85
        assert len(res["per_theta"]) == 100
