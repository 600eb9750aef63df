"""Per-dataset settings registry (reference splitters/KNN-Join/settings.py +
selection at splitter.py:175-183) and the metric/reverse knobs it drives."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ertransfer_ray.functions.simfuncs import (
    cosine_bag,
    cosine_set,
    dice,
    dice_bag,
    set_metric,
)
from ertransfer_ray.pipelines.settings import (
    DEFAULT_SETTINGS,
    dataset_key_from_path,
    select_settings,
)
from ertransfer_ray.pipelines.splitter import (
    run_splitter_for_dataset,
    topk_similarity_join,
)
from tests.test_splitter import _tables


def test_dataset_key_parsing():
    assert dataset_key_from_path("/data/d8_amazon_walmart") == "d8"
    assert dataset_key_from_path("datasets/d2_abt_buy/") == "d2"
    with pytest.raises(ValueError):
        dataset_key_from_path("/data/not_a_dataset")


def test_registry_selects_different_settings_per_dataset():
    d2 = select_settings("/data/d2_abt_buy")
    d8 = select_settings("/data/d8_amazon_walmart")
    assert d2 == dict(clean=True, reverse=False, qgram=3, multiset=True,
                      similarity="cosine", k=4)
    assert d8 == dict(clean=True, reverse=True, qgram=4, multiset=True,
                      similarity="cosine", k=2)
    d1 = select_settings("/data/d1_fodors_zagats")
    assert d1["similarity"] == "dice" and d1["k"] == 1


def test_default_mode_reverses_when_a_smaller():
    s = select_settings("/data/d8_x", default=True, table_a_rows=100, table_b_rows=900)
    assert s["reverse"] is True
    s2 = select_settings("/data/d8_x", default=True, table_a_rows=900, table_b_rows=100)
    assert s2["reverse"] is False
    assert {k: s2[k] for k in ("clean", "qgram", "multiset", "similarity", "k")} == {
        k: DEFAULT_SETTINGS[k] for k in ("clean", "qgram", "multiset", "similarity", "k")
    }


def test_unknown_dataset_falls_back_to_default():
    s = select_settings("/data/d99_unknown")
    assert {k: s[k] for k in DEFAULT_SETTINGS} == DEFAULT_SETTINGS


def test_metric_kernels_hand_computed():
    # bags: a = [x, x, y], b = [x, y, y]
    a, b = ["x", "x", "y"], ["x", "y", "y"]
    # tf vectors a=(2,1), b=(1,2): dot=4, norms sqrt(5) → cosine 4/5
    assert cosine_bag(a, b) == pytest.approx(4 / 5)
    # Σ min(tf) = 2, sizes 3+3 → dice_bag = 4/6
    assert dice_bag(a, b) == pytest.approx(2 * 2 / 6)
    # set forms: {x,y} vs {x,y} → 1.0
    assert cosine_set(a, b) == 1.0 and dice(a, b) == 1.0
    assert set_metric("dice", True) is dice_bag
    assert set_metric("cosine", False) is cosine_set
    with pytest.raises(ValueError):
        set_metric("euclid", True)


def test_reverse_join_swaps_indexed_side_not_columns():
    a, b, matches = _tables(n=24)
    from ertransfer_ray.pipelines.splitter import prepare_entity_table

    ap = prepare_entity_table(a).materialize()
    bp = prepare_entity_table(b).materialize()
    fwd = topk_similarity_join(ap, bp, k=2).to_pandas()
    rev = topk_similarity_join(ap, bp, k=2, reverse=True).to_pandas()
    assert list(rev.columns) == ["tableA_id", "tableB_id", "score"]
    # ids stay on their own sides in both orientations
    assert rev["tableA_id"].max() < 1000 <= rev["tableB_id"].min()
    assert fwd["tableA_id"].max() < 1000 <= fwd["tableB_id"].min()
    # K caps per-A fan-out forward, per-B fan-out reversed
    assert fwd.groupby("tableA_id").size().max() <= 2
    assert rev.groupby("tableB_id").size().max() <= 2


def test_write_split_statistics_format(tmp_path):
    from ertransfer_ray.pipelines.splitter import write_split_statistics

    stats = pd.DataFrame(
        {
            "split": ["test", "train"],
            "num_entries": [40, 120],
            "num_matches": [10, 30],
            "precision": [0.25, 0.25],
            "recall": [0.5, 1.5],
        }
    )
    p = str(tmp_path / "split_statistics.txt")
    write_split_statistics(p, 100, 200, 30, 1.25, stats)
    expected = (
        "Dataset statistics:\n"
        "Entries Table A: 100; Entries Table B: 200\n"
        "Num Matches: 30\n"
        "Blocking time: 1.25\n"
        "Split Statistics:\n"
        "\tNum Entries\tNum Matches\tPrecision\tRecall\n"
        "test\t40\t10\t0.25\t0.5\n"
        "train\t120\t30\t0.25\t1.5\n"
    )
    assert open(p).read() == expected


def test_deepblocker_registry_rows():
    d2 = select_settings("/data/d2_abt_buy", method="deepblocker")
    assert d2 == dict(clean=True, reverse=True, k=35)
    d6 = select_settings("/data/d6_x", method="deepblocker")
    assert d6 == dict(clean=False, reverse=False, k=63)
    # unknown dataset falls back to the deepblocker default, no qgram keys
    s = select_settings("/data/d99_y", method="deepblocker")
    assert s == dict(clean=True, reverse=False, k=5)


def test_run_splitter_deepblocker_method():
    a, b, matches = _tables(n=30)
    res = run_splitter_for_dataset(
        a, b, matches, "/data/d99_unknown", method="deepblocker",
        k=2, dim=128, dim_out=8, num_buckets=4, nprobe=2,
    )
    assert res["settings"]["k"] == 2 and "qgram" not in res["settings"]
    assert res["blocking_recall"] >= 0.8
    cols = set(res["pairs"].schema().names)
    assert {"tableA_id", "tableB_id", "label"} <= cols


def test_run_splitter_for_dataset_applies_registry():
    a, b, matches = _tables(n=30)
    res = run_splitter_for_dataset(a, b, matches, "/data/d2_abt_buy")
    assert res["settings"]["k"] == 4 and res["settings"]["qgram"] == 3
    res8 = run_splitter_for_dataset(a, b, matches, "/data/d8_amazon_walmart")
    assert res8["settings"]["reverse"] is True
    # different settings → different candidate structure (k=4 vs k=2)
    n2 = res["pairs"].count()
    n8 = res8["pairs"].count()
    assert n2 != n8
    # both keep usable blocking recall on the near-identical fixture
    assert res["blocking_recall"] >= 0.8
    assert res8["blocking_recall"] >= 0.8
