"""SURVEY §2.10 step contract: PipelineStage registry + the three-step CLI
(splitter → matcher → clustering) over a bundled dataset fixture, with the
reference's file formats byte-checked
(/root/reference/splitters/KNN-Join/splitter.py:190-207 split stats,
methods/magellan/transform.py:15-17 predictions,
clustering/Probabilities/entrypoint.py:81-106 report)."""

import os

import numpy as np
import pandas as pd
import pytest

from ertransfer_ray.__main__ import main
from ertransfer_ray.pipelines.steps import (
    PipelineStage,
    available_stages,
    get_stage,
    register_stage,
)


def _write_bundle(d, n=60, seed=11):
    rng = np.random.default_rng(seed)
    adjectives = ["red", "blue", "fast", "slim", "bold", "calm"]
    nouns = ["widget", "gadget", "panel", "router", "sensor", "valve"]
    rows_a, rows_b, matches = [], [], []
    for i in range(n):
        name = f"{adjectives[i % 6]} {nouns[(i // 6) % 6]} {1000 + i}"
        desc = " ".join(rng.choice(["premium", "series", "model", "compact",
                                    "deluxe", "standard", "edition"], 6).tolist())
        rows_a.append({"id": i, "name": name, "description": desc,
                       "price": f"{10 + i}.99"})
        words = (name + " " + desc).split()
        if len(words) > 4 and rng.random() < 0.5:
            del words[int(rng.integers(1, len(words)))]
        rows_b.append({"id": 1000 + i, "name": " ".join(words[:3]),
                       "description": " ".join(words[3:]),
                       "price": f"{10 + i}.99"})
        matches.append({"tableA_id": i, "tableB_id": 1000 + i})
    pd.DataFrame(rows_a).to_csv(os.path.join(d, "tableA.csv"), index=False)
    pd.DataFrame(rows_b).to_csv(os.path.join(d, "tableB.csv"), index=False)
    pd.DataFrame(matches).to_csv(os.path.join(d, "matches.csv"), index=False)


def test_registry_resolves_and_rejects():
    assert {"splitter", "matcher", "clustering"} <= set(available_stages())
    assert isinstance(get_stage("splitter")(), PipelineStage)
    with pytest.raises(KeyError, match="unknown stage"):
        get_stage("no-such-stage")


def test_user_stage_registration():
    @register_stage
    class EchoStage:
        name = "echo-stage"

        def run(self, input_path, output_dir=None, **options):
            return {"input": input_path, **options}

    got = get_stage("echo-stage")().run("/x", foo=1)
    assert got == {"input": "/x", "foo": 1}
    assert isinstance(EchoStage(), PipelineStage)


def test_three_step_cli_end_to_end(tmp_path):
    ds_dir = tmp_path / "d99_products"
    ds_dir.mkdir()
    _write_bundle(str(ds_dir))

    # ---- splitter ----------------------------------------------------
    split_dir = tmp_path / "kj_split"
    main(["splitter", str(ds_dir), str(split_dir), "-d", "-s", "3"])
    for f in ("train.csv", "valid.csv", "test.csv", "tableA.csv",
              "tableB.csv", "matches.csv", "split_statistics.txt"):
        assert (split_dir / f).exists(), f

    lines = (split_dir / "split_statistics.txt").read_text().splitlines()
    assert lines[0] == "Dataset statistics:"
    assert lines[1] == "Entries Table A: 60; Entries Table B: 60"
    assert lines[2] == "Num Matches: 60"
    assert lines[3].startswith("Blocking time: ")
    assert lines[4] == "Split Statistics:"
    assert lines[5] == "\tNum Entries\tNum Matches\tPrecision\tRecall"
    assert len(lines) == 9  # one row per split
    splits_seen = sorted(ln.split("\t")[0] for ln in lines[6:9])
    assert splits_seen == ["test", "train", "valid"]

    train = pd.read_csv(split_dir / "train.csv")
    assert list(train.columns) == [
        "tableA_id", "tableA_name", "tableA_description", "tableA_price",
        "tableB_id", "tableB_name", "tableB_description", "tableB_price",
        "label",
    ]
    assert set(train["label"].unique()) <= {0, 1}

    # ---- matcher ------------------------------------------------------
    match_dir = tmp_path / "match_out"
    main(["matcher", str(split_dir), str(match_dir), "-e", "3"])
    preds_path = match_dir / "predictions_kj_split.csv"
    metrics_path = match_dir / "metrics_kj_split.csv"
    assert preds_path.exists() and metrics_path.exists()

    preds = pd.read_csv(preds_path)
    assert list(preds.columns) == ["tableA_id", "tableB_id", "label", "prob_class1"]
    test_rows = pd.read_csv(split_dir / "test.csv")
    assert len(preds) == len(test_rows)
    assert preds["prob_class1"].between(0, 1).all()

    metrics = pd.read_csv(metrics_path)
    assert list(metrics.columns) == [
        "f1", "precision", "recall",
        "preprocess_time", "train_time", "eval_time", "train_size",
    ]
    assert metrics["f1"][0] >= 0.8  # trained matcher separates the fixture
    assert metrics["train_size"][0] == len(pd.read_csv(split_dir / "train.csv"))

    # -pt reuses the stored model (S9): zero train time, identical preds
    main(["matcher", str(split_dir), str(match_dir), "-pt"])
    metrics2 = pd.read_csv(metrics_path)
    assert metrics2["train_time"][0] == 0.0
    preds2 = pd.read_csv(preds_path)
    pd.testing.assert_frame_equal(preds, preds2)

    # -if vt folds valid+test into train (transform.py:35-41): train_size
    # grows to the whole candidate set
    match_full = tmp_path / "match_full"
    main(["matcher", str(split_dir), str(match_full), "-e", "1", "-if", "vt"])
    m_full = pd.read_csv(match_full / "metrics_kj_split.csv")
    n_all = sum(
        len(pd.read_csv(split_dir / f"{s}.csv")) for s in ("train", "valid", "test")
    )
    assert m_full["train_size"][0] == n_all

    # --weights swaps in a stored artifact and skips training (T9)
    match_swap = tmp_path / "match_swap"
    main(["matcher", str(split_dir), str(match_swap),
          "--weights", str(match_dir / "model.json")])
    m_swap = pd.read_csv(match_swap / "metrics_kj_split.csv")
    assert m_swap["train_time"][0] == 0.0
    preds_swap = pd.read_csv(match_swap / "predictions_kj_split.csv")
    pd.testing.assert_frame_equal(preds, preds_swap)

    # ---- clustering ---------------------------------------------------
    main(["clustering", str(preds_path), "-d"])
    report = (match_dir / "kj_split_clustering.txt").read_text()
    rlines = report.splitlines()
    assert rlines[0] == "Unique Mapping Clustering"
    assert rlines[1] == "F1\tP\tR\tCluster Time\tTune Time\tThreshold"
    assert "Exact Clustering" in rlines
    assert sum(ln.startswith("Average F1 +- STD: ") for ln in rlines) == 2
    # default mode: threshold column is the fixed 0.5
    assert rlines[2].split("\t")[5] == "0.5"
    assert (match_dir / "kj_split_histogram.txt").exists()


def test_normalize_stage_canonicalizes_messy_bundle(tmp_path):
    """The normanizer step: pipe-delimited per-dataset file names + gt.csv
    with D1/D2 columns → the canonical comma bundle, then the splitter runs
    on the result (the reference's normanizer → splitter chain)."""
    raw = tmp_path / "d2_abt_buy"
    raw.mkdir()
    (raw / "abt.csv").write_text(
        "id|name|price\n0|red widget 1000|9.99\n1|blue gadget 1001|19.99\n"
    )
    (raw / "buy.csv").write_text(
        "id|name|price\n100|red widget 1000|9.99\n101|blue gadget 1001|19.99\n"
    )
    (raw / "gt.csv").write_text("D1|D2\n0|100\n1|101\n")

    out = tmp_path / "canon"
    main(["normalize", str(raw), str(out)])
    for f in ("tableA.csv", "tableB.csv", "matches.csv"):
        assert (out / f).exists(), f
    # sources untouched (divergence from the reference's unlink, by design)
    assert (raw / "abt.csv").exists()

    a = pd.read_csv(out / "tableA.csv")
    assert list(a.columns) == ["id", "name", "price"]  # comma-canonical
    m = pd.read_csv(out / "matches.csv")
    assert list(m.columns) == ["tableA_id", "tableB_id"]

    # composes with the splitter step
    split_dir = tmp_path / "split"
    main(["splitter", str(out), str(split_dir), "-d"])
    assert (split_dir / "split_statistics.txt").exists()


def test_merger_stage_round_trips_matches(tmp_path):
    """merger (splits → matches.csv) after the splitter must recover exactly
    the labeled positives — the reference's D2 round-trip invariant
    (merger.py:27-38 + random-split splitter assert)."""
    ds_dir = tmp_path / "d98_products"
    ds_dir.mkdir()
    _write_bundle(str(ds_dir))
    split_dir = tmp_path / "split"
    main(["splitter", str(ds_dir), str(split_dir), "-d"])

    out = tmp_path / "merged"
    main(["merger", str(split_dir), str(out)])
    merged = pd.read_csv(out / "matches.csv")
    assert list(merged.columns) == ["tableA_id", "tableB_id"]
    truth = pd.read_csv(ds_dir / "matches.csv")
    truth_set = set(zip(truth["tableA_id"], truth["tableB_id"]))
    got_set = set(zip(merged["tableA_id"], merged["tableB_id"]))
    # merged positives ⊆ golden truth; count = blocking-recall share
    assert got_set <= truth_set
    labeled_pos = sum(
        pd.read_csv(split_dir / f"{s}.csv")["label"].sum()
        for s in ("train", "valid", "test")
    )
    assert len(got_set) == labeled_pos


def test_run_er_cli_computes_then_resumes(tmp_path, pages_dir):
    """`python -m ertransfer_ray run-er` — the ray-job-submit entrypoint —
    runs the checkpointed flagship end-to-end, and a resubmitted run
    resumes every stage from its manifest (BASELINE.json north_rule:
    resumable `ray job submit` runs)."""
    from ertransfer_ray.pipelines.checkpointed import read_clusters

    pages = os.path.join(pages_dir, "pages.parquet")
    workdir = str(tmp_path / "er_run")
    r1 = main(["run-er", pages, workdir, "--shards", "2"])
    assert set(r1["stages"]) == {"normalized", "pairs", "predictions", "clusters"}
    assert all(v == "computed" for v in r1["stages"].values())

    clusters = read_clusters(workdir).to_pandas()
    assert len(clusters) > 0
    assert {"url", "cluster_id"} <= set(clusters.columns)
    # clustered urls are real input urls, each assigned exactly once
    # (singletons with no above-threshold edge carry no row by contract)
    pages_df = pd.read_parquet(pages, columns=["url"])
    assert set(clusters["url"]) <= set(pages_df["url"])
    assert clusters["url"].is_unique
    assert clusters["cluster_id"].nunique() < len(clusters)

    r2 = main(["run-er", pages, workdir, "--shards", "2"])
    assert all(v == "resumed" for v in r2["stages"].values())
