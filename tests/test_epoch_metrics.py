"""S7/A8: epoch eval loop, distributed prediction eval, metrics writers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.pipelines.epoch_metrics import (
    epoch_results_frame,
    eval_pair_predictions,
    run_epoch_loop,
    write_epoch_metrics,
    write_test_metrics,
)


def test_eval_pair_predictions_distributed_matches_formula(ray_session):
    # 3 TP, 1 FP, 2 FN, 4 TN → P=3/4, R=3/5
    df = pd.DataFrame(
        {
            "predictions": [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
            "label":       [1, 1, 1, 0, 1, 1, 0, 0, 0, 0],
        }
    )
    m = eval_pair_predictions(rd.from_pandas(df).repartition(3))
    assert m["precision"] == 3 / 4 and m["recall"] == 3 / 5
    p, r = 3 / 4, 3 / 5
    assert m["f1"] == 2 * p * r / (p + r)
    # zero-prediction guard (transform.py:88-92)
    z = pd.DataFrame({"predictions": [0, 0], "label": [1, 0]})
    mz = eval_pair_predictions(rd.from_pandas(z))
    assert mz == {"precision": 0.0, "recall": 0.0, "f1": 0.0}


def test_run_epoch_loop_tracks_best_and_appends_last():
    valid_f1s = [0.3, 0.8, 0.6]
    tests_seen = []

    def train_step(epoch):
        tests_seen.append(epoch)

    it = iter(valid_f1s)

    def eval_valid():
        return next(it)

    def eval_test():
        e = len(tests_seen) - 1
        return {"f1": 0.1 * e, "precision": 0.2 * e, "recall": 0.3 * e}

    results = run_epoch_loop(3, train_step, eval_valid, [eval_test])
    assert tests_seen == [0, 1, 2]
    assert len(results) == 4  # 3 epochs + best row
    # best valid F1 was epoch 1 → its row is appended last
    assert results[-1][0] == 1 and results[-1] == results[1]
    frame = epoch_results_frame(results, ["t0"])
    assert list(frame.columns) == [
        "epoch", "f1_t0", "precision_t0", "recall_t0",
        "train_time", "valid_time", "test_time",
    ]


def test_run_epoch_loop_budget_break():
    t = [0.0]

    def clock():
        return t[0]

    def train_step(epoch):
        t[0] += 100.0  # each epoch takes 100s

    results = run_epoch_loop(
        10, train_step, lambda: 0.5, [], budget_s=250.0, clock=clock
    )
    # epochs 0,1 fit; after epoch 2 total 300 + next 100 > 250 → break at the
    # first epoch whose completion projects over budget
    n_epochs = len(results) - 1
    assert n_epochs == 2  # broke after the 2nd epoch (200 + 100 > 250)


def test_writers_roundtrip(tmp_path):
    results = [
        [0, 0.5, 0.6, 0.4, 1.0, 0.1, 0.2],
        [1, 0.7, 0.8, 0.6, 1.1, 0.1, 0.2],
        [1, 0.7, 0.8, 0.6, 1.1, 0.1, 0.2],
    ]
    p = write_epoch_metrics(str(tmp_path), results, ["dirty"])
    back = pd.read_csv(p)
    assert back.shape == (3, 7) and back["f1_dirty"].iloc[1] == 0.7
    p2 = write_test_metrics(
        str(tmp_path), "dirty", {"f1": 0.7, "precision": 0.8, "recall": 0.6},
        preprocess_time=1.5, train_time=2.5, eval_time=0.5, train_size=100,
    )
    b2 = pd.read_csv(p2)
    assert list(b2.columns) == [
        "f1", "precision", "recall", "preprocess_time", "train_time",
        "eval_time", "train_size",
    ]
    assert b2["train_size"].iloc[0] == 100
