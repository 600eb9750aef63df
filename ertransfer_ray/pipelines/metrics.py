"""Metric formulas with exact reference parity (conformance layer).

- A2 matcher P/R/F1 with zero-prediction guard
  (/root/reference/methods/emtransformer/transform.py:81-92)
- A3 clustering F1 = 2·TP/(candidates+GT)
  (/root/reference/clustering/Probabilities/clustering.py:31-40,57-67)
- A1 split/blocking stats (splitters/KNN-Join/splitter.py:105-110)
- pairwise-F1 evaluator over cluster assignments vs labeled truth pairs —
  the BASELINE.json headline metric (F1 ≥ 0.99).
"""

from __future__ import annotations

import pandas as pd


def prf1(tp: int, n_predicted: int, n_truth: int) -> dict:
    """A2: precision/recall/F1 with the reference's guards."""
    precision = tp / n_predicted if n_predicted else 0.0
    recall = tp / n_truth if n_truth else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1}


def clustering_f1(tp: int, n_candidates: int, n_truth: int) -> float:
    """A3: the reference's clustering F1 (clustering.py:31-40)."""
    denom = n_candidates + n_truth
    return 2.0 * tp / denom if denom else 0.0


def split_stats(n_rows: int, n_pos: int, n_matches: int) -> dict:
    """A1: per-split entries/matches/precision/recall (splitter.py:105-110)."""
    return {
        "num_entries": n_rows,
        "num_matches": n_pos,
        "precision": n_pos / n_rows if n_rows else 0.0,
        "recall": n_pos / n_matches if n_matches else 0.0,
    }


def pairwise_f1(assignments_df: pd.DataFrame, truth_pairs_df: pd.DataFrame) -> dict:
    """Pairwise F1 of cluster assignments on LABELED pairs.

    For each labeled pair, predict 1 iff both urls share a cluster_id.
    Standard P/R/F1 over those labels — the BASELINE.json metric
    ("pairwise F1 on labeled pairs at the same blocking key").
    """
    cluster_of = dict(zip(assignments_df["url"], assignments_df["cluster_id"]))
    tp = fp = fn = tn = 0
    for row in truth_pairs_df.itertuples(index=False):
        ca = cluster_of.get(row.left_url)
        cb = cluster_of.get(row.right_url)
        pred = ca is not None and ca == cb
        if row.label == 1 and pred:
            tp += 1
        elif row.label == 1:
            fn += 1
        elif pred:
            fp += 1
        else:
            tn += 1
    m = prf1(tp, tp + fp, tp + fn)
    m.update({"tp": tp, "fp": fp, "fn": fn, "tn": tn})
    return m
