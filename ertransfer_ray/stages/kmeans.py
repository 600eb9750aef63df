"""Distributed KMeans + the reference's cluster-quality diagnostics (A9).

Reference analogs: 1-D KMeans over ``prob_class1`` and 2-D over logits with
per-cluster F1/P/R printouts (/root/reference/clustering/Probabilities/
sklearn_clusters.py:3-28) and 2-cluster KMeans over pair embeddings
(/root/reference/clustering/Embeddings/embeddings.py:29-43). sklearn is
replaced by Lloyd's algorithm as streaming Dataset algebra:

- init: seeded greedy farthest-point spread over a bounded sample (the same
  scheme knn._sample_centroids uses) — deterministic, one small read.
- each iteration: ONE ``map_batches`` pass emits per-centroid sufficient
  statistics ``(count, Σx, Σ‖x‖²)`` — k·(d+2) floats per batch regardless of
  batch size — and the driver reduces those partials and moves centroids.
  No shuffle, no per-row driver work; at 100 TB each iteration is a single
  streaming scan with a tiny fixed-size reduce.
- empty clusters keep their previous centroid (deterministic, no resample).

The fit is run-to-run deterministic (seeded init, fixed iteration count
cap); float partial-sum order can differ across block layouts, which moves
centroids by ~1e-12 — boundary-point assignments are tolerance-tested, not
bit-pinned, across parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Rows → float64 matrix from either one list<float> column or several
    scalar columns. Zero-copy via the flattened list values (the to_pylist
    form built n_rows x dim Python floats per batch — the allocator
    pathology documented in blocking.attach_pair_payloads)."""
    from ..functions.arrays import list_column_to_matrix

    if len(cols) == 1 and pa.types.is_list(t.schema.field(cols[0]).type):
        return list_column_to_matrix(t.column(cols[0])).astype(np.float64, copy=False)
    return np.column_stack(
        [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
         for c in cols]
    )


@dataclass
class KMeansModel:
    centroids: np.ndarray  # (k, d)
    inertia: float
    n_iter: int
    sizes: np.ndarray  # (k,) final cluster sizes

    @property
    def k(self) -> int:
        return len(self.centroids)


def _init_centroids(ds, cols: list[str], k: int, seed: int, sample_rows: int = 4096):
    sample = []
    for b in ds.select_columns(cols).iter_batches(batch_format="pyarrow"):
        sample.append(_matrix(b, cols))
        if sum(len(s) for s in sample) >= sample_rows:
            break
    if not sample or sum(len(s) for s in sample) == 0:
        raise ValueError("cannot fit kmeans on an empty dataset")
    x = np.vstack(sample)[:sample_rows]
    rng = np.random.default_rng(seed)
    cents = [x[int(rng.integers(0, len(x)))]]
    d2 = np.sum((x - cents[0]) ** 2, axis=1)
    for _ in range(min(k, len(x)) - 1):
        cents.append(x[int(np.argmax(d2))])
        d2 = np.minimum(d2, np.sum((x - cents[-1]) ** 2, axis=1))
    cents = np.asarray(cents, dtype=np.float64)
    if len(cents) < k:  # degenerate tiny input: pad with jittered copies
        reps = cents[np.arange(k - len(cents)) % len(cents)]
        cents = np.vstack([cents, reps + 1e-9])
    return cents


def _fit_lloyd_local(x: np.ndarray, cents: np.ndarray, max_iter: int,
                     tol: float) -> KMeansModel:
    """Same Lloyd's update on a driver-resident matrix (small-input fast
    path: N distributed barriers for a few thousand rows is pure latency)."""
    k = len(cents)
    counts = np.zeros(k, dtype=np.int64)
    inertia = float("inf")
    n_iter = 0
    for it in range(max_iter):
        d = x @ cents.T - 0.5 * np.sum(cents * cents, axis=1)
        assign = np.argmax(d, axis=1)
        counts = np.bincount(assign, minlength=k)
        inertia = float(
            np.sum(x * x) - 2 * np.sum(x * cents[assign])
            + np.sum(np.sum(cents * cents, axis=1)[assign])
        )
        new = cents.copy()
        for cid in range(k):
            if counts[cid]:
                new[cid] = x[assign == cid].mean(axis=0)
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents = new
        n_iter = it + 1
        if shift < tol:
            break
    return KMeansModel(centroids=cents, inertia=inertia, n_iter=n_iter,
                       sizes=counts)


def fit_kmeans(
    ds,
    cols: str | list[str],
    k: int = 2,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 17,
    local_threshold: int = 65536,
) -> KMeansModel:
    """Lloyd's KMeans over a Dataset; ``cols`` is a list<float> embedding
    column or a list of scalar feature columns.

    Inputs at or below ``local_threshold`` rows are pulled to the driver
    once and iterated there (identical init and update rule; iterating a
    tiny Dataset pays ~0.5-1 s of scheduling per pass for no parallelism
    win). Above it, every iteration is one streaming sufficient-statistics
    pass."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    cents = _init_centroids(ds, cols, k, seed)
    proj = ds.select_columns(cols)
    n_rows = proj.count()
    if n_rows <= local_threshold:
        mats = [
            _matrix(b, cols)
            for b in proj.iter_batches(batch_format="pyarrow")
        ]
        x = np.vstack([m for m in mats if len(m)])
        return _fit_lloyd_local(x, cents, max_iter, tol)
    n_iter = 0
    inertia = float("inf")
    counts = np.zeros(k, dtype=np.int64)
    for it in range(max_iter):
        c = cents  # bind for the closure (per-iteration constant)

        def partial(t: pa.Table) -> pa.Table:
            x = _matrix(t, cols)
            if len(x) == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.list_(pa.float64())),
                                 "sq": pa.array([], pa.float64())})
            # ‖x-c‖² = ‖x‖² - 2x·c + ‖c‖²; argmin over c
            d = x @ c.T
            assign = np.argmax(d - 0.5 * np.sum(c * c, axis=1), axis=1)
            rows_n, rows_s, rows_sq, rows_id = [], [], [], []
            for cid in np.unique(assign):
                sel = x[assign == cid]
                rows_id.append(int(cid))
                rows_n.append(len(sel))
                rows_s.append(sel.sum(axis=0).tolist())
                rows_sq.append(float(np.sum(sel * sel)))
            return pa.table({"cid": pa.array(rows_id, pa.int64()),
                             "n": pa.array(rows_n, pa.int64()),
                             "s": pa.array(rows_s, pa.list_(pa.float64())),
                             "sq": pa.array(rows_sq, pa.float64())})

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        sq = 0.0
        for b in proj.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for cid, n, s, q in zip(b.column("cid").to_pylist(), b.column("n").to_pylist(),
                                    b.column("s").to_pylist(), b.column("sq").to_pylist()):
                counts[cid] += n
                sums[cid] += np.asarray(s)
                sq += q
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        # inertia w.r.t. the PRE-update centroids (what the assignment used)
        inertia = float(
            sq - 2 * np.sum(sums * cents) + np.sum(counts * np.sum(cents * cents, axis=1))
        )
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents = new
        n_iter = it + 1
        if shift < tol:
            break
    return KMeansModel(centroids=cents, inertia=inertia, n_iter=n_iter, sizes=counts)


def assign_clusters(ds, model: KMeansModel, cols: str | list[str], id_cols: list[str]):
    """(ids…, features) → (ids…, cluster). Centroids ride the closure (k·d
    floats) — broadcast-small."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    c = model.centroids

    def fn(t: pa.Table) -> pa.Table:
        x = _matrix(t, cols)
        if len(x) == 0:
            assign = np.zeros(0, dtype=np.int64)
        else:
            assign = np.argmax(x @ c.T - 0.5 * np.sum(c * c, axis=1), axis=1)
        out = {ic: t.column(ic) for ic in id_cols}
        out["cluster"] = pa.array(assign, pa.int64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def cluster_label_report(assign_ds, label_col: str = "label") -> pd.DataFrame:
    """The reference's per-cluster diagnostic (sklearn_clusters.py:10-13):
    for each cluster, F1 = 2·pos_in_cluster/(cluster_size + total_pos),
    P = pos_in_cluster/cluster_size, R = pos_in_cluster/total_pos.
    Computed with one partial-aggregate pass (no shuffle)."""
    from .groupby import partial_aggregate

    agg = partial_aggregate(
        assign_ds, "cluster",
        {"pos": (label_col, "sum"), "size": (label_col, "count")},
    )
    total_pos = float(agg["pos"].sum())
    agg = agg.sort_values("cluster", ignore_index=True)
    agg["precision"] = agg["pos"] / agg["size"]
    agg["recall"] = agg["pos"] / total_pos if total_pos else 0.0
    agg["f1"] = 2 * agg["pos"] / (agg["size"] + total_pos)
    return agg[["cluster", "size", "pos", "precision", "recall", "f1"]]
