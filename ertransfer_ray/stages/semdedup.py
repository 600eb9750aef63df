"""SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means partitions the embedding space so the exact cosine pruning runs
only WITHIN clusters — the canonical way to make embedding dedup scale
past all-pairs.

Shape: the distributed Lloyd's fit (stages/kmeans, seeded deterministic)
broadcasts k·d centroid floats in the closure; one map tags every vector
with its cluster (the argmax(x·c − ½‖c‖²) rule, ties → lowest cluster —
the same formula the kmeans SQL oracle re-derives); one cluster-keyed
exchange co-locates each cluster whole, where a vectorized cosine matrix
(functions/simfuncs.cosine_matrix — float64, DuckDB-parity accumulation)
thresholds pairs and a local union-find labels each semantic group by its
smallest member id. Cross-cluster near-duplicates are NOT examined —
SemDeDup's documented approximation (they are rare by construction when
k is small relative to corpus diversity).

Contract: one cluster must fit a worker (choose ``n_clusters`` ~
corpus/expected_cluster_size, exactly as the paper sizes k); within a
cluster the work is O(|cluster|²) vectorized, never corpus².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.simfuncs import cosine_matrix
from .groupby import exchange_group_apply
from .kmeans import KMeansModel, fit_kmeans


def _group_min_labels(n: int, left: np.ndarray, right: np.ndarray,
                      ids: np.ndarray) -> np.ndarray:
    """Union-find over local edge indices → per-row the smallest member id
    of its component (singletons label themselves)."""
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(left, right):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    roots = np.fromiter((find(i) for i in range(n)), np.int64, n)
    out = np.empty(n, dtype=np.int64)
    for r in np.unique(roots):
        members = roots == r
        out[members] = ids[members].min()
    return out


def semantic_dedup(
    emb_ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    cos_threshold: float = 0.7,
    max_iter: int = 15,
    seed: int = 17,
    num_buckets: int | None = None,
    model: KMeansModel | None = None,
):
    """Dataset of (id_col, group_id) — group_id is the smallest id of the
    row's within-cluster semantic group at cosine ≥ ``cos_threshold``
    (singletons map to themselves, so every input row appears). Pass a
    prefitted ``model`` to reuse centroids (e.g. for the oracle's
    persisted side-input)."""
    from .kmeans import _matrix

    if model is None:
        model = fit_kmeans(emb_ds, vec_col, k=n_clusters, max_iter=max_iter,
                           seed=seed)
    c = np.asarray(model.centroids, dtype=np.float64)

    def tag(t: pa.Table) -> pa.Table:
        x = _matrix(t, [vec_col])
        if len(x) == 0:
            assign = np.zeros(0, dtype=np.int64)
        else:
            assign = np.argmax(x @ c.T - 0.5 * np.sum(c * c, axis=1), axis=1)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(assign, pa.int64()),
                vec_col: t.column(vec_col),
            }
        )

    tagged = emb_ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                              "group_id": pd.Series([], dtype=np.int64)})
        if df.empty or "cluster" not in df.columns:
            return empty
        outs = []
        for _, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy(np.int64)
            m = np.stack(g[vec_col].to_numpy())
            s = cosine_matrix(m, m)
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = s[iu, ju] >= cos_threshold
            labels = _group_min_labels(len(ids), iu[hit], ju[hit], ids)
            outs.append(pd.DataFrame({id_col: ids, "group_id": labels}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return exchange_group_apply(tagged, "cluster", per_cluster, num_buckets)
