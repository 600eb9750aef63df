"""SemDeDup: brute-force parity under a pinned model, layout invariance,
cross-cluster approximation semantics, singleton coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.functions.arrays import matrix_to_list_column
from ertransfer_ray.functions.simfuncs import cosine_matrix
from ertransfer_ray.stages.kmeans import KMeansModel
from ertransfer_ray.stages.semdedup import semantic_dedup


def _emb_ds(vecs: np.ndarray, parts: int):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": matrix_to_list_column(
                    vecs.astype(np.float32), pa.float32()
                ),
            }
        )
    ).repartition(parts)


def _model(cents: np.ndarray) -> KMeansModel:
    return KMeansModel(
        centroids=cents.astype(np.float64), inertia=0.0, n_iter=0,
        sizes=np.zeros(len(cents), dtype=np.int64),
    )


def _brute(vecs, cents, tau):
    x = vecs.astype(np.float64)
    assign = np.argmax(x @ cents.T - 0.5 * np.sum(cents * cents, axis=1), axis=1)
    group = np.arange(len(x), dtype=np.int64)
    for cl in np.unique(assign):
        idx = np.flatnonzero(assign == cl)
        s = cosine_matrix(x[idx], x[idx])
        # transitive closure within the cluster
        adj = s >= tau
        comp = {int(i): {int(i)} for i in idx}
        changed = True
        while changed:
            changed = False
            for a_pos, a in enumerate(idx):
                for b_pos, b in enumerate(idx):
                    if adj[a_pos, b_pos] and comp[int(a)] is not comp[int(b)]:
                        merged = comp[int(a)] | comp[int(b)]
                        for m in merged:
                            comp[m] = merged
                        changed = True
        for i in idx:
            group[int(i)] = min(comp[int(i)])
    return group


def test_semantic_dedup_matches_bruteforce_across_layouts():
    rng = np.random.default_rng(8)
    base = rng.normal(size=(6, 16))
    # 40 vectors: jittered copies of 6 bases -> dense semantic groups
    vecs = np.vstack([
        base[i % 6] + rng.normal(scale=0.05, size=16) for i in range(40)
    ])
    cents = base[:3] * 2.0  # 3 coarse clusters, fixed (pinned model)
    want = _brute(vecs, cents, 0.9)
    for parts in (1, 5):
        got = (
            semantic_dedup(_emb_ds(vecs, parts), model=_model(cents),
                           cos_threshold=0.9)
            .to_pandas().sort_values("vec_id", ignore_index=True)
        )
        assert list(got["group_id"]) == list(want), parts
    # every input row appears exactly once, incl. singletons
    assert len(got) == 40


def test_semantic_dedup_cross_cluster_pairs_are_not_examined():
    # two identical vectors forced into DIFFERENT clusters stay ungrouped —
    # the documented SemDeDup approximation
    v = np.array([[1.0, 0.0], [1.0, 0.0]])
    cents = np.array([[1.0, 0.0], [0.9, 0.0]])
    # scores: c0: 1 - 0.5 = 0.5 ; c1: 0.9 - 0.405 = 0.495 -> both pick c0
    got = (
        semantic_dedup(_emb_ds(v, 1), model=_model(cents), cos_threshold=0.99)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    assert list(got["group_id"]) == [0, 0]  # same cluster -> grouped
    # now separate them by construction: centroids far apart, vectors near
    # different centroids but semantically identical direction
    v2 = np.array([[1.0, 0.0], [100.0, 0.0]])
    cents2 = np.array([[1.0, 0.0], [100.0, 0.0]])
    got2 = (
        semantic_dedup(_emb_ds(v2, 1), model=_model(cents2), cos_threshold=0.99)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    # cosine(v0, v1) = 1.0 but they sit in different clusters -> ungrouped
    assert list(got2["group_id"]) == [0, 1]
