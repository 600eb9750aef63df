"""PageRank: numpy power-iteration parity, layout invariance, directed
teleport handling, validation, empty graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.stages.pagerank import pagerank


def _brute(edges: list, damping: float, iters: int, symmetric: bool) -> dict:
    if symmetric:
        edges = edges + [(b, a) for a, b in edges]
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        r = (1 - damping) / n + damping * inflow
    return {nodes[i]: r[i] for i in range(n)}


def _pairs_ds(edges: list, parts: int):
    return rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array([a for a, _ in edges], pa.int64()),
                "right_id": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(parts)


def _got(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["id"], df["rank"]))


def test_pagerank_matches_numpy_power_iteration_across_layouts():
    rng = np.random.default_rng(17)
    edges = list({(int(a), int(b)) for a, b in
                  rng.integers(0, 60, size=(400, 2)) if a != b})
    want = _brute(edges, 0.85, 10, symmetric=True)
    for parts in (2, 9):
        got = _got(pagerank(_pairs_ds(edges, parts), iterations=10))
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k


def test_pagerank_directed_sink_keeps_teleport_mass():
    # directed chain 1 -> 2 -> 3: node 1 has no in-edges and must keep
    # exactly the teleport mass each round
    edges = [(1, 2), (2, 3)]
    got = _got(pagerank(_pairs_ds(edges, 1), iterations=5, symmetric=False))
    want = _brute(edges, 0.85, 5, symmetric=False)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    assert abs(got[1] - (1 - 0.85) / 3) < 1e-12
    assert got[3] > got[2] > got[1]  # rank accumulates down the chain


def test_pagerank_hub_outranks_leaves_and_mass_conserves():
    # undirected star: the hub must dominate; total mass stays 1 under
    # symmetric edges (no dangling nodes)
    edges = [(0, i) for i in range(1, 9)]
    got = _got(pagerank(_pairs_ds(edges, 3), iterations=10))
    assert got[0] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_validation_and_empty():
    ds = _pairs_ds([(1, 2)], 1)
    with pytest.raises(ValueError):
        pagerank(ds, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(ds, iterations=0)
    empty = _pairs_ds([], 1)
    out = pagerank(empty)
    # Ray's to_pandas drops columns of an empty dataset; the schema is the
    # contract here
    assert out.count() == 0 and out.schema().names == ["id", "rank"]
