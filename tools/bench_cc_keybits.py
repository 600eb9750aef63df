"""Interleaved best-of-3 comparison of connected_components key widths
(VERDICT r3 item 6): 64-bit vs 128-bit node keys on the 400-chain x
diameter-1000 fixture, both arms alternated within ONE host window so the
premium of the wide keys is measured apples-to-apples.

Usage: python tools/bench_cc_keybits.py  [env RAY_GRAFT_CPUS=32]
Prints one JSON line; record the result in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ertransfer_ray.stages.clustering import connected_components

CHAINS = 400
DIAM = 1000


def build_edges():
    c = np.repeat(np.arange(CHAINS), DIAM - 1)
    i = np.tile(np.arange(DIAM - 1), CHAINS)
    left = np.char.add(
        np.char.add("n", np.char.zfill(c.astype(str), 4)),
        np.char.add("-", np.char.zfill(i.astype(str), 4)),
    )
    right = np.char.add(
        np.char.add("n", np.char.zfill(c.astype(str), 4)),
        np.char.add("-", np.char.zfill((i + 1).astype(str), 4)),
    )
    return pd.DataFrame({"left_url": left, "right_url": right})


def run_once(edges_df, bits: int) -> float:
    ds = rd.from_pandas(edges_df)
    t0 = time.perf_counter()
    out = connected_components(
        ds, key_bits=bits, driver_threshold=1000
    ).materialize()
    wall = time.perf_counter() - t0
    n_comp = out.to_pandas()["cluster_id"].nunique()
    assert n_comp == CHAINS, f"key_bits={bits}: {n_comp} components"
    return wall


def main():
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    edges = build_edges()
    times = {64: [], 128: []}
    run_once(edges, 64)  # warm the session (actors, import state)
    for _ in range(3):
        for bits in (64, 128):
            times[bits].append(round(run_once(edges, bits), 2))
    best64, best128 = min(times[64]), min(times[128])
    print(json.dumps({
        "fixture": f"{CHAINS} chains x diameter {DIAM}",
        "num_cpus": cpus,
        "runs_64": times[64], "runs_128": times[128],
        "best_64": best64, "best_128": best128,
        "wide_key_premium": round(best128 / best64, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
