"""Incremental MinHash dedup benchmark: two 200k-doc increments from the
x80-expanded sf0.1 corpus (the round-2/round-4 BASELINE.md scenario),
per-phase timings via the `timings` hook.

Usage: python tools/bench_incremental.py [num_cpus] [factor]

Fresh store each run (under /tmp); prints one JSON line:
{"num_cpus": N, "day0_secs": ..., "day1_secs": ..., "day1_phases": {...},
 "survivors_day0": ..., "survivors_day1": ..., "survivors_sha": "..."}
The sha256 over the sorted day1 survivor ids pins byte-identical results
across parallelism levels.
"""

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ertransfer_ray.sources.expand import expand_documents
    from ertransfer_ray.stages.incremental import minhash_dedup_incremental

    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = expand_documents(
        f"{sf}/documents.parquet", f"/tmp/ertransfer_bench/docs_x{factor}", factor
    )

    state = f"/tmp/ertransfer_bench/inc_state_{num_cpus}"
    shutil.rmtree(state, ignore_errors=True)

    import pyarrow.compute as pc

    def _half(parity: int):
        def fn(t):
            two = pc.cast(pc.bit_wise_and(t.column("doc_id"), 1), "int64")
            return t.filter(pc.equal(two, parity))

        return fn

    docs = rd.read_parquet(corpus, columns=["doc_id", "text"])
    # even/odd doc_id split: both halves hit every source doc's variant
    # family, so day1 has real cross-increment near-dups to find
    day0 = docs.map_batches(_half(0), batch_format="pyarrow")
    day1 = docs.map_batches(_half(1), batch_format="pyarrow")

    t0 = time.perf_counter()
    s0 = minhash_dedup_incremental(day0, state, "day0").materialize()
    day0_secs = time.perf_counter() - t0
    n0 = s0.count()

    phases: dict = {}
    t0 = time.perf_counter()
    s1 = minhash_dedup_incremental(day1, state, "day1", timings=phases)
    s1 = s1.materialize()
    day1_secs = time.perf_counter() - t0
    n1 = s1.count()

    ids = sorted(
        r["doc_id"]
        for b in s1.iter_batches(batch_format="pyarrow")
        for r in b.select(["doc_id"]).to_pylist()
    )
    sha = hashlib.sha256(json.dumps(ids).encode()).hexdigest()[:16]

    print(json.dumps({
        "num_cpus": num_cpus,
        "factor": factor,
        "day0_secs": round(day0_secs, 2),
        "day1_secs": round(day1_secs, 2),
        "day1_phases": {k: round(v, 2) for k, v in sorted(phases.items())},
        "survivors_day0": n0,
        "survivors_day1": n1,
        "survivors_sha": sha,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
