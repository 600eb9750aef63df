"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Plain run prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (the BASELINE.json two-cluster-size criterion, evidenced
by two parallelism levels per the sandbox contract — no real multi-node
cluster here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res) -> int:
    """Fully execute a query result; return its row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


#: benchmark suite: headline ER pipeline + representative operator pipelines
BENCH_QUERIES = [
    "er_documents",          # headline: 3-stage ER over documents
    "minhash_neardup_pairs",
    "pricing_summary",
    "customer_order_stats",
    "top1_order_per_customer",
    "hourly_event_stats",
    "user_sessions",
    "embedding_knn",
    "doc_quality",
]

HEADLINE = "er_documents"


def run_suite(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    from ertransfer_ray.pipelines.queries import build_queries

    qs = build_queries()
    # warm the OS page cache so we measure compute+shuffle, not first disk read
    import ray.data as rd

    for t in ("documents", "lineitem", "orders", "events", "embeddings"):
        rd.read_parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    import ray

    ray.shutdown()
    return {"timings": timings, "rows": rows}


def docs_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def main_plain():
    out = run_suite(SF_DIR, NUM_CPUS)
    total = round(sum(out["timings"].values()), 3)
    print(
        json.dumps(
            {
                "metric": "pipeline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": out["timings"],
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "headline_docs_per_sec": round(
                    docs_count(SF_DIR) / max(out["timings"][HEADLINE], 1e-9), 1
                ),
            }
        )
    )


def _fresh_run(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main_scaling():
    lo_cpus, hi_cpus = 8, 32
    lo = _fresh_run(lo_cpus)
    hi = _fresh_run(hi_cpus)
    n_docs = docs_count(SF_DIR)
    t_lo = lo["queries"][HEADLINE]
    t_hi = hi["queries"][HEADLINE]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "headline": HEADLINE,
                "sf": SF_DIR,
                "docs": n_docs,
                f"sec_{lo_cpus}": t_lo,
                f"sec_{hi_cpus}": t_hi,
                f"docs_per_sec_{lo_cpus}": round(n_docs / t_lo, 1),
                f"docs_per_sec_{hi_cpus}": round(n_docs / t_hi, 1),
                "scaling_efficiency": round(eff, 3),
                f"suite_sec_{lo_cpus}": lo["value"],
                f"suite_sec_{hi_cpus}": hi["value"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_plain()
