"""Measure the JSONL source/sink at scale: write the expanded documents
corpus as gzipped-JSONL shards through the distributed sink, then time
``read_jsonl`` (schema-pruned Arrow parse) end-to-end at one or more CPU
counts.

Usage: python tools/bench_jsonl.py [factor=80] [cpus=32[,8]]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _build_parquet(factor: int) -> str:
    from ertransfer_ray.sources.expand import expand_documents

    return expand_documents(
        f"{SF_DIR}/documents.parquet",
        f"/tmp/graft_bench/documents_x{factor}_{os.path.basename(SF_DIR)}.parquet",
        factor=factor,
    )


def _write_leg(num_cpus: int, parquet: str, out_dir: str, shards: int) -> dict:
    code = f"""
import json, os, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys; sys.path.insert(0, {REPO!r})
import ray.data as rd
from ertransfer_ray.sources.jsonl import write_jsonl
# wipe the previous generation: block boundaries (and so shard digests)
# differ across CPU counts, and the read leg must see exactly one copy
import shutil
shutil.rmtree({out_dir!r}, ignore_errors=True)
os.makedirs({out_dir!r}, exist_ok=True)
ds = rd.read_parquet({parquet!r}, columns=["doc_id", "text"])
n = ds.count()
t0 = time.perf_counter()
m = write_jsonl(ds, {out_dir!r},
                rows_per_shard=max(1, -(-n // {shards}))).take_all()
dt = time.perf_counter() - t0
print(json.dumps({{"docs": sum(r["records"] for r in m),
                   "shards": len(m), "sec": round(dt, 3)}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _read_leg(num_cpus: int, shard_dir: str) -> dict:
    code = f"""
import json, os, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys; sys.path.insert(0, {REPO!r})
import pyarrow as pa
from ertransfer_ray.sources.jsonl import read_jsonl
sch = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
t0 = time.perf_counter()
n = read_jsonl({shard_dir!r}, schema=sch).count()
dt = time.perf_counter() - t0
print(json.dumps({{"docs": n, "sec": round(dt, 3)}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    cpus = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "32").split(",")]
    parquet = _build_parquet(factor)
    out_dir = f"/tmp/graft_bench/jsonl_x{factor}_{os.path.basename(SF_DIR)}"
    os.makedirs(out_dir, exist_ok=True)
    shards = int(os.environ.get("GRAFT_JSONL_SHARDS", "128"))
    result = {"metric": "jsonl_docs_per_sec", "factor": factor}
    for c in cpus:
        w = min((_write_leg(c, parquet, out_dir, shards) for _ in range(2)),
                key=lambda r: r["sec"])
        r = min((_read_leg(c, out_dir) for _ in range(2)),
                key=lambda r: r["sec"])
        result[f"write_sec_{c}"] = w["sec"]
        result[f"write_docs_per_sec_{c}"] = round(w["docs"] / w["sec"], 1)
        result[f"read_sec_{c}"] = r["sec"]
        result[f"read_docs_per_sec_{c}"] = round(r["docs"] / r["sec"], 1)
        result["docs"] = r["docs"]
        result["shards"] = w["shards"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
