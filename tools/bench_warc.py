"""Measure the WARC source at scale: wrap the expanded documents corpus as
per-record-gzip WARC shards (the Common-Crawl layout), then time
``read_warc`` end-to-end — member-streaming gunzip + record parse + HTTP
strip + HTML text extraction + language ID — at one or more CPU counts.

Usage: python tools/bench_warc.py [factor=80] [cpus=32[,8]]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _build_shards(factor: int) -> str:
    """Expanded documents → pages-shaped rows → WARC shards (idempotent:
    digest-named shards under a factor-keyed dir, skipped when present)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ertransfer_ray.sources.expand import expand_documents
    from ertransfer_ray.sources.warc import write_warc

    out_dir = f"/tmp/graft_bench/warc_x{factor}_{os.path.basename(SF_DIR)}"
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir
    parquet = expand_documents(
        f"{SF_DIR}/documents.parquet",
        f"/tmp/graft_bench/documents_x{factor}_{os.path.basename(SF_DIR)}.parquet",
        factor=factor,
    )

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        htmls = [
            f"<html><head><title>doc {i}</title></head>"
            f"<body>\n{x}\n</body></html>".encode()
            for i, x in zip(ids, texts)
        ]
        n = len(ids)
        return pa.table(
            {
                "url": pa.array([f"http://corpus.test/doc-{i}" for i in ids]),
                "warc_ts": pa.array(
                    [1600000000_000000 + int(i) for i in ids], pa.int64()
                ).cast(pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        ) if n else pa.table({"url": pa.array([], pa.string()),
                              "warc_ts": pa.array([], pa.timestamp("us")),
                              "html": pa.array([], pa.binary())})

    # per-file tasks are the WARC read parallelism unit (real crawls ship
    # thousands of files): size shards so the widest leg has ~4 tasks/CPU
    shards = int(os.environ.get("GRAFT_WARC_SHARDS", "128"))
    ds = rd.read_parquet(parquet, columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow", batch_size=8192
    )
    n_docs = ds.count()
    manifest = write_warc(
        ds, out_dir, rows_per_shard=max(1, -(-n_docs // shards))
    ).take_all()
    print(
        f"built {len(manifest)} shards, "
        f"{sum(r['records'] for r in manifest)} records -> {out_dir}"
    )
    return out_dir


def _leg(num_cpus: int, shard_dir: str) -> dict:
    """One fresh-process read leg (subprocess so each leg owns its Ray)."""
    import json
    import subprocess

    code = f"""
import json, os, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys; sys.path.insert(0, {REPO!r})
from ertransfer_ray.sources.warc import read_warc
t0 = time.perf_counter()
n = read_warc({shard_dir!r}).count()
dt = time.perf_counter() - t0
print(json.dumps({{"docs": n, "sec": round(dt, 3)}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    import json

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    cpus = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "32").split(",")]
    shard_dir = _build_shards(factor)
    result = {"metric": "warc_read_docs_per_sec", "factor": factor,
              "shards": len(os.listdir(shard_dir))}
    for c in cpus:
        leg = min((_leg(c, shard_dir) for _ in range(2)), key=lambda r: r["sec"])
        result[f"sec_{c}"] = leg["sec"]
        result[f"docs_per_sec_{c}"] = round(leg["docs"] / leg["sec"], 1)
        result["docs"] = leg["docs"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
