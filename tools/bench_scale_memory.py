"""Memory-bounded streaming evidence: run the flagship ER headline on a
LARGER corpus (default x2560 = 12.8M docs, 2x the published 6.4M headline)
at 32 CPUs while sampling host memory and the Ray object store, then report
throughput plus peak usage.

Why this matters at 100 TB: the pipeline must stream — no stage may hold
the corpus in heap or object store at once. Peak object-store usage far
below the corpus size (and flat across corpus doublings) is the evidence
that blocks flow through with backpressure instead of accumulating.

Sampling is system-level (this host runs nothing else during the leg):
  - /proc/meminfo MemAvailable delta from the pre-run baseline -> peak
    process heap + page cache attributable to the run (upper bound);
  - /dev/shm statvfs -> Ray object store usage (plasma is shm-backed);
  - /tmp/ray/session_*/ spill directory size -> bytes spilled to disk
    (nonzero spill with a bounded shm peak = backpressure working).

Usage: python tools/bench_scale_memory.py [factor=2560] [cpus=32]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _meminfo_available() -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                return int(line.split()[1]) * 1024
    return 0


def _shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bavail) * st.f_frsize


def _spill_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


class _Sampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.stop_flag = threading.Event()
        self.base_avail = _meminfo_available()
        self.base_shm = _shm_used()
        self.peak_mem_delta = 0
        self.peak_shm_delta = 0
        self.peak_spill = 0

    def run(self):
        while not self.stop_flag.is_set():
            self.peak_mem_delta = max(
                self.peak_mem_delta, self.base_avail - _meminfo_available()
            )
            self.peak_shm_delta = max(self.peak_shm_delta, _shm_used() - self.base_shm)
            self.peak_spill = max(self.peak_spill, _spill_bytes())
            self.stop_flag.wait(self.interval)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ertransfer_ray.sources.expand import expand_documents

    path = expand_documents(
        f"{SF_DIR}/documents.parquet",
        f"/tmp/graft_bench/documents_x{factor}_{os.path.basename(SF_DIR)}.parquet",
        factor=factor,
    )
    corpus_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(path, "*.parquet"))
    )

    sampler = _Sampler()
    sampler.start()
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--headline", path],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    sampler.stop_flag.set()
    sampler.join()
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit(proc.returncode)
    leg = json.loads(proc.stdout.strip().splitlines()[-1])

    gib = 1024.0**3
    print(
        json.dumps(
            {
                "metric": "headline_memory_bounded",
                "docs": leg["docs"],
                "sec": leg["sec"],
                "docs_per_sec": round(leg["docs"] / leg["sec"], 1),
                "cluster_rows": leg["rows"],
                "num_cpus": cpus,
                "corpus_parquet_gib": round(corpus_bytes / gib, 2),
                "peak_mem_delta_gib": round(sampler.peak_mem_delta / gib, 2),
                "peak_object_store_gib": round(sampler.peak_shm_delta / gib, 2),
                "spilled_gib": round(sampler.peak_spill / gib, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
