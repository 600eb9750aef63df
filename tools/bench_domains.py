"""Host-level operator benchmark: stages/domains at multi-million-doc scale.

Expands sf0.1 documents (x640 -> 3.2M docs by default), synthesizes the
skewed host distribution from pipelines/queries._gen_host_pages (3 hot
domains ~10% each, a 38-host cold tail, per-doc singleton spam hosts),
then times

  - host_stats: map-side url canonicalize + host extract + token count,
    per-batch partials, bucketed combine (|hosts| output rows);
  - host_filter: the full domain filter (blocklist + min_docs floor +
    single-domain share cap), survivors counted end to end.

Each arm runs in a fresh subprocess with its own ray.init(num_cpus=N) so
the 8- vs 32-CPU legs are independent processes (the scaling-evidence
protocol from bench.py --scaling).

Usage:
  python tools/bench_domains.py              # orchestrate 8- and 32-CPU legs
  python tools/bench_domains.py --arm 32     # one leg (subprocess form)

Prints one JSON line per leg and a summary line in orchestrator mode.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FACTOR = int(os.environ.get("GRAFT_EXPAND_FACTOR", "640"))
DOCS = f"/tmp/graft_bench/documents_x{FACTOR}_sf0.1.parquet"


def build_corpus() -> str:
    from ertransfer_ray.sources.expand import expand_documents

    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return expand_documents(f"{sf}/documents.parquet", DOCS, factor=FACTOR)


def run_arm(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ertransfer_ray.pipelines.queries import _gen_host_pages
    from ertransfer_ray.stages.domains import host_filter, host_stats

    def pages():
        return rd.read_parquet(
            DOCS, columns=["doc_id", "text"]
        ).map_batches(_gen_host_pages, batch_format="pyarrow")

    n_docs = rd.read_parquet(DOCS).count()  # warms page cache, untimed

    t0 = time.perf_counter()
    n_hosts = 0
    for b in host_stats(pages()).iter_batches(batch_format="pyarrow"):
        n_hosts += b.num_rows
    stats_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    survivors = 0
    filtered = host_filter(
        pages(), blocklist=("site7.example",), min_docs=2, max_share=0.08
    )
    # count survivors without draining full-text rows through the driver
    # (a sink would be write_parquet; the id-only projection keeps the
    # measurement about the operator, not the driver's single-thread drain)
    for b in filtered.select_columns(["doc_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        survivors += b.num_rows
    filter_s = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "num_cpus": num_cpus, "docs": n_docs, "hosts": n_hosts,
        "stats_sec": stats_s, "stats_docs_per_s": round(n_docs / stats_s),
        "filter_sec": filter_s, "filter_docs_per_s": round(n_docs / filter_s),
        "survivors": survivors,
    }))
    ray.shutdown()


def main() -> None:
    if "--arm" in sys.argv:
        run_arm(int(sys.argv[sys.argv.index("--arm") + 1]))
        return
    build_corpus()
    legs = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", str(cpus)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        legs[cpus] = json.loads(line)
        print(line, flush=True)
    lo, hi = legs[8], legs[32]
    print(json.dumps({
        "summary": "host_filter 8->32 CPUs",
        "eff_filter": round(
            (hi["filter_docs_per_s"] / lo["filter_docs_per_s"]) / 4, 3
        ),
        "eff_stats": round(
            (hi["stats_docs_per_s"] / lo["stats_docs_per_s"]) / 4, 3
        ),
        "survivors_equal": lo["survivors"] == hi["survivors"],
    }))


if __name__ == "__main__":
    main()
