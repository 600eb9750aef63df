"""Substring-dedup benchmark: stages/spandedup at multi-million-doc scale.

Expands sf0.1 documents (x640 -> 3.2M docs by default; the expansion makes
word-level variants, so exact window duplicates come from the residual
unperturbed spans — a realistic low-dup-rate corpus) and times

  - window_dup_stats (k=5): window emit (rolling-hash keys) + window-keyed
    exchange + per-doc combine;
  - drop_duplicate_spans (k=5): same exchange emitting the drop list, then
    the broadcast (or exchange) rewrite; survivor text bytes are counted
    id-free (sum of lengths per batch) so the driver never drains text.

Each leg runs in a fresh subprocess with its own ray.init(num_cpus=N).

Usage:
  python tools/bench_spans.py              # orchestrate 8- and 32-CPU legs
  python tools/bench_spans.py --arm 32     # one leg (subprocess form)
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
K = 5


def build_corpus() -> str:
    from ertransfer_ray.sources.expand import expand_documents

    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return expand_documents(f"{sf}/documents.parquet", DOCS, factor=FACTOR)


def run_arm(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ertransfer_ray.stages.spandedup import (
        drop_duplicate_spans,
        window_dup_stats,
    )

    def docs():
        return rd.read_parquet(DOCS, columns=["doc_id", "text"])

    n_docs = docs().count()  # warms page cache, untimed

    t0 = time.perf_counter()
    n_rows = dup_windows = 0
    for b in window_dup_stats(docs(), k=K).iter_batches(batch_format="pandas"):
        n_rows += len(b)
        dup_windows += int(b["dup_windows"].sum())
    stats_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    survivors = text_bytes = 0

    def sizes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "nbytes": pa.array(
                    [pc.sum(pc.binary_length(t.column("clean_text"))).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    for b in (
        drop_duplicate_spans(docs(), k=K)
        .map_batches(sizes, batch_format="pyarrow")
        .iter_batches(batch_format="pandas")
    ):
        survivors += int(b["rows"].sum())
        text_bytes += int(b["nbytes"].sum())
    rewrite_s = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "num_cpus": num_cpus, "docs": n_docs, "k": K,
        "stats_sec": stats_s, "stats_docs_per_s": round(n_docs / stats_s),
        "dup_windows": dup_windows,
        "rewrite_sec": rewrite_s,
        "rewrite_docs_per_s": round(n_docs / rewrite_s),
        "survivor_rows": survivors, "survivor_text_bytes": text_bytes,
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
        "summary": "span dedup 8->32 CPUs",
        "eff_stats": round(
            (hi["stats_docs_per_s"] / lo["stats_docs_per_s"]) / 4, 3
        ),
        "eff_rewrite": round(
            (hi["rewrite_docs_per_s"] / lo["rewrite_docs_per_s"]) / 4, 3
        ),
        "survivors_equal": (
            lo["survivor_rows"] == hi["survivor_rows"]
            and lo["survivor_text_bytes"] == hi["survivor_text_bytes"]
        ),
    }))


if __name__ == "__main__":
    main()
