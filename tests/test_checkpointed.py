"""Kill/rerun semantics of the checkpointed ER pipeline (FIXTURES inv. 3)."""

import os
import shutil

import pyarrow.parquet as pq

from ertransfer_ray.pipelines.checkpointed import read_clusters, run_er_checkpointed
from ertransfer_ray.pipelines.er_pipeline import ERConfig
from ertransfer_ray.pipelines.metrics import pairwise_f1


def _write_pages(pages_corpus, tmp_path) -> str:
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages_corpus["pages"], p)
    return p


def test_checkpointed_run_and_full_resume(tmp_path, pages_corpus):
    inp = _write_pages(pages_corpus, tmp_path)
    wd = str(tmp_path / "wd")
    r1 = run_er_checkpointed(inp, wd, ERConfig(), num_shards=3)
    assert set(r1["stages"].values()) == {"computed"}

    # clusters correct
    assign = read_clusters(wd).to_pandas()
    m = pairwise_f1(assign, pages_corpus["truth_pairs"].to_pandas())
    assert m["f1"] >= 0.99, m

    # full rerun: everything resumed, nothing recomputed
    r2 = run_er_checkpointed(inp, wd, ERConfig(), num_shards=3)
    assert set(r2["stages"].values()) == {"resumed"}
    assert r2["metrics"]["block_s"] < r1["metrics"]["block_s"]


def test_checkpointed_partial_resume_after_kill(tmp_path, pages_corpus):
    inp = _write_pages(pages_corpus, tmp_path)
    wd = str(tmp_path / "wd2")
    run_er_checkpointed(inp, wd, ERConfig(), num_shards=3)

    # simulate a crash after stage 1: later stage outputs lost
    shutil.rmtree(os.path.join(wd, "predictions"))
    shutil.rmtree(os.path.join(wd, "clusters"))
    r = run_er_checkpointed(inp, wd, ERConfig(), num_shards=3)
    assert r["stages"]["normalized"] == "resumed"
    assert r["stages"]["pairs"] == "resumed"
    assert r["stages"]["predictions"] == "computed"
    assert r["stages"]["clusters"] == "computed"

    assign = read_clusters(wd).to_pandas()
    m = pairwise_f1(assign, pages_corpus["truth_pairs"].to_pandas())
    assert m["f1"] >= 0.99, m


def test_checkpointed_input_change_recomputes(tmp_path, pages_corpus):
    inp = _write_pages(pages_corpus, tmp_path)
    wd = str(tmp_path / "wd3")
    run_er_checkpointed(inp, wd, ERConfig(), num_shards=2)
    # rewrite input with different mtime/size → normalize recomputes
    tbl = pq.read_table(inp)
    pq.write_table(tbl.slice(0, tbl.num_rows - 4), inp)
    os.utime(inp, (1, 1))
    r = run_er_checkpointed(inp, wd, ERConfig(), num_shards=2)
    assert r["stages"]["normalized"] == "computed"


def test_kill_during_stage2_write_is_atomic(tmp_path, pages_corpus):
    """VERDICT r3 item 8: SIGKILL-equivalent death DURING stage 2's shard
    write (tmp dir fully written — manifest included — but not yet renamed
    into place, then further corrupted to mimic a mid-parquet-write kill)
    must leave the stage not-done; the resume recomputes exactly that stage
    and lands on cluster output identical to an uninterrupted run."""
    import subprocess
    import sys

    inp = _write_pages(pages_corpus, tmp_path)
    wd = str(tmp_path / "wd_kill")

    script = tmp_path / "killer.py"
    script.write_text(
        """
import os, sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ertransfer_ray.state.manifest as M

real_rename = os.rename
def kill_rename(src, dst):
    # die at the atomicity boundary: predictions tmp written, not renamed
    if "predictions" in str(src) and str(src).endswith(".tmp"):
        os._exit(9)
    real_rename(src, dst)
M.os.rename = kill_rename

from ertransfer_ray.pipelines.checkpointed import run_er_checkpointed
from ertransfer_ray.pipelines.er_pipeline import ERConfig
run_er_checkpointed(sys.argv[1], sys.argv[2], ERConfig(), num_shards=3)
"""
    )
    proc = subprocess.run(
        [sys.executable, str(script), inp, wd],
        cwd="/root/repo", capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 9, proc.stderr[-2000:]

    preds_dir = os.path.join(wd, "predictions")
    tmp_shard = os.path.join(preds_dir, "shard=0.tmp")
    final_shard = os.path.join(preds_dir, "shard=0")
    assert os.path.exists(tmp_shard)      # partial write left behind
    assert not os.path.exists(final_shard)  # never renamed into place
    # a manifest INSIDE an un-renamed tmp dir must not count as done
    from ertransfer_ray.state.manifest import shard_done
    assert not shard_done(preds_dir, 0, num_shards=1)

    # mimic a harsher mid-parquet-write kill: truncate one tmp parquet file
    for f in os.listdir(tmp_shard):
        if f.endswith(".parquet"):
            p = os.path.join(tmp_shard, f)
            with open(p, "r+b") as fh:
                fh.truncate(max(os.path.getsize(p) // 2, 1))
            break

    # resume in a new "process" (fresh run): earlier stages skip, the
    # killed stage recomputes from its wiped tmp
    r = run_er_checkpointed(inp, wd, ERConfig(), num_shards=3)
    assert r["stages"]["normalized"] == "resumed"
    assert r["stages"]["pairs"] == "resumed"
    assert r["stages"]["predictions"] == "computed"
    assert r["stages"]["clusters"] == "computed"
    assert not os.path.exists(tmp_shard)  # partial state wiped by the rewrite

    # identical clusters to an uninterrupted run
    wd_ref = str(tmp_path / "wd_ref")
    run_er_checkpointed(inp, wd_ref, ERConfig(), num_shards=3)
    got = read_clusters(wd).to_pandas().sort_values("url", ignore_index=True)
    want = read_clusters(wd_ref).to_pandas().sort_values("url", ignore_index=True)
    assert got.equals(want)
