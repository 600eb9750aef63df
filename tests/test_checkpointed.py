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
