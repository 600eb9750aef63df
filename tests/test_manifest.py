"""Resume semantics: a killed run must not recompute finished shards
(FIXTURES.md invariant 3)."""

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.state.manifest import (
    fingerprint_paths,
    read_manifests,
    run_sharded,
    shard_done,
    shard_filter,
    write_shard,
)


def _pages_ds(pages_corpus):
    return rd.from_arrow(pages_corpus["pages"].select(["url", "text"]))


def test_shard_filter_partitions_completely(pages_corpus):
    ds = _pages_ds(pages_corpus)
    total = ds.count()
    n = 0
    for s in range(4):
        n += ds.map_batches(shard_filter(s, 4, "url"), batch_format="pyarrow").count()
    assert n == total


def test_write_shard_atomic_and_manifest(tmp_path, pages_corpus):
    ds = _pages_ds(pages_corpus)
    out = str(tmp_path / "out")
    os.makedirs(out)
    m = write_shard(ds.limit(50), out, 0, input_fingerprint="fp1")
    assert m["rows"] == 50
    assert shard_done(out, 0, "fp1")
    assert not shard_done(out, 0, "fp2")  # changed input → recompute
    assert not shard_done(out, 1, "fp1")
    assert read_manifests(out)[0]["shard"] == 0


def test_run_sharded_resumes(tmp_path, pages_corpus):
    ds = _pages_ds(pages_corpus)
    out = str(tmp_path / "out2")
    calls = []

    def make(shard, num_shards):
        calls.append(shard)
        return ds.map_batches(shard_filter(shard, num_shards, "url"), batch_format="pyarrow")

    r1 = run_sharded(make, out, 4, input_fingerprint="fpA")
    assert r1["completed"] == [0, 1, 2, 3]

    # simulate a killed run: delete two shards, rerun → only those recompute
    import shutil

    shutil.rmtree(os.path.join(out, "shard=2"))
    shutil.rmtree(os.path.join(out, "shard=3"))
    calls.clear()
    r2 = run_sharded(make, out, 4, input_fingerprint="fpA")
    assert r2["skipped"] == [0, 1]
    assert r2["completed"] == [2, 3]
    assert calls == [2, 3]  # finished shards were not recomputed

    # all shards together hold every row exactly once
    back = rd.read_parquet(out, file_extensions=["parquet"]).count()
    assert back == ds.count()


def test_run_sharded_invalidates_on_num_shards_change(tmp_path, pages_corpus):
    """Round-1 advice: rerunning with a different num_shards must not keep
    shards computed under the old modulus (their row sets are wrong) —
    stale shard dirs are invalidated, and the combined output holds every
    row exactly once."""
    ds = _pages_ds(pages_corpus)
    out = str(tmp_path / "out3")

    def make(shard, num_shards):
        return ds.map_batches(
            shard_filter(shard, num_shards, "url"), batch_format="pyarrow"
        )

    run_sharded(make, out, 2, input_fingerprint="fpA")
    r2 = run_sharded(make, out, 4, input_fingerprint="fpA")
    assert r2["completed"] == [0, 1, 2, 3]  # old-modulus shards recomputed
    assert r2["skipped"] == []
    back = rd.read_parquet(out, file_extensions=["parquet"]).count()
    assert back == ds.count()
    # rerun at the same count skips everything
    r3 = run_sharded(make, out, 4, input_fingerprint="fpA")
    assert r3["skipped"] == [0, 1, 2, 3]


def test_fingerprint_changes_with_input(tmp_path):
    p = tmp_path / "a.parquet"
    pa_table = pa.table({"x": [1, 2, 3]})
    import pyarrow.parquet as pq

    pq.write_table(pa_table, str(p))
    f1 = fingerprint_paths([str(p)])
    pq.write_table(pa.table({"x": [1, 2, 3, 4]}), str(p))
    os.utime(p, (1, 1))
    f2 = fingerprint_paths([str(p)])
    assert f1 != f2
