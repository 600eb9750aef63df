"""Resumable, manifest-tracked partitioned output.

The reference's only resume mechanism is model-checkpoint reuse
(/root/reference/methods/emtransformer/entrypoint.py:83-109). At 100 TB the
unit of resume must be the data partition: output is laid out as one
directory per input shard, each written atomically (temp dir + rename) with
a JSON lineage manifest (shard id, input fingerprint, row count, timings).
A rerun skips every shard whose manifest exists and matches; a killed run
therefore never recomputes finished shards (FIXTURES.md invariant 3).

Sharding is BY KEY HASH (stable_hash64(key) % num_shards), not by block
order, so shard membership is independent of parallelism and block layout.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

MANIFEST_NAME = "_MANIFEST.json"


def shard_filter(shard: int, num_shards: int, key_col: str):
    """map_batches predicate keeping rows of one key-hash shard."""

    def fn(t: pa.Table) -> pa.Table:
        h = stable_hash64(t.column(key_col).to_pylist())
        return t.filter(pa.array((h % np.uint64(num_shards)) == np.uint64(shard)))

    return fn


def shard_done(
    out_dir: str,
    shard: int,
    input_fingerprint: str | None = None,
    num_shards: int | None = None,
) -> bool:
    """A shard counts as done only if its manifest matches BOTH the input
    fingerprint and (when given) the run's shard count — shard membership is
    ``hash % num_shards``, so a shard computed under a different modulus
    holds the wrong row set even for identical input."""
    mp = os.path.join(out_dir, f"shard={shard}", MANIFEST_NAME)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if input_fingerprint is not None and m.get("input_fingerprint") != input_fingerprint:
        return False
    # legacy manifests (written before the num_shards field existed) are
    # STALE whenever the shard count matters: their row sets were computed
    # under an unknown modulus, so defaulting to "matches" would keep wrong
    # shards alive across a shard-count change
    if num_shards is not None and m.get("num_shards") != num_shards:
        return False
    return True


def write_shard(
    ds,
    out_dir: str,
    shard: int,
    input_fingerprint: str = "",
    extra: dict | None = None,
    num_shards: int | None = None,
) -> dict:
    """Write one shard atomically: parquet into a temp dir, fsync manifest,
    rename into place. Returns the manifest dict."""
    final = os.path.join(out_dir, f"shard={shard}")
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    # a zero-row dataset writes no files and may not even create the dir —
    # an empty shard is still a valid, manifest-tracked outcome
    os.makedirs(tmp, exist_ok=True)
    # row count from parquet footers — no second pass over the data
    import pyarrow.parquet as pq

    n_rows = 0
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            n_rows += pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
    manifest = {
        "shard": shard,
        "rows": n_rows,
        "input_fingerprint": input_fingerprint,
        "write_seconds": round(time.perf_counter() - t0, 3),
        **({"num_shards": num_shards} if num_shards is not None else {}),
        **(extra or {}),
    }
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return manifest


def run_sharded(
    make_shard_ds,
    out_dir: str,
    num_shards: int,
    input_fingerprint: str = "",
) -> dict:
    """Drive a resumable run: for each shard, skip if its manifest matches,
    else build the shard's Dataset via ``make_shard_ds(shard, num_shards)``
    and write it atomically.

    Returns {"completed": […], "skipped": […]}.
    """
    os.makedirs(out_dir, exist_ok=True)
    # invalidate shards left by a run with a DIFFERENT shard count: their
    # row sets were computed under another modulus, so keeping them would
    # silently duplicate (or drop) rows in the combined output
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        try:
            k = int(name.split("=", 1)[1].removesuffix(".tmp"))
        except ValueError:
            continue
        stale = k >= num_shards
        mp = os.path.join(out_dir, name, MANIFEST_NAME)
        if not stale and os.path.exists(mp):
            try:
                with open(mp) as f:
                    # missing num_shards (pre-upgrade manifest) == stale:
                    # the modulus it was written under is unknown
                    stale = json.load(f).get("num_shards") != num_shards
            except (json.JSONDecodeError, OSError):
                stale = True
        if stale:
            shutil.rmtree(os.path.join(out_dir, name))
    completed, skipped = [], []
    for shard in range(num_shards):
        if shard_done(out_dir, shard, input_fingerprint, num_shards):
            skipped.append(shard)
            continue
        ds = make_shard_ds(shard, num_shards)
        write_shard(ds, out_dir, shard, input_fingerprint, num_shards=num_shards)
        completed.append(shard)
    return {"completed": completed, "skipped": skipped}


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(out_dir)):
        mp = os.path.join(out_dir, name, MANIFEST_NAME)
        if os.path.exists(mp):
            with open(mp) as f:
                out.append(json.load(f))
    return out


def fingerprint_paths(paths: list[str]) -> str:
    """Cheap input fingerprint: names + sizes + mtimes, hashed."""
    parts = []
    for p in sorted(paths):
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
    return str(stable_hash64(["|".join(parts)])[0])
