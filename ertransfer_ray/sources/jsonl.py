"""JSONL (newline-delimited JSON) source + sink — the interchange format
LLM-corpus releases actually ship (Dolma, The Pile, RedPajama, C4's
tensorflow-datasets export are all gzipped JSONL of one document object
per line).

Reference scope: the reference engine reads delimited text and parquet
only (readers/csv_reader.py:18-60); JSONL is a beyond-reference source
the webtext north star needs on day one.

Scale model (mirrors ``sources/warc.py``):

- **One read task per file** (``ray.data.read_binary_files``): corpus
  releases ship thousands of ~100 MB–1 GiB shards, so per-file tasks are
  the natural partitioning; parsing happens on the worker that read the
  file, no bytes reach the driver.
- **Parsing is Arrow-native**: ``pyarrow.json.read_json`` (vectorized
  C++) parses the whole decompressed file; with ``schema=`` the parse is
  PRUNED at the read (``unexpected_field_behavior="ignore"`` — fields
  outside the schema are never materialized, the JSONL analog of
  parquet column pruning).
- **Dirty corpora don't kill tasks**: a file whose bulk parse fails
  (one truncated/corrupt line in a million) falls back to per-line
  salvage — every well-formed line is still emitted, the bad ones are
  counted and dropped (``salvage=False`` to make corruption fatal).
- **The sink is idempotent**: each shard is named by a content digest
  and written via ``os.replace`` (atomic), so a re-run after partial
  failure overwrites the same shards byte-identically instead of
  duplicating data — same resumability contract as ``write_warc``.

Type fidelity: int64 / finite float64 / string / bool / null round-trip
exactly; timestamps serialize as RFC 3339 strings and parse back to
``timestamp`` under an explicit ``schema=``. Two documented edges:
binary columns are rejected with a pointer to parquet/WARC (JSON has no
bytes type; a silent base64 coercion would corrupt a round-trip), and
non-finite floats (NaN/±Inf — JSON has no literal for them) serialize
as ``null``.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa

from .warc import _GZIP_MAGIC, _iter_gzip_members


def _empty_table(schema: pa.Schema | None) -> pa.Table:
    sch = pa.schema([]) if schema is None else schema
    return pa.table({f.name: pa.array([], f.type) for f in sch})


def _parse_ndjson(data: bytes, schema: pa.Schema | None, salvage: bool):
    """One decompressed JSONL buffer → (table, n_bad_lines)."""
    import pyarrow.json as pj

    if not data.strip():
        return _empty_table(schema), 0
    if schema is not None:
        opts = pj.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="ignore"
        )
    else:
        opts = pj.ParseOptions()
    try:
        return pj.read_json(io.BytesIO(data), parse_options=opts), 0
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        if not salvage:
            raise
    # Salvage path: a corrupt line aborts Arrow's bulk parse, so recover
    # line-by-line (orjson C parser drops non-JSON lines) and re-parse the
    # survivors as one buffer — the vectorized kernel still does the
    # typing work. A line can be valid JSON yet still Arrow-invalid (a
    # type-mismatched field, a bare scalar), so when the bulk re-parse
    # fails again each survivor is parsed alone and the offenders dropped
    # — one bad line must never cost the file's other millions.
    import orjson

    good: list[bytes] = []
    bad = 0
    for line in data.split(b"\n"):
        if not line.strip():
            continue
        try:
            orjson.loads(line)
        except orjson.JSONDecodeError:
            bad += 1
            continue
        good.append(line)
    if not good:
        return _empty_table(schema), bad
    try:
        return pj.read_json(io.BytesIO(b"\n".join(good)), parse_options=opts), bad
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    kept: list[pa.Table] = []
    for line in good:
        try:
            kept.append(pj.read_json(io.BytesIO(line), parse_options=opts))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            bad += 1
    if not kept:
        return _empty_table(schema), bad
    return pa.concat_tables(kept, promote_options="permissive"), bad


def read_jsonl(paths, *, schema: pa.Schema | None = None, salvage: bool = True):
    """Read JSONL / gzipped-JSONL files into a Dataset, one task per file.

    ``schema`` prunes the parse to exactly those fields (absent fields
    become nulls, extra fields are never materialized) and pins output
    types across heterogeneous shards — pass it for any multi-file
    corpus. Without it, each file is type-inferred independently and
    Ray unions the results. gzip is detected by magic bytes per file
    (multi-member streams — the per-record-member layout crawl tooling
    writes — are handled member-by-member).
    """
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        total_bad = 0
        for raw in batch.column("bytes").to_pylist():
            if raw[:2] == _GZIP_MAGIC:
                raw = b"".join(_iter_gzip_members(raw))
            t, bad = _parse_ndjson(raw, schema, salvage)
            total_bad += bad
            if t.num_rows:
                tables.append(t)
        if total_bad:
            import logging

            logging.getLogger(__name__).warning(
                "read_jsonl: dropped %d malformed line(s)", total_bad
            )
        if not tables:
            return _empty_table(schema)
        return pa.concat_tables(tables, promote_options="permissive")

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


def serialize_jsonl(batch: pa.Table) -> bytes:
    """Table → JSONL bytes (one object per row, ``\\n``-terminated).
    orjson serializes the row dicts in C; timestamps become RFC 3339
    strings. JSON has no NaN/Infinity literal, so non-finite floats
    serialize as ``null`` and read back as null — the one LOSSY mapping
    in the family (finite floats, ints, strings, bools round-trip
    exactly; pinned by test). Deterministic for a given batch — no
    process state."""
    import orjson

    for f in batch.schema:
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
            raise TypeError(
                f"column {f.name!r} is binary: JSON has no bytes type — "
                "write binary payloads as parquet or WARC instead"
            )
    rows = batch.to_pylist()
    return b"\n".join(orjson.dumps(r, option=orjson.OPT_NAIVE_UTC) for r in rows) + (
        b"\n" if rows else b""
    )


def write_jsonl_file(path: str, batch: pa.Table) -> str:
    """Serialize one table to one ``.jsonl[.gz]`` file (gzip inferred
    from the extension). Driver-side convenience; the distributed sink
    is :func:`write_jsonl`."""
    data = serialize_jsonl(batch)
    if path.endswith(".gz"):
        data = gzip.compress(data, compresslevel=6, mtime=0)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def write_jsonl(
    ds,
    out_dir: str,
    *,
    gzip_compress: bool = True,
    rows_per_shard: int | None = None,
):
    """Distributed JSONL sink: each input batch becomes one
    ``part-<digest>.jsonl[.gz]`` shard. Shard names are content digests
    and the write is tmp-file + ``os.replace``, so re-running after a
    partial failure rewrites the same shards byte-identically (resumable,
    never one giant file). ``rows_per_shard`` bounds shard size — read
    parallelism is per-file, so shard count should cover the widest
    reader's task slots. Returns the manifest Dataset ``(path, records)``
    — consume it (O(shards)) to drive the write."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if gzip_compress else ".jsonl"

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "records": pa.array([], pa.int64())}
            )
        data = serialize_jsonl(batch)
        if gzip_compress:
            data = gzip.compress(data, compresslevel=6, mtime=0)
        digest = hashlib.sha256(data).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{digest}{ext}")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"path": [path], "records": [batch.num_rows]})

    kwargs = {} if rows_per_shard is None else {"batch_size": rows_per_shard}
    return ds.map_batches(write_block, batch_format="pyarrow", **kwargs)
