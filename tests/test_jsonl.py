"""JSONL source/sink: round-trip fidelity, schema pruning, salvage of
corrupt lines, idempotent digest-named shards, binary rejection."""

from __future__ import annotations

import datetime
import gzip
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ertransfer_ray.sources.jsonl import (
    read_jsonl,
    serialize_jsonl,
    write_jsonl,
    write_jsonl_file,
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("score", pa.float64()),
        ("keep", pa.bool_()),
    ]
)


def _docs_table(n: int = 57) -> pa.Table:
    rng = np.random.default_rng(3)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n)),
            "text": pa.array(
                [f"doc {i} body é漢 {'x' * (i % 7)}" for i in range(n)]
            ),
            "lang": pa.array(["en", "de", None] * (n // 3) + ["en"] * (n % 3)),
            "score": pa.array(rng.random(n)),
            "keep": pa.array((np.arange(n) % 2 == 0)),
        }
    )


def _sorted_df(ds_or_table) -> pd.DataFrame:
    if isinstance(ds_or_table, pa.Table):
        df = ds_or_table.to_pandas()
    else:
        df = ds_or_table.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(tmp_path, gz):
    import ray.data as rd

    t = _docs_table()
    out = str(tmp_path / "corpus")
    manifest = write_jsonl(
        rd.from_arrow(t), out, gzip_compress=gz, rows_per_shard=20
    ).take_all()
    assert sum(m["records"] for m in manifest) == t.num_rows
    assert len(manifest) >= 3  # rows_per_shard bounded the shards
    back = read_jsonl(out, schema=DOC_SCHEMA)
    pd.testing.assert_frame_equal(_sorted_df(back), _sorted_df(t))


def test_schema_prunes_and_nulls_missing(tmp_path):
    p = str(tmp_path / "f.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "a", "extra": {"deep": [1,2]}}\n')
        f.write('{"doc_id": 2}\n')
    sch = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    df = _sorted_df(read_jsonl(p, schema=sch))
    assert list(df.columns) == ["doc_id", "text"]
    assert df["text"].tolist() == ["a", None]


def test_salvage_survives_arrow_invalid_but_valid_json(tmp_path):
    """A line can be valid JSON yet Arrow-invalid (type-mismatched field,
    bare scalar): salvage must drop it, not kill the file's task."""
    p = str(tmp_path / "typed.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": "oops-not-an-int", "text": "bad type"}\n')
        f.write("42\n")  # bare scalar: valid JSON, not a record
        f.write('{"doc_id": 3, "text": "also ok"}\n')
    sch = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    df = _sorted_df(read_jsonl(p, schema=sch))
    assert df["doc_id"].tolist() == [1, 3]


def test_nonfinite_floats_serialize_as_null():
    """JSON has no NaN/Inf literal: the documented lossy mapping is ->
    null (finite values round-trip exactly)."""
    import orjson

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3]),
            "score": pa.array([0.5, float("nan"), float("inf")]),
        }
    )
    lines = [orjson.loads(x) for x in serialize_jsonl(t).splitlines()]
    assert [r["score"] for r in lines] == [0.5, None, None]


def test_salvage_drops_only_bad_lines(tmp_path):
    p = str(tmp_path / "dirty.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": 2, "text": "trunc')  # corrupt (no close)
        f.write("\n")
        f.write('{"doc_id": 3, "text": "also ok"}\n')
    sch = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    df = _sorted_df(read_jsonl(p, schema=sch))
    assert df["doc_id"].tolist() == [1, 3]
    with pytest.raises(Exception):
        read_jsonl(p, schema=sch, salvage=False).materialize()


def test_timestamp_roundtrip(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2]),
            "ts": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
                    datetime.datetime(2025, 6, 30, 23, 59, 59),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    p = str(tmp_path / "ts.jsonl.gz")
    write_jsonl_file(p, t)
    sch = pa.schema([("doc_id", pa.int64()), ("ts", pa.timestamp("us"))])
    df = _sorted_df(read_jsonl(p, schema=sch))
    pd.testing.assert_frame_equal(df, _sorted_df(t))


def test_sink_idempotent_and_deterministic(tmp_path):
    import ray.data as rd

    t = _docs_table(30)
    out = str(tmp_path / "o")
    m1 = sorted(p["path"] for p in write_jsonl(rd.from_arrow(t), out).take_all())
    sizes1 = {p: os.path.getsize(p) for p in m1}
    m2 = sorted(p["path"] for p in write_jsonl(rd.from_arrow(t), out).take_all())
    assert m1 == m2  # digest names: rerun rewrites the same shards
    assert {p: os.path.getsize(p) for p in m2} == sizes1
    assert all(os.path.basename(p).startswith("part-") for p in m1)


def test_binary_rejected():
    t = pa.table({"doc_id": pa.array([1]), "html": pa.array([b"\x00"], pa.binary())})
    with pytest.raises(TypeError, match="binary"):
        serialize_jsonl(t)


def test_empty_and_blank_file(tmp_path):
    import ray.data as rd

    p = str(tmp_path / "empty.jsonl")
    open(p, "w").close()
    sch = pa.schema([("doc_id", pa.int64())])
    assert read_jsonl(p, schema=sch).count() == 0
    # blank gzip member stream
    pgz = str(tmp_path / "blank.jsonl.gz")
    with open(pgz, "wb") as f:
        f.write(gzip.compress(b"\n\n", mtime=0))
    assert read_jsonl(pgz, schema=sch).count() == 0
    # empty dataset through the sink -> no shards, typed manifest
    m = write_jsonl(
        rd.from_arrow(_docs_table(0)), str(tmp_path / "osink")
    ).take_all()
    assert m == []


def test_multi_member_gzip(tmp_path):
    """Per-record gzip members (the crawl-tooling layout) read as one file."""
    p = str(tmp_path / "members.jsonl.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(b'{"doc_id": 1}\n', mtime=0))
        f.write(gzip.compress(b'{"doc_id": 2}\n', mtime=0))
    sch = pa.schema([("doc_id", pa.int64())])
    df = _sorted_df(read_jsonl(p, schema=sch))
    assert df["doc_id"].tolist() == [1, 2]
