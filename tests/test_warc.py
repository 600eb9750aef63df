"""WARC source/sink: spec-conformant parse, round-trip fidelity at every
layer (plain / per-record gzip / whole-stream gzip), reader obligations
(skip non-page records, strip HTTP headers, survive truncation), idempotent
distributed sink, and end-to-end run_er over read_warc."""

import gzip
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.sources.warc import (
    iter_warc_records,
    pages_from_warc_bytes,
    read_warc,
    serialize_warc_records,
    write_warc,
    write_warc_file,
)


def _pages_table():
    from ertransfer_ray.sources.pages import generate_pages

    return generate_pages(num_entities=20, max_dups=3, seed=7)["pages"]


def _sorted_pd(t: pa.Table) -> pd.DataFrame:
    return (
        t.select(["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_file(tmp_path, ray_session, gz):
    pages = _pages_table()
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc_file(path, pages)
    got = read_warc(path, with_text=False).take_all()
    got = pa.Table.from_pylist(got)
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(pages))


def test_roundtrip_with_text_matches_generator(tmp_path, ray_session):
    pages = _pages_table()
    path = str(tmp_path / "a.warc.gz")
    write_warc_file(path, pages)
    got = pa.Table.from_pylist(read_warc(path).take_all())
    assert set(got.schema.names) == {"url", "warc_ts", "html", "text", "lang"}
    eng = got.select(["url", "text"]).to_pandas().sort_values(
        "url", ignore_index=True
    )
    ref = pages.select(["url", "text"]).to_pandas().sort_values(
        "url", ignore_index=True
    )
    # the input_hint invariant: extracted text byte-identical to the column
    pd.testing.assert_frame_equal(eng, ref)


def test_whole_stream_gzip_and_plain_concat(tmp_path, ray_session):
    """A single-member gzip of the WHOLE plain stream (some archivers do
    this instead of per-record members) must parse identically."""
    pages = _pages_table()
    plain = serialize_warc_records(pages, gzip_per_record=False)
    path = str(tmp_path / "whole.warc.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(plain, mtime=0))
    got = pa.Table.from_pylist(read_warc(path, with_text=False).take_all())
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(pages))


def _raw_record(wtype: str, extra: str, content: bytes) -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n{extra}"
        f"Content-Length: {len(content)}\r\n\r\n"
    ).encode() + content + b"\r\n\r\n"


def test_skips_non_page_records_and_takes_resource_whole():
    info = _raw_record("warcinfo", "", b"software: test\r\n")
    req = _raw_record(
        "request",
        "WARC-Target-URI: http://x.test/\r\n",
        b"GET / HTTP/1.1\r\nHost: x.test\r\n\r\n",
    )
    resource = _raw_record(
        "resource",
        "WARC-Target-URI: http://x.test/r\r\n"
        "WARC-Date: 2020-01-02T03:04:05Z\r\n",
        b"<html><body>\nraw payload\n</body></html>",
    )
    response = _raw_record(
        "response",
        "WARC-Target-URI: http://x.test/p\r\n"
        "WARC-Date: 2020-01-02T03:04:06.250000Z\r\n",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>b</html>",
    )
    t = pages_from_warc_bytes(info + req + resource + response)
    assert t.num_rows == 2
    rows = {r["url"]: r for r in t.to_pylist()}
    # resource content is the payload verbatim; response strips HTTP headers
    assert rows["http://x.test/r"]["html"].startswith(b"<html><body>")
    assert rows["http://x.test/p"]["html"] == b"<html>b</html>"
    # fractional-second WARC-Date survives at us precision
    assert rows["http://x.test/p"]["warc_ts"].microsecond == 250000


def test_read_wet_takes_payload_as_text(tmp_path, ray_session):
    """WET-style conversion records: payload IS the extracted text."""
    from ertransfer_ray.sources.warc import read_wet

    recs = b"".join(
        _raw_record(
            "conversion",
            f"WARC-Target-URI: http://x.test/{i}\r\n"
            "WARC-Date: 2021-06-07T08:09:10Z\r\n"
            "Content-Type: text/plain\r\n",
            f"plain extracted text number {i} with some words".encode(),
        )
        for i in range(5)
    )
    path = str(tmp_path / "a.wet.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(recs, mtime=0))
    rows = sorted(read_wet(path).take_all(), key=lambda r: r["url"])
    assert len(rows) == 5
    assert rows[0]["text"] == "plain extracted text number 0 with some words"
    assert rows[0]["html"] == rows[0]["text"].encode()
    assert rows[0]["lang"]  # language_id ran on the payload text


def test_truncated_tail_keeps_complete_prefix():
    pages = _pages_table()
    plain = serialize_warc_records(pages, gzip_per_record=False)
    cut = plain[: int(len(plain) * 0.6)]
    got = list(iter_warc_records(cut))
    assert 0 < len(got) < pages.num_rows
    # per-record gzip: dropping half the members' bytes keeps a prefix too
    gz = serialize_warc_records(pages, gzip_per_record=True)
    t = pages_from_warc_bytes(gz[: int(len(gz) * 0.6)])
    assert 0 < t.num_rows < pages.num_rows


def test_distributed_sink_idempotent_and_readable(tmp_path, ray_session):
    pages = _pages_table()
    out = str(tmp_path / "shards")
    ds = rd.from_arrow(pages).repartition(4)
    m1 = sorted(write_warc(ds, out).take_all(), key=lambda r: r["path"])
    assert sum(r["records"] for r in m1) == pages.num_rows
    assert all(p.endswith(".warc.gz") for p in os.listdir(out))
    # re-run: content-digest shard names → byte-identical overwrite, no dups
    m2 = sorted(write_warc(ds, out).take_all(), key=lambda r: r["path"])
    assert [r["path"] for r in m1] == [r["path"] for r in m2]
    assert len(os.listdir(out)) == len(m1)
    got = pa.Table.from_pylist(
        read_warc([os.path.join(out, f) for f in os.listdir(out)],
                  with_text=False).take_all()
    )
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(pages))


def test_crlf_url_cannot_corrupt_framing():
    """A hostile url with embedded CR/LF must not inject header lines —
    all records, including the ones AFTER the hostile row, still parse."""
    t = pa.table(
        {
            "url": [
                "http://ok.test/a",
                "http://evil.test/x\r\nWARC-Type: warcinfo\r\nX: y",
                "http://ok.test/b",
            ],
            "warc_ts": pa.array([1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
            "html": [b"<html>a</html>", b"<html>x</html>", b"<html>b</html>"],
        }
    )
    got = pages_from_warc_bytes(serialize_warc_records(t, gzip_per_record=False))
    assert got.num_rows == 3
    urls = got.column("url").to_pylist()
    assert "http://ok.test/b" in urls
    assert all("\r" not in u and "\n" not in u for u in urls)


def test_property_roundtrip_arbitrary_payloads():
    """Serialize → parse is the identity on (url, ts, html) for arbitrary
    binary payloads (including payloads that CONTAIN 'WARC/' and CRLF
    blank lines — Content-Length framing must win over pattern scanning)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    url_st = st.text(
        # exclude CR/LF (header framing), control chars, and surrogates
        # (category Cs): a lone surrogate is not UTF-8-encodable, so even
        # pa.table() on the INPUT side rejects it — not a url a parquet/
        # Arrow pipeline can ever hand the writer.
        alphabet=st.characters(
            blacklist_characters="\r\n",
            min_codepoint=33,
            blacklist_categories=("Cs",),
        ),
        min_size=1,
        max_size=40,
    )
    row_st = st.tuples(
        url_st,
        st.integers(min_value=0, max_value=4_000_000_000_000_000),
        st.binary(max_size=200).map(lambda b: b + b"\r\n\r\nWARC/1.0\r\n"),
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(row_st, min_size=1, max_size=8))
    def check(rows):
        t = pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "html": [r[2] for r in rows],
            }
        )
        for gz in (False, True):
            got = pages_from_warc_bytes(
                serialize_warc_records(t, gzip_per_record=gz)
            )
            assert got.column("url").to_pylist() == t.column("url").to_pylist()
            assert got.column("html").to_pylist() == t.column("html").to_pylist()
            assert (
                got.column("warc_ts").to_pylist()
                == t.column("warc_ts").to_pylist()
            )

    check()


def test_run_er_over_warc_matches_parquet_source(tmp_path, ray_session):
    """End-to-end: the flagship pipeline over read_warc output produces the
    same clusters as over the in-memory pages table."""
    from ertransfer_ray.pipelines.er_pipeline import ERConfig, run_er

    pages = _pages_table()
    path = str(tmp_path / "c.warc.gz")
    write_warc_file(path, pages)
    via_warc = (
        run_er(read_warc(path), ERConfig())["clusters"]
        .to_pandas().sort_values("url", ignore_index=True)
    )
    direct = (
        run_er(rd.from_arrow(pages), ERConfig())["clusters"]
        .to_pandas().sort_values("url", ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_warc, direct)
