"""WARC/1.0 source + sink for the pages table (ISO 28500 crawl archives).

Common-Crawl-style corpora ship as WARC files — the native format of the
webtext north star (BASELINE.json.input_hint). This module reads them into
the exact pages shape ``(url, warc_ts, html[, text, lang])`` that
``pipelines.er_pipeline.run_er`` consumes, and writes pages back out as
spec-conformant WARC for interchange and round-trip tests.

Scale model:

- **One read task per WARC file** (``ray.data.read_binary_files``): crawl
  archives ship as many ~1 GiB files, so per-file tasks are the natural
  100 TB partitioning — the same unit Common Crawl's own tooling uses.
  Parsing happens inside ``map_batches`` on the worker that read the file;
  no bytes ever reach the driver.
- **gzip'd WARCs are parsed member-by-member** with a streaming ``zlib``
  loop: Common Crawl writes ONE gzip member PER RECORD precisely so
  readers can bound peak memory at file + one record — never
  file + whole-decompressed-stream.
- **The distributed sink is idempotent**: each output shard is named by a
  content digest and written via ``os.replace`` (atomic), so a re-run
  after partial failure overwrites the same shards byte-identically
  instead of duplicating data.

Record handling follows the spec's reader obligations: only
``WARC-Type: response|resource|conversion`` records with a
``WARC-Target-URI`` become rows (``warcinfo`` / ``request`` / ``metadata``
are skipped); ``response`` content is an HTTP message, so the HTTP header
block is stripped to recover the payload. Malformed trailing bytes (a
truncated upload) terminate the file's parse without failing the task —
every complete record before the corruption is still emitted.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa

_GZIP_MAGIC = b"\x1f\x8b"
_PAGE_TYPES = {"response", "resource", "conversion"}

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a (possibly multi-member) stream,
    decompressed — the streaming loop that keeps peak memory at one
    member, not the whole stream."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data[pos:]) + d.flush()
        except zlib.error:
            return  # truncated/corrupt member: stop at the last good one
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:  # no forward progress: corrupt framing
            return
        pos += consumed


def _parse_header_block(block: bytes) -> dict[str, str] | None:
    """Parse ``WARC/1.x`` + ``Name: value`` lines into a lower-cased dict
    (``None`` if the block is not a WARC header)."""
    lines = block.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        return None
    headers: dict[str, str] = {"warc-version": lines[0].decode("ascii", "replace")}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
    return headers


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, content)`` per record of a DECOMPRESSED WARC
    buffer. Content-Length frames each record per the spec; a record whose
    framing is broken (missing/invalid length, truncated content) ends the
    parse — complete records before it are still yielded."""
    pos = 0
    n = len(buf)
    while True:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = buf.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers = _parse_header_block(buf[start:hdr_end])
        if headers is None:
            pos = start + 5
            continue
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated content
        yield headers, buf[body_start : body_start + clen]
        pos = body_start + clen


def _records_from_file_bytes(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    if data[:2] == _GZIP_MAGIC:
        for member in _iter_gzip_members(data):
            yield from iter_warc_records(member)
    else:
        yield from iter_warc_records(data)


def _http_payload(content: bytes) -> bytes:
    """Strip the HTTP message headers from a ``response`` record's content
    (the payload follows the first blank line)."""
    if content.startswith(b"HTTP/"):
        head, sep, body = content.partition(b"\r\n\r\n")
        if sep:
            return body
    return content


def _parse_warc_date(s: str):
    """WARC-Date (ISO 8601, 'Z'-suffixed, optional fractional seconds) →
    ``np.datetime64[us]`` (NaT when malformed)."""
    try:
        return np.datetime64(s.rstrip("Zz"), "us")
    except ValueError:
        return np.datetime64("NaT", "us")


def pages_from_warc_bytes(data: bytes) -> pa.Table:
    """One WARC file's bytes (plain or gzip) → a pages-shaped Arrow table
    ``(url, warc_ts, html)``. Non-page record types are skipped."""
    urls: list[str] = []
    ts: list = []
    htmls: list[bytes] = []
    for headers, content in _records_from_file_bytes(data):
        if headers.get("warc-type", "") not in _PAGE_TYPES:
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        urls.append(uri)
        ts.append(_parse_warc_date(headers.get("warc-date", "")))
        htmls.append(
            _http_payload(content)
            if headers.get("warc-type") == "response"
            else content
        )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(
    paths, *, with_text: bool = True, text_mode: str = "extract", **read_kwargs
):
    """Read WARC file(s) into a pages-shaped ``ray.data.Dataset``.

    ``paths`` is a file, directory, or list (anything
    ``ray.data.read_binary_files`` accepts); one read task per file. With
    ``with_text`` (default) the payload is completed into the five-column
    input_hint shape ``(url, warc_ts, html, text, lang)`` run_er consumes;
    without it the raw three columns come back.

    ``text_mode`` picks how ``text`` derives from the payload:
    ``"extract"`` (default) runs the HTML extractor — right for WARC
    response/resource records holding markup; ``"payload"`` decodes the
    payload bytes as UTF-8 directly — right for WET-style ``conversion``
    records whose content IS the extracted plain text (``read_wet`` is the
    named shortcut). Language ID runs on the resulting text either way.
    """
    import ray.data as rd

    if text_mode not in ("extract", "payload"):
        raise ValueError(f"text_mode must be extract|payload, got {text_mode!r}")
    ds = rd.read_binary_files(paths, **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [pages_from_warc_bytes(b.as_py()) for b in batch.column("bytes")]
        tables = [t for t in tables if t.num_rows] or [PAGES_SCHEMA.empty_table()]
        return pa.concat_tables(tables)

    pages = ds.map_batches(parse, batch_format="pyarrow")
    if not with_text:
        return pages

    def add_text(batch: pa.Table) -> pa.Table:
        from ..functions.textnorm import extract_text_from_html
        from ..functions.textstats import language_id

        payloads = batch.column("html").to_pylist()
        if text_mode == "payload":
            texts = [p.decode("utf-8", "replace") for p in payloads]
        else:
            texts = [extract_text_from_html(p) for p in payloads]
        langs, _ = language_id(texts)
        return batch.append_column(
            "text", pa.array(texts, pa.string())
        ).append_column("lang", pa.array(langs, pa.string()))

    return pages.map_batches(add_text, batch_format="pyarrow")


def read_wet(paths, **kwargs):
    """Read WET files (Common Crawl's extracted-text sidecar: one
    ``conversion`` record per page, payload = plain text). Same dataset
    shape as ``read_warc``; ``text`` is the payload verbatim."""
    return read_warc(paths, text_mode="payload", **kwargs)


# --------------------------------------------------------------------------
# writing
# --------------------------------------------------------------------------


def _record_id(url: str, ts_us: int) -> str:
    """Deterministic spec-shaped record id (uuid-formatted content hash —
    no process state, so re-runs serialize byte-identically)."""
    h = hashlib.sha256(f"{url}|{ts_us}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _format_warc_date(ts_us: int) -> str:
    dt = np.datetime64(ts_us, "us")
    s = np.datetime_as_string(dt, unit="us")
    # spec-preferred second precision when the value carries none
    return (s[:19] if s.endswith(".000000") else s) + "Z"


_CTL = {ord("\r"): " ", ord("\n"): " "}


def serialize_warc_records(
    batch: pa.Table, *, gzip_per_record: bool = True
) -> bytes:
    """Pages-shaped batch → WARC bytes, one ``response`` record per row
    (one gzip member per record in the default mode, the Common-Crawl
    layout that keeps reads streamable). CR/LF in a url (invalid in a URI,
    but hostile inputs exist) is mapped to spaces — a verbatim embed would
    inject header lines and corrupt the framing of every later record."""
    out: list[bytes] = []
    urls = [u.translate(_CTL) for u in batch.column("url").to_pylist()]
    ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()
    for url, t, html in zip(urls, ts, htmls):
        t = 0 if t is None else int(t)
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: {_record_id(url, t)}\r\n".encode()
            + f"WARC-Date: {_format_warc_date(t)}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
            + http
            + b"\r\n\r\n"
        )
        out.append(
            gzip.compress(rec, compresslevel=6, mtime=0) if gzip_per_record else rec
        )
    return b"".join(out)


def write_warc_file(
    path: str, batch: pa.Table, *, gzip_per_record: bool | None = None
) -> str:
    """Serialize one pages-shaped table to one WARC file (gzip inferred
    from the extension unless forced). Driver-side convenience for tests
    and small exports; the distributed sink is ``write_warc``."""
    gz = path.endswith(".gz") if gzip_per_record is None else gzip_per_record
    data = serialize_warc_records(batch, gzip_per_record=gz)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def write_warc(
    ds,
    out_dir: str,
    *,
    gzip_per_record: bool = True,
    rows_per_shard: int | None = None,
):
    """Distributed pages → WARC sink: each input batch becomes one
    ``part-<digest>.warc[.gz]`` shard. Shard names are content digests and
    the write is tmp-file + ``os.replace``, so re-running after a partial
    failure rewrites the same shards byte-identically (resumable output,
    never one giant file). ``rows_per_shard`` bounds shard size explicitly
    (downstream WARC read parallelism is per-file, so shard count should
    be ≥ the widest reader's task slots — the streaming executor may fuse
    an upstream ``repartition`` away, so control it here). Returns the
    manifest Dataset ``(path, records)`` — consume it (e.g. ``take_all``;
    it is O(shards)) to drive the write.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_per_record else ".warc"

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "records": pa.array([], pa.int64())}
            )
        data = serialize_warc_records(batch, gzip_per_record=gzip_per_record)
        digest = hashlib.sha256(data).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{digest}{ext}")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"path": [path], "records": [batch.num_rows]})

    kwargs = {} if rows_per_shard is None else {"batch_size": rows_per_shard}
    return ds.map_batches(write_block, batch_format="pyarrow", **kwargs)
