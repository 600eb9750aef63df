"""Crawl-snapshot operators over web-page tables
(url, warc_ts, html, text, lang) — the BASELINE input_hint shape.

A Common-Crawl-style corpus contains the same page many times (one row
per capture, differing ``warc_ts``, often with URL-variant noise:
tracking params, fragments, case). Before blocking/ER, pipelines keep
only the newest capture per CANONICAL url. This is the distributed form
of that step, designed so page payloads (html/text) never ride a
shuffle:

1. a stateless map projects id-only key rows
   ``(url, warc_ts, url_norm)`` — no payload columns;
2. per-canonical-url argmax(warc_ts) via the bucketed top-k primitive
   (ties broken by smallest raw url, so output is
   parallelism-independent);
3. the winner (url, warc_ts) identity set filters the ORIGINAL rows —
   broadcast ``is_in`` below the gate, a bucketed semi-join exchange
   above it. Payloads cross the wire zero times either way.

Captures sharing an identical (url, warc_ts) pair are kept together
(they are indistinguishable at the key level); follow with
``dedup.exact_dedup`` on a content hash when strict row uniqueness is
required.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import normalize_urls
from .groupby import grouped_top_k
from .joins import BroadcastSemiJoin, bucketed_anti_semi_join, put_broadcast

#: above this many winner captures the identity set stops broadcasting and
#: the filter becomes a bucketed semi-join exchange.
BROADCAST_MAX_WINNERS = 2_000_000

_SEP = "\x01"


def _capture_key(url: pa.Array | pa.ChunkedArray, ts) -> pa.Array | pa.ChunkedArray:
    """Composite capture identity: url + \\x01 + microsecond timestamp."""
    return pc.binary_join_element_wise(
        url, pc.cast(pc.cast(ts, pa.int64()), pa.string()), _SEP
    )


def latest_capture_per_url(
    pages_ds,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    strategy: str = "auto",
    num_buckets: int | None = None,
):
    """Keep the newest capture per canonical URL (see module docstring).

    Returns the original rows (all columns) plus ``url_norm``. ``strategy``
    ∈ auto|broadcast|join; auto broadcasts the winner identity set below
    BROADCAST_MAX_WINNERS and degrades to the semi-join exchange above it.
    """

    def keys_only(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                url_col: t.column(url_col),
                ts_col: t.column(ts_col),
                "url_norm": normalize_urls(t.column(url_col)),
            }
        )

    keyed = pages_ds.map_batches(keys_only, batch_format="pyarrow")
    winners = grouped_top_k(
        keyed,
        "url_norm",
        ts_col,
        k=1,
        descending=True,
        tie_cols=[url_col],
        num_buckets=num_buckets,
    ).materialize()

    pages_keyed = pages_ds.map_batches(
        lambda t: t.append_column(
            "url_norm", normalize_urls(t.column(url_col))
        ).append_column(
            "capture_key", _capture_key(t.column(url_col), t.column(ts_col))
        ),
        batch_format="pyarrow",
    )

    if strategy == "auto":
        strategy = "broadcast" if winners.count() <= BROADCAST_MAX_WINNERS else "join"

    if strategy == "broadcast":
        # build only the composite KEYS driver-side (one string per winner),
        # never the full winner rows
        key_chunks = [
            _capture_key(b.column(url_col), b.column(ts_col))
            for b in winners.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ] or [pa.array([], pa.string())]
        key_ref = put_broadcast(
            pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in key_chunks])
        )
        out = pages_keyed.map_batches(
            BroadcastSemiJoin(key_ref, "capture_key"), batch_format="pyarrow"
        )
    elif strategy == "join":
        winner_keys = winners.map_batches(
            lambda t: pa.table(
                {"capture_key": _capture_key(t.column(url_col), t.column(ts_col))}
            ),
            batch_format="pyarrow",
        )
        out = bucketed_anti_semi_join(
            pages_keyed,
            winner_keys,
            "capture_key",
            anti=False,
            num_buckets=num_buckets,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    return out.drop_columns(["capture_key"])


def drop_blocklisted_hosts(pages_ds, blocklist, url_col: str = "url"):
    """C4-style domain filter: drop pages whose canonical host is in
    ``blocklist`` (an iterable of lowercase hostnames). The list is
    broadcast once (``ray.put``) and membership is the Arrow ``is_in``
    kernel per batch — stateless map, no shuffle; blocklists are
    curated-list sized, never corpus sized."""
    from ..functions.urlnorm import host_of

    ref = put_broadcast(pa.array(sorted(set(blocklist)), pa.string()))

    def fn(t: pa.Table) -> pa.Table:
        import ray

        hosts = host_of(normalize_urls(t.column(url_col)))
        bl = ray.get(ref)
        return t.filter(
            pc.invert(pc.fill_null(pc.is_in(hosts, value_set=bl), False))
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow")
