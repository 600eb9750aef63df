"""Substring-level (sliding-window span) deduplication — the Lee et al.
2021 "Deduplicating Training Data Makes Language Models Better" primitive:
a span is duplicated when the exact ``k``-word window occurs more than
once in the WHOLE corpus (including repeats inside one document); every
duplicated occurrence except the global first is struck from the text.

Where ``stages/segdedup`` cuts documents into non-overlapping segments
(the C4 line-dedup shape), this operator slides a stride-1 window, so a
repeated passage of length L ≥ k is removed in full wherever it re-occurs
— the union of its L−k+1 duplicated windows — while unique surrounding
prose survives. Two operators, mirroring the segment pair:

- :func:`window_dup_stats` — per-document (n_windows, dup_windows,
  dup_frac), the thresholdable memorization-risk signal;
- :func:`drop_duplicate_spans` — the rewrite: tokens covered by any
  duplicated non-first window are removed; documents shorter than ``k``
  words have no windows and pass through unchanged.

This is a beyond-reference LLM-training-data operator (the reference
engine, /root/reference, has no substring dedup); it composes the same
exchange primitives as segdedup/dedup.

Scale shape (the 100 TB contract):

- window EMIT is a stateless vectorized map. With ``fingerprint=True``
  (the scale path) no window string is ever materialized: each DISTINCT
  word in the batch is SipHashed once (pandas' C hasher over the
  factorized vocab), and window hashes combine the k word hashes with a
  rolling polynomial — k numpy gathers, 16 B/window on the wire.
  ``fingerprint=False`` carries the exact window string (collision-free;
  what the SQL oracle groups on — parity between the two is pinned by
  test and by the oracle itself, exactly as segdedup's).
- the exchange is keyed on the window value; a window's global count and
  first occurrence are fully contained in its bucket, which emits ONLY
  the duplicated non-first (doc_id, pos) rows — dedup hit rates make
  that far smaller than the corpus.
- the STATS operator's doc-keyed combine carries only documents with
  duplicated windows — n_windows finalizes map-side, never rides the
  exchange (a per-(doc, bucket) row for every doc anti-scaled: partial
  volume grew with the bucket count). An opt-in ``broadcast`` arm trades
  the doc combine for a (win_hash, cnt) count pass + dup-set broadcast,
  for corpora known mostly-unique where the dup set fits a worker cache.
- the rewrite broadcasts the drop list map-side below
  ``segdedup.DROP_BROADCAST_LIMIT`` (text never rides a shuffle) and
  degrades to the doc_id-bucketed tagged-union exchange past it — the
  same auto rule as ``drop_duplicate_segments``.

Cost honesty: stride-1 windows mean the exchange carries ~24 B/TOKEN
(hash + doc_id + pos) — the same order as reading the corpus once, which
is inherent to exact substring dedup (Lee et al. pay the equivalent in
suffix-array construction; a distributed hash exchange is the standard
cluster form). It is NOT a small-key exchange like MinHash banding: at
100 TB, run it per date-partitioned shard group and union the survivors,
or raise ``k``/use :func:`window_dup_stats` first to gate which shards
need the rewrite at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .groupby import exchange_group_apply, grouped_aggregate
from .segdedup import DROP_BROADCAST_LIMIT, _within_run_arange, _word_lists

#: rolling-polynomial multiplier for combining word hashes into window
#: hashes (mod 2^64; any odd constant with good bit mixing works — this is
#: the FNV-1a prime)
_POLY = np.uint64(1099511628211)


def _word_hashes(flat_words: pa.Array) -> np.ndarray:
    """uint64 SipHash per word, each DISTINCT word hashed once (factorize
    → hash the vocab → gather). Deterministic across batching: the hash
    depends only on word bytes, factorization order cancels out."""
    obj = flat_words.to_numpy(zero_copy_only=False)
    codes, uniques = pd.factorize(obj, use_na_sentinel=False)
    uh = pd.util.hash_array(np.asarray(uniques, dtype=object), categorize=False)
    return uh[codes]


def _window_rows(
    t: pa.Table,
    id_col: str,
    text_col: str,
    k: int,
    fingerprint: bool,
    with_base: bool = False,
) -> pa.Table:
    """(doc_id, pos, win|win_hash) rows for one batch — stride-1 ``k``-word
    windows; documents with fewer than ``k`` words emit none. ``pos`` is
    the 0-based word offset of the window start.

    ``with_base=True`` appends ONE extra row per emitting document with
    ``pos = -(n_windows + 1)`` (and a doc-id-derived key that only routes
    it to a bucket) — the stats operator's map-side window count, costing
    no second tokenize pass. Output is a single-chunk table either way.
    """
    import pyarrow.compute as pc

    words, wc = _word_lists(t, text_col)
    n_win = np.maximum(wc - k + 1, 0)
    flat = words.flatten()
    word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
    pos = _within_run_arange(n_win)
    win_start = np.repeat(word_starts, n_win) + pos
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    cols: dict = {
        id_col: pa.array(np.repeat(ids, n_win)),
        "pos": pa.array(pos),
    }
    if fingerprint:
        wh = _word_hashes(flat)
        h = np.zeros(len(win_start), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = h * _POLY + wh[win_start + j]
        cols["win_hash"] = pa.array((h >> np.uint64(1)).astype(np.int64))
    else:
        idx = (win_start[:, None] + np.arange(k, dtype=np.int64)[None, :]).ravel()
        taken = flat.take(pa.array(idx, pa.int64()))
        n = len(win_start)
        if (n + 1) * k > np.iinfo(np.int32).max:
            offs = pa.array(np.arange(n + 1, dtype=np.int64) * k)
            lst = pa.LargeListArray.from_arrays(offs, taken)
        else:
            offs = pa.array((np.arange(n + 1) * k).astype(np.int32))
            lst = pa.ListArray.from_arrays(offs, taken)
        cols["win"] = pc.binary_join(lst, " ")
    wins = pa.table(cols)
    if not with_base:
        return wins
    m = n_win > 0
    base_ids = ids[m]
    base_cols: dict = {
        id_col: pa.array(base_ids),
        "pos": pa.array(-(n_win[m].astype(np.int64)) - 1),
    }
    if fingerprint:
        # shift in uint64 THEN cast (the window-hash form): int64 >>
        # np.uint64 scalar becomes a TypeError under NumPy 2 (NEP 50)
        base_cols["win_hash"] = pa.array(
            (pd.util.hash_array(base_ids) >> np.uint64(1)).astype(np.int64)
        )
    else:
        base_cols["win"] = pa.array(base_ids.astype("U"))
    return pa.concat_tables(
        [wins, pa.table(base_cols).select(wins.column_names)],
        promote_options="permissive",
    ).combine_chunks()


#: broadcast the duplicated-hash set map-side while it stays under this
#: many bytes (8 B per int64 hash; 32 MiB ≈ 4M hashes). Deliberately FAR
#: tighter than DROP_BROADCAST_LIMIT: every recount batch binary-searches
#: the whole set, so a 24M-hash set (193 MB — measured on the x640 bench
#: corpus) turns each probe into a cache miss and the map pass into the
#: bottleneck (209 s vs the exchange arm's 56 s at 8 CPUs). Past the gate
#: the stats fall back to the window-keyed exchange.
DUP_SET_BROADCAST_LIMIT = 1 << 25


def window_dup_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    fingerprint: bool = True,
    num_buckets: int | None = None,
    strategy: str = "auto",
):
    """Per-document sliding-window duplication stats: Dataset
    (id_col, n_windows, dup_windows, dup_frac) over documents with ≥ k
    words (shorter documents have no windows and no row).

    ``strategy``: ``exchange`` (what ``auto`` picks) is the always-safe
    one-pass window-keyed exchange. Its doc-keyed combine carries only
    documents that HAVE duplicated windows in a bucket — ``n_windows``
    rides as ONE tagged base row per document (pos = -(n_windows+1),
    exact map-side since a document is one input row) — which keeps the
    partial volume from growing with the bucket count. The original
    shape exchanged a per-(doc, bucket) row for EVERY doc, so adding
    workers added partial volume and the stage stopped scaling:
    measured on a 1.6M-doc / 154M-window corpus (10 % dup docs), the
    old shape ran 57.9 s at 8 CPUs → 55.5 s at 32 (flat) while this
    shape ran 72.1 s → 31.8 s (2.3× from 4× CPUs; 1.7× faster than old
    at 32). The ~20 % 8-CPU premium is the base-row emit + combine.
    ``broadcast``
    (fingerprint only, opt-in) runs a COUNT pass whose exchange carries
    (win_hash, cnt) partials, then broadcasts the duplicated-hash set
    and recounts map-side with no doc-keyed exchange; it wins only when
    the corpus is known mostly-unique — the dup set must fit
    ``DUP_SET_BROADCAST_LIMIT`` (every recount batch binary-searches it)
    and the count exchange is as heavy as the window exchange, which is
    why ``auto`` does not probe it (measuring the dup set costs the full
    count pass; on the x640 bench corpus the probe-then-fallback shape
    was 209 s vs 56 s at 8 CPUs). Falls back to ``exchange`` past the
    gate.
    """
    if strategy not in ("auto", "broadcast", "exchange"):
        raise ValueError(
            f"strategy must be auto|broadcast|exchange, got {strategy!r}"
        )
    if strategy == "broadcast" and not fingerprint:
        raise ValueError("strategy='broadcast' requires fingerprint=True")
    key = "win_hash" if fingerprint else "win"

    def emit(t: pa.Table) -> pa.Table:
        return _window_rows(t, id_col, text_col, k, fingerprint)

    src = ds.select_columns([id_col, text_col])

    if strategy == "broadcast":
        stats = _dup_stats_broadcast(src, emit, id_col, num_buckets)
        if stats is not None:
            return stats

    def emit_with_base(t: pa.Table) -> pa.Table:
        # window rows plus ONE base row per document carrying n_windows
        # encoded as pos = -(n_windows + 1) — so n_windows never rides a
        # per-(doc, bucket) partial and costs no second tokenize pass. A
        # doc is one input row, so its window count is exact map-side.
        return _window_rows(t, id_col, text_col, k, fingerprint, with_base=True)

    wins = src.map_batches(emit_with_base, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "n_windows": pd.Series([], dtype=np.int64),
                "dup_windows": pd.Series([], dtype=np.int64),
            }
        )
        if len(df) == 0 or key not in df.columns:
            return empty
        pos = df["pos"].to_numpy()
        isbase = pos < 0
        parts = []
        if isbase.any():
            b = df.loc[isbase]
            parts.append(
                pd.DataFrame(
                    {
                        id_col: b[id_col].to_numpy(),
                        "n_windows": (-b["pos"].to_numpy() - 1).astype(np.int64),
                        "dup_windows": np.int64(0),
                    }
                )
            )
        d = df.loc[~isbase]
        if len(d):
            gc = d.groupby(key, sort=False)[key].transform("size")
            d = d.loc[gc.to_numpy() > 1]
            if len(d):
                out = d.groupby(id_col, as_index=False, sort=False).agg(
                    dup_windows=(key, "size")
                )
                out.insert(1, "n_windows", np.int64(0))
                parts.append(out)
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    partials = exchange_group_apply(wins, key, bucket_fn, num_buckets)
    stats = grouped_aggregate(
        partials,
        id_col,
        {"n_windows": ("n_windows", "sum"), "dup_windows": ("dup_windows", "sum")},
        num_buckets,
    )

    return stats.map_batches(_finalize_dup_frac, batch_format="pandas")


def _finalize_dup_frac(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["n_windows"] = df["n_windows"].astype(np.int64)
    df["dup_windows"] = df["dup_windows"].astype(np.int64)
    df["dup_frac"] = df["dup_windows"].to_numpy(dtype=np.float64) / df[
        "n_windows"
    ].to_numpy(dtype=np.float64)
    return df


def _dup_stats_broadcast(src, emit, id_col: str, num_buckets: int | None):
    """Broadcast arm of :func:`window_dup_stats`; returns ``None`` when
    the measured dup set is over the broadcast limit (caller falls back
    to the exchange arm — same values, no cache-hostile giant probes)."""
    import ray

    def count_rows(t: pa.Table) -> pa.Table:
        h = emit(t).column("win_hash").to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {"win_hash": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64))}
        )

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "win_hash" not in df.columns:
            return pd.DataFrame({"win_hash": pd.Series([], dtype=np.int64)})
        g = df.groupby("win_hash", as_index=False, sort=False)["cnt"].sum()
        return g.loc[g["cnt"] > 1, ["win_hash"]].reset_index(drop=True)

    dups = exchange_group_apply(
        src.map_batches(count_rows, batch_format="pyarrow"),
        "win_hash",
        bucket_dups,
        num_buckets,
    ).materialize()
    n_dup = dups.count()
    if 8 * n_dup >= DUP_SET_BROADCAST_LIMIT:
        return None
    parts = [
        b["win_hash"].to_numpy()
        for b in dups.iter_batches(batch_format="pandas")
    ]
    dup_set = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    ref = ray.put(dup_set)

    def recount(t: pa.Table) -> pa.Table:
        wins = emit(t)
        h = wins.column("win_hash").to_numpy(zero_copy_only=False)
        ids = wins.column(id_col).to_numpy(zero_copy_only=False)
        dset = ray.get(ref)
        if len(dset):
            idx = np.searchsorted(dset, h).clip(max=len(dset) - 1)
            is_dup = dset[idx] == h
        else:
            is_dup = np.zeros(len(h), dtype=bool)
        # _window_rows repeats each doc's id contiguously, so per-doc runs
        # are whole within the batch and the stats are FINAL here.
        if len(ids):
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            n_win = np.diff(np.r_[starts, len(ids)])
            dup_win = np.add.reduceat(is_dup.astype(np.int64), starts)
        else:
            starts = np.empty(0, np.int64)
            n_win = np.empty(0, np.int64)
            dup_win = np.empty(0, np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[starts]) if len(ids)
                else wins.column(id_col),
                "n_windows": pa.array(n_win.astype(np.int64)),
                "dup_windows": pa.array(dup_win),
                "dup_frac": pa.array(
                    dup_win / n_win.astype(np.float64)
                    if len(n_win)
                    else np.empty(0, np.float64)
                ),
            }
        )

    return src.map_batches(recount, batch_format="pyarrow")


def _drop_rows(df: pd.DataFrame, id_col: str, key: str) -> pd.DataFrame:
    """Bucket fn: duplicated window occurrences that are NOT the global
    first (first = min (doc_id, pos) per window value)."""
    if len(df) == 0 or key not in df.columns:
        return pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "pos": pd.Series([], dtype=np.int64),
            }
        )
    d = df.sort_values([id_col, "pos"], kind="stable")
    non_first = d.duplicated(subset=[key], keep="first")
    return d.loc[non_first, [id_col, "pos"]].reset_index(drop=True)


def _rewrite_batch(
    t: pa.Table, drops: pd.DataFrame, id_col: str, text_col: str, k: int,
    out_col: str,
) -> pa.Table:
    """Rebuild text with every token covered by a dropped window removed —
    interval coverage via one difference-array pass, no per-row Python."""
    words, wc = _word_lists(t, text_col)
    flat = words.flatten()
    total = int(wc.sum())
    keep = np.ones(total, dtype=bool)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    if len(drops) and total:
        word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
        rowpos = pd.Series(np.arange(len(ids), dtype=np.int64), index=ids)
        hit = drops[drops[id_col].isin(rowpos.index)]
        if len(hit):
            rows = rowpos.loc[hit[id_col]].to_numpy()
            starts = word_starts[rows] + hit["pos"].to_numpy()
            delta = np.zeros(total + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + k, -1)  # windows never cross a doc
            keep = np.cumsum(delta[:-1]) == 0
    kept = flat.filter(pa.array(keep))
    kept_counts = np.zeros(len(ids), dtype=np.int64)
    if total:
        np.add.at(kept_counts, np.repeat(np.arange(len(ids)), wc), keep)
    offs = np.concatenate(([0], np.cumsum(kept_counts)))
    if offs[-1] > np.iinfo(np.int32).max:
        lst = pa.LargeListArray.from_arrays(pa.array(offs), kept)
    else:
        lst = pa.ListArray.from_arrays(pa.array(offs.astype(np.int32)), kept)
    import pyarrow.compute as pc

    return pa.table({id_col: t.column(id_col), out_col: pc.binary_join(lst, " ")})


def drop_duplicate_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    out_col: str = "clean_text",
    fingerprint: bool = True,
    strategy: str = "auto",
    num_buckets: int | None = None,
):
    """Dataset (id_col, out_col): each document's text with every token
    covered by a duplicated non-first ``k``-word window removed. Word
    separator is a single space; documents with < k words are unchanged.

    ``strategy``: ``broadcast`` rewrites map-side against a broadcast drop
    list (no text shuffle); ``join`` exchanges a (doc, text) ∪ (drop rows)
    tagged union on doc_id; ``auto`` picks by the drop list's measured size.
    """
    import ray
    import ray.data as rd

    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"strategy must be auto|broadcast|join, got {strategy!r}")
    key = "win_hash" if fingerprint else "win"
    wins = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: _window_rows(t, id_col, text_col, k, fingerprint),
        batch_format="pyarrow",
    )
    drops = exchange_group_apply(
        wins, key, lambda df: _drop_rows(df, id_col, key), num_buckets
    ).materialize()

    if strategy == "auto":
        n_drop = drops.count()
        strategy = "broadcast" if 16 * n_drop < DROP_BROADCAST_LIMIT else "join"

    # pin the output schema with one empty typed block (a map over an
    # empty corpus emits zero typed blocks — same trick as segdedup)
    from .joins import _arrow_field_type

    try:
        id_type = _arrow_field_type(ds.schema(), id_col)
    except Exception:  # noqa: BLE001 — schema unavailable: int64 ids (the norm)
        id_type = pa.int64()
    schema_pin = rd.from_arrow(
        pa.table({id_col: pa.array([], id_type), out_col: pa.array([], pa.string())})
    )

    if strategy == "broadcast":
        drop_df = drops.to_pandas()
        ref = ray.put(drop_df)

        def rewrite(t: pa.Table) -> pa.Table:
            d = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return _rewrite_batch(t, d, id_col, text_col, k, out_col)

        return schema_pin.union(
            ds.select_columns([id_col, text_col]).map_batches(
                rewrite, batch_format="pyarrow"
            )
        )

    # join arm: tagged union on doc_id — text rows side 0, drop rows side 1
    import pyarrow.compute as pc

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                text_col: pc.cast(t.column(text_col), pa.string()),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_drops(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "pos": pc.cast(t.column("pos"), pa.int64()),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    both = ds.select_columns([id_col, text_col]).map_batches(
        tag_docs, batch_format="pyarrow"
    ).union(drops.map_batches(tag_drops, batch_format="pyarrow"))

    def bucket(t: pa.Table):
        if "_side" not in t.column_names or text_col not in t.column_names:
            return pa.table(
                {id_col: pa.array([], pa.int64()), out_col: pa.array([], pa.string())}
            )
        side = t.column("_side").to_numpy(zero_copy_only=False)
        docs_t = t.filter(pa.array(side == 0)).select([id_col, text_col])
        if "pos" in t.column_names:
            dr = t.filter(pa.array(side == 1)).select([id_col, "pos"]).to_pandas()
            dr["pos"] = dr["pos"].astype(np.int64)
        else:
            dr = pd.DataFrame({id_col: [], "pos": pd.Series([], dtype=np.int64)})
        return _rewrite_batch(docs_t, dr, id_col, text_col, k, out_col)

    return schema_pin.union(
        exchange_group_apply(both, id_col, bucket, num_buckets, fn_format="pyarrow")
    )
