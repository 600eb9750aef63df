"""Corpus mixing / filtering stages for training-data assembly:

- :func:`rate_sample` — deterministic per-group downsampling ("domain
  reweighting": keep 20 % of src0, 50 % of src1, all the rest), the mixing
  step every multi-source LLM corpus build runs;
- :func:`filter_by_quantile` — keep rows above/below a GLOBAL quantile of a
  numeric column (quality-score thresholding at a percentile).

Beyond-reference operators (the reference engine samples only at the
pair/split level, splitter.py); both are SQL-oracle-checkable by design.

Scale shape: ``rate_sample`` is one stateless map — the keep decision is a
pure function of (id, group), so it is reproducible across runs, cluster
sizes and retries (no RNG state, no coordination), and composable with
resume-from-checkpoint. The hash is Knuth's multiplicative scheme folded to
32 bits — chosen over the repo's SipHash ``stable_hash64`` ONLY because it
is exactly expressible in ANSI SQL (HUGEINT multiply + mod), which keeps
the operator value-level oracle-checkable; it decorrelates the keep set
from id order, which plain ``id % mod`` sampling does not.
``filter_by_quantile`` computes the global threshold with one tiny
aggregate pass (exact ``quantile_cont`` via the windows stage), broadcasts
the scalar, then filters map-side — two streaming passes, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_FOLD = np.uint64(1 << 32)


def _mix_hash(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — SQL: (CAST(id AS HUGEINT) *
    2654435761) % 4294967296.

    Contract: ids must be NONNEGATIVE integers. ``astype(uint64)`` wraps a
    negative int64 to 2^64+id while DuckDB's HUGEINT expression yields a
    negative remainder, so the two arms would silently diverge — raise
    loudly instead of sampling a different subset than the oracle."""
    if ids.size and np.issubdtype(ids.dtype, np.signedinteger) and ids.min() < 0:
        raise ValueError(
            "_mix_hash requires nonnegative integer ids (negative int64 wraps "
            "under uint64 but stays negative under SQL HUGEINT modulo)"
        )
    return (ids.astype(np.uint64, copy=False) * _KNUTH) % _FOLD


def rate_sample(
    ds,
    rates: dict,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    mod: int = 100,
):
    """Keep each row iff ``mix_hash(id) % mod < round(rate[key] * mod)``.

    ``rates``: group value → keep fraction in [0, 1]; groups absent from the
    dict use ``default_rate``. Rates are quantized to 1/``mod`` — raise
    ``mod`` for finer control. All input columns pass through."""
    import pyarrow.compute as pc

    thresholds = {k: int(round(float(v) * mod)) for k, v in rates.items()}
    default_t = int(round(float(default_rate) * mod))
    mod_u = np.uint64(mod)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        r = _mix_hash(ids) % mod_u
        enc = pc.dictionary_encode(t.column(key_col)).combine_chunks()
        uniq = enc.dictionary.to_pylist()
        per_uniq = np.array(
            [thresholds.get(u, default_t) for u in uniq], dtype=np.int64
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        keep = r.astype(np.int64) < per_uniq[idx]
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample_k(ds, k: int, weight_col: str, id_col: str = "doc_id"):
    """Exactly-k sample WITHOUT replacement with inclusion probability
    proportional to ``weight_col`` (Efraimidis–Spirakis reservoir keys,
    deterministic randomness): every row gets the key ln(u)/w with
    u = (mix_hash(id)+0.5)/2^32 ∈ (0,1), and the k LARGEST keys win —
    equivalent to top-k by u^(1/w). Rows with weight ≤ 0 are never
    sampled. Deterministic at any parallelism (ties broken by id) and
    SQL-reproducible term by term (ln/division on the same doubles).

    Distributed shape mirrors consistent_sample_k: per-block partial
    top-k of (key, id) pairs, ≤ k·blocks driver merge, winner ids
    broadcast back as a map-side filter — full rows never shuffle."""
    import ray

    from .joins import BroadcastSemiJoin

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], pa.float64()),
                id_col: pa.array(
                    [], t.schema.field(id_col).type if t.num_columns else pa.int64()
                ),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = w > 0
        if not pos.any():
            return empty
        ids, w = ids[pos], w[pos]
        u = (_mix_hash(ids).astype(np.float64) + 0.5) / 4294967296.0
        key = np.log(u) / w
        order = np.lexsort((ids, -key))[:k]
        return pa.table({"key": pa.array(key[order]), id_col: pa.array(ids[order])})

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return ds.limit(0)
    cand = pa.concat_tables(parts)
    keys = cand.column("key").to_numpy(zero_copy_only=False)
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -keys))[:k]
    win = pa.array(np.sort(ids[order]))
    return ds.map_batches(
        BroadcastSemiJoin(ray.put(win), id_col), batch_format="pyarrow"
    )


def temperature_rates(
    counts: dict, temperature: float, mod: int = 1000
) -> dict:
    """Per-source keep rates for temperature-flattened mixture resampling
    (the PaLM/UniMax-style ``p_s ∝ n_s^τ`` reweighting, realized as pure
    downsampling): the SMALLEST source keeps everything and every other
    source keeps ``(n_min/n_s)^(1-τ)`` — τ=1 keeps the natural mixture,
    τ=0 flattens to equal per-source volume. Rates are pre-quantized to
    1/``mod`` with floor(x+0.5) (DuckDB ``round`` semantics, NOT Python's
    banker's round) so the SQL oracle reproduces thresholds bit-for-bit."""
    if not 0.0 <= temperature <= 1.0:
        raise ValueError(f"temperature must be in [0, 1], got {temperature}")
    if not counts:
        return {}
    if min(counts.values()) <= 0:
        raise ValueError("temperature_rates requires positive per-source counts")
    n_min = min(counts.values())
    return {
        k: float(np.floor((n_min / n) ** (1.0 - temperature) * mod + 0.5) / mod)
        for k, n in counts.items()
    }


def temperature_sample(
    ds,
    key_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 0.7,
    mod: int = 1000,
):
    """Temperature-flattened corpus mixture: one shuffle-free per-source
    count pass (per-block partials, driver combine — source cardinality is
    bounded), rates from :func:`temperature_rates`, then the deterministic
    :func:`rate_sample` map — the corpus itself never shuffles. Returns
    ``(sampled_ds, rates)``."""
    from .groupby import partial_aggregate

    counts_df = partial_aggregate(ds, key_col, {"n": (None, "count")})
    counts = dict(zip(counts_df[key_col], counts_df["n"].astype(int)))
    rates = temperature_rates(counts, temperature, mod)
    return rate_sample(ds, rates, key_col, id_col, default_rate=1.0, mod=mod), rates


def approx_quantile(
    ds, value_col: str, q: float, bins: int = 8192
) -> float | None:
    """Approximate corpus-wide quantile from one cheap min/max/count
    partial pass plus ONE mergeable fixed-bin histogram pass: the driver
    only ever sees ``bins`` counts per block, never values. Returns None
    on an empty corpus.

    Guarantee (rank bracketing): the estimate lies within one bin width
    ((hi-lo)/bins) of the CLOSED interval between the two order
    statistics bracketing the continuous rank q·(n-1) — i.e. it
    separates the sorted data at the right rank. Inside a sparse value
    gap the estimate may sit anywhere in the gap (any such threshold
    filters identically); it is NOT guaranteed to match
    ``quantile_cont``'s interpolated value there.

    This is the web-scale arm of :func:`filter_by_quantile` — exact
    quantiles of one unbounded group don't decompose, but binned counts
    merge associatively at any parallelism."""
    from .windows import arrow_min_max, global_histogram

    lo_, hi_, _ = arrow_min_max(ds, value_col)
    # None: empty/all-null. Non-finite: all-NaN blocks make pc.min_max
    # emit its (inf, -inf) identity — no usable range either way.
    if lo_ is None or hi_ is None:
        return None
    lo, hi = float(lo_), float(hi_)
    if not (np.isfinite(lo) and np.isfinite(hi)):
        return None
    if hi == lo:
        return lo  # constant column: every quantile is the value
    hist = global_histogram(ds, value_col, bins=bins, value_range=(lo, hi))
    cum = hist["count"].cumsum().to_numpy()
    # rank against the HISTOGRAM total, which (like the exact arm's
    # quantile_cont) excludes NaN rows — pc.count would include them and
    # bias the rank upward on partially-NaN columns
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return None
    target = q * (total - 1) + 1  # quantile_cont rank, 1-based
    i = min(int(np.searchsorted(cum, target)), bins - 1)
    prev = cum[i - 1] if i > 0 else 0
    within = hist["count"].iloc[i]
    frac = (target - prev) / within if within else 0.0
    blo, bhi = hist["bin_lo"].iloc[i], hist["bin_hi"].iloc[i]
    return float(blo + frac * (bhi - blo))


def filter_by_quantile(
    ds,
    value_col: str,
    q: float,
    keep: str = "above",
    num_buckets: int | None = None,
    method: str = "exact",
    bins: int = 8192,
):
    """Rows whose ``value_col`` is strictly above (``keep="above"``) or
    at-or-below (``keep="below"``) the corpus-wide ``quantile_cont(q)``.

    One quantile aggregate, then a broadcast-scalar map-side filter over
    the full rows. ``method="exact"`` routes through
    ``windows.grouped_quantiles`` with a single synthetic group, which
    gathers the (one) value column into one worker — exact and fine to
    ~10^9 rows. ``method="approx"`` uses :func:`approx_quantile`'s
    mergeable histogram (threshold within (hi-lo)/bins of exact; boundary
    rows inside that band may classify differently) — the arm for
    corpora where a single column no longer fits one worker."""
    import pyarrow.compute as pc

    from .windows import grouped_quantiles, quantile_col_name

    if keep not in ("above", "below"):
        raise ValueError(f"keep must be above|below, got {keep!r}")
    if method == "approx":
        t = approx_quantile(ds, value_col, q, bins=bins)
        if t is None:
            return ds
        thresh = t
    elif method == "exact":
        one = ds.select_columns([value_col]).map_batches(
            lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        qdf = grouped_quantiles(one, "_g", value_col, [q], num_buckets).to_pandas()
        if len(qdf) == 0:
            return ds  # empty corpus: nothing to threshold
        thresh = float(qdf.iloc[0, qdf.columns.get_loc(quantile_col_name(q))])
    else:
        raise ValueError(f"method must be exact|approx, got {method!r}")

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(value_col)
        mask = pc.greater(col, thresh) if keep == "above" else pc.less_equal(col, thresh)
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def consistent_sample_k(ds, k: int, id_col: str = "doc_id"):
    """Exactly-k uniform sample by consistent hashing (bottom-k): keep the
    k rows with the smallest ``mix_hash(id)`` (ties by id). Deterministic
    at any parallelism, stable under re-runs, and — the bottom-k sketch
    property — the sample of a superset corpus CONTAINS consistent
    decisions (a row in the sample can only be displaced by new rows, not
    by reordering).

    Distributed shape: each block contributes its own k smallest (hash,
    id) pairs (a partial bottom-k, id-only); the driver merges the ≤
    k·num_blocks candidate rows and broadcasts the winning id set as a
    map-side filter. Full rows never shuffle. SQL oracle:
    ``ORDER BY (CAST(id AS HUGEINT)*2654435761)%4294967296, id LIMIT k``.
    """
    import ray
    import pyarrow.compute as pc

    from .joins import BroadcastSemiJoin

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # keep the id column's NATIVE type — an int64 placeholder
            # would make pa.concat_tables of the partials raise on
            # e.g. int32/uint64 id columns
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    id_col: pa.array([], t.schema.field(id_col).type),
                }
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = _mix_hash(ids).astype(np.int64)
        order = np.lexsort((ids, h))[:k]
        return pa.table({"h": pa.array(h[order]), id_col: pa.array(ids[order])})

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return ds  # empty corpus
    cand = pa.concat_tables(parts)
    h = cand.column("h").to_numpy(zero_copy_only=False)
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))[:k]
    ref = ray.put(pa.array(np.sort(ids[order])))
    return ds.map_batches(BroadcastSemiJoin(ref, id_col), batch_format="pyarrow")
