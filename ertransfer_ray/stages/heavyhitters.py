"""Provably-exact distributed top-k terms via mergeable Misra–Gries
summaries — the heavy-hitters path that never exchanges the vocabulary.

Beyond-reference operator (the reference has no corpus-frequency ops);
standard sketch theory: Misra & Gries (1982), the mergeable-summaries
treatment of Agarwal et al. (PODS'12).

Why it exists next to the full-exchange ``corpus_top_terms`` query: that
query's grouped combine exchanges one row per distinct (block, term) —
fine while vocabularies are ~10^5, but a 100 TB crawl's raw token
vocabulary (typos, ids, urls) is ~10^9+ and the exchange becomes the job.
This path bounds the exchange at ``counters`` rows per block regardless
of vocabulary size, then recounts only a tiny candidate set exactly:

1. **Pass 1 — block summaries.** Each block computes exact local counts
   (vectorized value_counts) and truncates them to ≤ ``counters``
   Misra–Gries counters: subtract the (s+1)-th largest count ``delta_b``
   and drop non-positives. Every retained counter is the exact block
   count minus ``delta_b``; every dropped term's block count is
   ≤ ``delta_b``. A grouped sum merges the summaries (the ONLY exchange,
   ≤ s rows per block); per-block deltas ride the same exchange on a
   sentinel row (term = "" — impossible after whitespace split), so the
   data-dependent global error bound E = Σ_b delta_b arrives for free.
   For any term t: lb(t) ≤ true(t) ≤ lb(t) + E, and a term retained
   nowhere has true ≤ E. (E ≤ N/(s+1), the classic bound, but the summed
   form is usually far tighter on skewed data.)
2. **Candidates.** The top ``candidates`` terms by summed lower bound,
   selected with a streaming driver top-C (the driver holds ≤ C rows plus
   one batch at a time); ``max_dropped`` = the largest lower bound that
   did NOT make the cut.
3. **Pass 2 — exact recount.** The candidate terms broadcast once
   (``ray.put``); each block emits exact counts for candidate terms only
   (≤ C tiny rows), summed on the driver.
4. **Proof check.** Any non-candidate's true count ≤ max_dropped + E.
   If the exact count of the k-th result is STRICTLY greater, no
   non-candidate can reach the top k (strictness also defeats
   tie-break order), so the answer is certified exact — which is what
   lets this op share the plain SQL oracle. Otherwise the data was not
   skewed enough for (counters, candidates): raise by default, or
   transparently fall back to the full-vocabulary exchange with
   ``on_unprovable="exact"``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .groupby import grouped_aggregate

#: sentinel term carrying per-block truncation deltas through the exchange;
#: unreachable as a real token (whitespace split never yields "")
_DELTA_SENTINEL = ""


def _mg_block_summary(counts: pd.Series, s: int) -> tuple[pd.Series, int]:
    """Truncate exact per-block counts to ≤ s Misra–Gries counters.

    Returns (lower_bounds, delta): retained terms underestimate their
    exact block count by exactly ``delta``; dropped terms had block count
    ≤ ``delta``."""
    if len(counts) <= s:
        return counts, 0
    v = counts.sort_values(ascending=False, kind="stable")
    delta = int(v.iloc[s])
    kept = (v.iloc[:s] - delta).astype(np.int64)
    return kept[kept > 0], delta


def top_k_terms(
    ds,
    text_col: str = "text",
    k: int = 10,
    counters: int = 4096,
    candidates: int | None = None,
    num_buckets: int | None = None,
    on_unprovable: str = "raise",
) -> pd.DataFrame:
    """Exact global top-k most frequent terms (lowercase whitespace
    tokens), ties by term ascending — identical output to the
    full-exchange form, with the exchange bounded at ``counters`` rows per
    block. Raises (or falls back, per ``on_unprovable``) when exactness
    cannot be certified for this (counters, candidates) on this data."""
    import ray

    if on_unprovable not in ("raise", "exact"):
        raise ValueError(f"on_unprovable must be raise|exact, got {on_unprovable!r}")
    C = max(4 * k, 64) if candidates is None else candidates

    from ..functions.textstats import batch_term_counts

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = batch_term_counts(df[text_col])
        kept, delta = _mg_block_summary(vc, counters)
        out = pd.DataFrame(
            {
                "term": np.concatenate([kept.index.to_numpy(dtype=object), [_DELTA_SENTINEL]]),
                "n_lb": np.concatenate([kept.to_numpy(np.int64), [0]]),
                "d": np.concatenate([np.zeros(len(kept), np.int64), [delta]]),
            }
        )
        return out

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "term",
        {"n_lb": ("n_lb", "sum"), "d": ("d", "sum")},
        num_buckets,
    )

    # streaming driver top-C by summed lower bound — holds ≤ C rows + one
    # batch; max_dropped bounds every non-candidate's lower bound
    best = pd.DataFrame({"term": pd.Series([], dtype=object), "n_lb": pd.Series([], dtype=np.int64)})
    err_sum = 0
    max_dropped = 0
    for b in merged.iter_batches(batch_format="pandas"):
        sent = b["term"] == _DELTA_SENTINEL
        if sent.any():
            err_sum += int(b.loc[sent, "d"].sum())
            b = b[~sent]
        if b.empty:
            continue
        batch_part = b[["term", "n_lb"]].astype({"n_lb": np.int64})
        pool = batch_part if best.empty else pd.concat([best, batch_part], ignore_index=True)
        pool = pool.sort_values(["n_lb", "term"], ascending=[False, True], ignore_index=True)
        best, dropped = pool.iloc[:C], pool.iloc[C:]
        if len(dropped):
            max_dropped = max(max_dropped, int(dropped["n_lb"].max()))

    if best.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)})

    # pass 2: exact recount of candidates only
    cand = pa.array(best["term"].to_numpy(dtype=object), pa.string())
    ref = ray.put(cand)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        terms = set(ray.get(ref).to_pylist())
        vc = batch_term_counts(df[text_col])
        vc = vc[vc.index.isin(terms)]
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object), "n": vc.to_numpy(np.int64)})

    totals: dict[str, int] = {}
    for b in ds.map_batches(recount, batch_format="pandas").iter_batches(batch_format="pandas"):
        for t, n in zip(b["term"], b["n"]):
            totals[t] = totals.get(t, 0) + int(n)

    exact = (
        pd.DataFrame({"term": list(totals), "n": np.fromiter(totals.values(), np.int64, len(totals))})
        .sort_values(["n", "term"], ascending=[False, True], ignore_index=True)
        .head(k)
    )
    # certification: every non-candidate's true count ≤ max_dropped + E.
    # bound == 0 certifies unconditionally (no truncation anywhere ⇒ lower
    # bounds ARE exact counts and nothing retained was excluded with mass);
    # otherwise the k-th exact count must STRICTLY exceed the bound —
    # including when fewer than k candidates exist at all.
    bound = max_dropped + err_sum
    certified = bound == 0 or (
        len(exact) >= k and int(exact["n"].iloc[-1]) > bound
    )
    if not certified:
        if on_unprovable == "exact":
            return _full_exchange_top_k(ds, text_col, k, num_buckets)
        raise ValueError(
            f"top-{k} not certifiable: k-th exact count "
            f"{int(exact['n'].iloc[-1]) if len(exact) >= k else 'absent'} <= "
            f"max_dropped({max_dropped}) + sum_deltas({err_sum}); raise "
            "counters/candidates or use on_unprovable='exact'"
        )
    return exact.reset_index(drop=True)


def _full_exchange_top_k(ds, text_col: str, k: int, num_buckets: int | None) -> pd.DataFrame:
    """The exact fallback: full-vocabulary grouped combine (the
    queries.q_corpus_top_terms shape) — correct on any distribution, pays
    one row per distinct (block, term) in the exchange."""

    from ..functions.textstats import batch_term_counts

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = batch_term_counts(df[text_col])
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object), "n": vc.to_numpy(np.int64)})

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"), "term", {"n": ("n", "sum")}, num_buckets
    ).to_pandas()
    return (
        counts.sort_values(["n", "term"], ascending=[False, True], ignore_index=True)
        .head(k)
        .reset_index(drop=True)
    )
