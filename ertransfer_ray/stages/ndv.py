"""Grouped approximate distinct count (HyperLogLog) — the web-scale NDV
operator: "how many distinct users per event type / distinct urls per
host" over a corpus where exact ``groupby(...).nunique()`` would shuffle
every value.

Dataflow: one ``map_batches`` pass emits a 2^p-byte register array per
(batch, group) — the VALUES never leave the map task; only fixed-size
register rows ride the exchange — then a bucketed group-apply merges
registers by element-wise max and computes the estimate from exact-integer
sufficient statistics (functions/hashing.hll_exact_stats), which is what
lets the DuckDB oracle reproduce the result bit-for-bit from persisted
per-row hashes.

At 100 TB: shuffle volume is ``n_groups × 2^p`` bytes per input block
(p=8 → 256 B per group-partial), independent of row count — the same
partial-agg pattern as stages/domains.host_stats, with the sketch standing
in for the exact distinct set. Standard error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import HllSketch, column_hash64, hll_exact_stats
from .groupby import exchange_group_apply


def grouped_approx_distinct(
    ds,
    keys: str | list[str],
    col: str,
    p: int = 8,
    num_buckets: int | None = None,
):
    """Per-group HLL distinct count of ``col``.

    Returns a Dataset with columns ``keys... , approx_ndv:int64,
    zeros:int64, s_scaled:string`` — ``zeros`` (empty-register count) and
    ``s_scaled`` (the exact-integer scaled harmonic sum, decimal string
    since it exceeds int64) are the sufficient statistics; ``approx_ndv``
    is the floored HLL estimate with the standard linear-counting
    small-range branch.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 "registers": pa.array([], pa.binary())}
            )
        kdf = pd.DataFrame({k: t.column(k).to_pandas() for k in keys})
        h = column_hash64(t.column(col).to_numpy(zero_copy_only=False))
        out_keys: dict[str, list] = {k: [] for k in keys}
        regs: list[bytes] = []
        for gk, idx in kdf.groupby(keys, sort=False).indices.items():
            gk = gk if isinstance(gk, tuple) else (gk,)
            sk = HllSketch(p).add_hashes(h[idx])
            for k, v in zip(keys, gk):
                out_keys[k].append(v)
            regs.append(sk.registers.tobytes())
        return pa.table({**{k: pa.array(v) for k, v in out_keys.items()},
                         "registers": pa.array(regs, pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(df):
            for gk, g in df.groupby(keys, sort=False):
                gk = gk if isinstance(gk, tuple) else (gk,)
                regs = np.zeros(m, np.uint8)
                for buf in g["registers"]:
                    np.maximum(regs, np.frombuffer(buf, np.uint8), out=regs)
                zeros, s_scaled, ndv = hll_exact_stats(regs, p)
                rows.append(
                    {**dict(zip(keys, gk)), "approx_ndv": ndv,
                     "zeros": zeros, "s_scaled": str(s_scaled)}
                )
        return pd.DataFrame(
            rows,
            columns=[*keys, "approx_ndv", "zeros", "s_scaled"],
        ).astype({"approx_ndv": "int64", "zeros": "int64", "s_scaled": "string"})

    return exchange_group_apply(partials, keys, merge, num_buckets=num_buckets)
