"""stages/ndv.grouped_approx_distinct — the grouped HyperLogLog NDV
operator (register-only exchange) and its exact-integer estimator
(functions/hashing.hll_exact_stats), including DuckDB oracle parity on a
synthetic corpus so a hash-family or estimator change fails here before
the driver sees it."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ertransfer_ray.functions.hashing import (
    HllSketch,
    column_hash64,
    hll_exact_stats,
)
from ertransfer_ray.stages.ndv import grouped_approx_distinct


def _corpus(seed: int = 0) -> pd.DataFrame:
    """Groups with very different cardinalities: 'tiny' lands in the
    linear-counting branch at p=8, 'big' in the raw branch."""
    rng = np.random.default_rng(seed)
    rows = []
    for g, card, n in (("tiny", 40, 400), ("mid", 300, 1500), ("big", 3000, 9000)):
        rows.append(
            pd.DataFrame({"g": g, "v": rng.integers(0, card, n) + hash(g) % 7919})
        )
    return pd.concat(rows, ignore_index=True)


def test_grouped_ndv_tracks_exact_within_hll_error():
    df = _corpus()
    out = (
        grouped_approx_distinct(rd.from_pandas(df), "g", "v", p=8)
        .to_pandas()
        .set_index("g")
    )
    exact = df.groupby("g")["v"].nunique()
    for g in exact.index:
        est = out.loc[g, "approx_ndv"]
        # p=8 -> sigma ~ 6.5%; allow 4 sigma plus LC-branch slack
        assert abs(est - exact[g]) <= max(0.3 * exact[g], 15), (g, est, exact[g])


def test_grouped_ndv_invariant_to_batching_and_buckets():
    df = _corpus(1)
    base = None
    for shuffle_seed, buckets in ((0, 2), (1, 8), (2, 16)):
        perm = df.sample(frac=1.0, random_state=shuffle_seed).reset_index(drop=True)
        out = (
            grouped_approx_distinct(
                rd.from_pandas(perm), "g", "v", p=8, num_buckets=buckets
            )
            .to_pandas()
            .sort_values("g", ignore_index=True)
        )
        if base is None:
            base = out
        else:
            assert out.equals(base)


def test_grouped_ndv_empty_input_keeps_schema():
    empty = rd.from_arrow(
        pa.table({"g": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    out = grouped_approx_distinct(empty, "g", "v", p=8)
    # NOTE: Dataset.to_pandas() on an all-empty dataset drops columns (Ray
    # 2.49 quirk), so the schema is the contract to assert here
    assert out.schema().names == ["g", "approx_ndv", "zeros", "s_scaled"]
    assert out.count() == 0


def test_hll_exact_stats_matches_float_estimator():
    rng = np.random.default_rng(2)
    for card in (30, 500, 20000):
        sk = HllSketch(8).add_hashes(
            column_hash64(rng.integers(0, card, card * 3).astype(np.int64))
        )
        zeros, s_scaled, ndv = hll_exact_stats(sk.registers, 8)
        # the float-path estimator and the exact-integer path agree to
        # within a unit (different summation orders)
        assert abs(ndv - int(np.floor(sk.estimate()))) <= 1
        assert zeros == int((sk.registers == 0).sum())
        # S = sum 2^(rmax-reg) reproduced independently
        rmax = 64 - 8 + 1
        assert s_scaled == sum(1 << (rmax - int(r)) for r in sk.registers)


def test_hll_exact_stats_validates_register_shape():
    import pytest

    with pytest.raises(ValueError):
        hll_exact_stats(np.zeros(100, np.uint8), 8)


def test_column_hash64_native_numeric_path_is_deterministic():
    v = np.array([1, 2, 3, -5, 2**62], np.int64)
    a, b = column_hash64(v), column_hash64(v.copy())
    assert np.array_equal(a, b) and a.dtype == np.uint64
    s = np.array(["a", "b", "a"], object)
    sa = column_hash64(s)
    assert sa[0] == sa[2] and sa[0] != sa[1]


def test_grouped_ndv_duckdb_oracle_parity_both_branches():
    """The full SQL re-derivation (register index, bin()-based rank,
    HUGEINT harmonic sum, both estimate branches) agrees bit-for-bit with
    the engine on a corpus that exercises the LC branch ('tiny') AND the
    raw branch ('big')."""
    df = _corpus(3)
    out = (
        grouped_approx_distinct(rd.from_pandas(df), "g", "v", p=8)
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    side = pd.DataFrame({"g": df["g"], "h": column_hash64(df["v"].to_numpy())})
    con = duckdb.connect()
    con.register("side", side)
    sql = """
    WITH parts AS (
        SELECT g, CAST(h >> 56 AS BIGINT) AS idx,
               h & ((1::UBIGINT << 56) - 1) AS low56
        FROM side
    ),
    ranks AS (
        SELECT g, idx,
               MAX(CASE WHEN low56 > 0 THEN 57 - length(bin(low56))
                        ELSE 57 END) AS rank
        FROM parts GROUP BY g, idx
    ),
    gs AS (
        SELECT g, 256 - COUNT(*) AS zeros,
               SUM(CAST(1 AS HUGEINT) << (57 - rank))
                 + (256 - COUNT(*)) * (CAST(1 AS HUGEINT) << 57) AS s_scaled
        FROM ranks GROUP BY g
    ),
    est AS (
        SELECT g, zeros, s_scaled,
               0.7213 / (1 + 1.079 / 256) * 256 * 256 * POWER(2, 57)
                 / CAST(s_scaled AS DOUBLE) AS e
        FROM gs
    )
    SELECT g,
           CAST(FLOOR(CASE WHEN e <= 2.5 * 256 AND zeros > 0
                           THEN 256 * LN(256 / CAST(zeros AS DOUBLE))
                           ELSE e END) AS BIGINT) AS approx_ndv,
           CAST(zeros AS BIGINT) AS zeros,
           CAST(s_scaled AS VARCHAR) AS s_scaled
    FROM est ORDER BY g
    """
    ora = con.execute(sql).fetchdf()
    lc = out.loc[out["g"] == "tiny", "zeros"].iloc[0]
    assert lc > 0  # tiny group really is in the linear-counting branch
    assert out["zeros"].min() == 0 or len(out) == 3  # big group raw branch
    a = out.astype({"s_scaled": str})
    b = ora.astype({"s_scaled": str})
    assert a.equals(b)
