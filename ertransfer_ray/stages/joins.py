"""Join/lookup stages (reference J3/J5/J6 family).

Strategy selection, per the scale rules this engine is designed around:

- **Small side** (dimension table, golden pair set, blocklist): broadcast
  once via ``ray.put`` and look up inside ``map_batches`` — no shuffle.
  This is the engine's analog of the reference's id → payload ``.loc`` join
  (/root/reference/splitters/KNN-Join/splitter.py:96-103) and golden-set
  membership label (splitter.py:89-91).
- **Both sides large**: Ray Data's hash-partitioned ``Dataset.join``
  (Ray ≥ 2.46), partition count sized by the caller.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def put_broadcast(obj) -> "ray.ObjectRef":
    """Ship a small lookup structure to the object store ONCE; tasks/actors
    read it zero-copy instead of re-serializing it per batch."""
    return ray.put(obj)


#: per-worker-process cache of assembled broadcast lookups, keyed by the
#: block-ref set. Stateless tasks reuse worker processes, so the build cost
#: (ray.get + concat + index) is paid once per worker — the actor-pool
#: benefit without actor startup latency or CPU reservations.
_SIDE_CACHE: dict[tuple, object] = {}
_SIDE_CACHE_MAX = 4


def cached_side(refs: list, build):
    """Assemble-once-per-worker lookup from object-store block refs.
    ``build(pa.Table) -> lookup`` runs on the concatenated blocks."""
    key = tuple(r.hex() for r in refs)
    hit = _SIDE_CACHE.get(key)
    if hit is None:
        if len(_SIDE_CACHE) >= _SIDE_CACHE_MAX:
            _SIDE_CACHE.pop(next(iter(_SIDE_CACHE)))
        hit = build(pa.concat_tables(ray.get(list(refs))))
        _SIDE_CACHE[key] = hit
    return hit


def consolidated_refs(ds) -> list:
    """Publish a broadcastable Dataset as ONE object-store table ref.

    Shipping a side as raw ``to_arrow_refs`` block refs makes every worker
    issue |blocks| serialized plasma fetches — measured as a 25 s convoy at
    32 workers x ~640 blocks in the pair-payload attach — where one
    put-once table costs ~0.2 s and is read zero-copy per node. Only valid
    for sides the caller already bounds to a worker heap (the same
    precondition as any broadcast join).
    """
    tbls = ray.get(ds.materialize().to_arrow_refs())
    nonempty = [t for t in tbls if t.num_rows > 0]
    if nonempty:
        tbl = pa.concat_tables(nonempty).combine_chunks()
    elif tbls:
        tbl = tbls[0]  # keep an empty table WITH schema
    else:
        tbl = pa.table({})
    return [ray.put(tbl)]


class BroadcastSemiJoin:
    """Keep rows whose key is in a broadcast key set (semi) or not (anti).

    Reference M10 match-validity filter (splitter.py:167-170) and J6 anti-join.
    Used as ``ds.map_batches(BroadcastSemiJoin(ref, "k"), batch_format="pyarrow")``.
    Membership is the Arrow ``is_in`` kernel over a value set built once per
    task/actor — not a per-row Python loop.
    """

    def __init__(self, keys_ref, col: str, anti: bool = False):
        self._ref = keys_ref
        self.col = col
        self.anti = anti
        self._keys: pa.Array | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self._keys is None:
            keys = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self._keys = keys if isinstance(keys, pa.Array) else pa.array(list(keys))
        # null keys are never "in" the set (fill before invert so anti keeps
        # null rows, matching Python `None in set` → False semantics)
        mask = pc.fill_null(
            pc.is_in(batch.column(self.col), value_set=self._keys), False
        )
        if self.anti:
            mask = pc.invert(mask)
        return batch.filter(mask)


class BroadcastHashJoin:
    """Left join a batch against a broadcast pandas DataFrame on ``on``.

    The small side is ``ray.put`` once by the caller; each task/actor fetches
    it once (cached on the instance), then joins per batch with pandas merge.
    Reference J3 payload lookup without the shuffle.
    """

    def __init__(self, small_ref, on: str | list[str], how: str = "left"):
        self._ref = small_ref
        self.on = on
        self.how = how
        self._small: pd.DataFrame | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._small is None:
            small = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self._small = small
        return batch.merge(self._small, on=self.on, how=self.how)


def dataset_hash_join(
    left,
    right,
    on: str | tuple[str, ...],
    *,
    how: str = "inner",
    num_partitions: int = 16,
    right_on: str | tuple[str, ...] | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
):
    """Large-large hash join via ``Dataset.join`` (both sides shuffled on key)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_on = None
    if right_on is not None:
        r_on = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def bucketed_anti_semi_join(
    probe,
    build,
    probe_on: str,
    build_on: str | None = None,
    anti: bool = True,
    num_buckets: int | None = None,
):
    """Distributed (anti-)semi-join with NO driver materialization: keep
    probe rows whose key is absent from (``anti=True``) / present in the
    build side. Both sides are tagged, EXCHANGED on the key
    (groupby.exchange_group_apply, arrow-native tagged union with typed
    nulls — the same form as ``bucketed_join``), and filtered per bucket
    with a vectorized ``isin`` — one shuffle each, cogroup shape (Ray
    2.49's hash join chokes on empty partitions, which shrinking iterative
    frontiers hit constantly; its sort-based groupby measured ~10x slower
    than the exchange on string-heavy tagged unions).
    """
    import pyarrow.compute as pc

    from .groupby import exchange_group_apply

    build_on = build_on or probe_on
    p_schema = probe.schema()
    probe_cols = list(p_schema.names)
    types = {c: _arrow_field_type(p_schema, c) for c in probe_cols}
    jk_type = _join_key_caster(
        _arrow_field_type(p_schema, probe_on),
        _arrow_field_type(build.schema(), build_on),
    )

    def tag_probe(t: pa.Table) -> pa.Table:
        cols: dict = {
            "_jk": pc.cast(t.column(probe_on), jk_type),
            "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        }
        for c in probe_cols:
            col = t.column(c)
            # a null target type means the schema was inferred from an
            # empty/all-null block — keep the column's real type; the
            # exchange concat promotes null-typed fills to match
            if pa.types.is_null(types[c]) or col.type == types[c]:
                cols[c] = col
            else:
                cols[c] = pc.cast(col, types[c])
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict = {
            "_jk": pc.cast(t.column(build_on), jk_type),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in probe_cols:
            cols[c] = _neutral_fill(n, types[c])
        return pa.table(cols)

    both = probe.map_batches(tag_probe, batch_format="pyarrow").union(
        build.map_batches(tag_build, batch_format="pyarrow")
    )

    def filter_bucket(df: pd.DataFrame) -> pd.DataFrame:
        present = df.loc[df["_side"] == 1, "_jk"].unique()
        rows = df[df["_side"] == 0]
        keep = rows["_jk"].isin(present)
        if anti:
            keep = ~keep
        return rows.loc[keep, probe_cols]

    return exchange_group_apply(both, "_jk", filter_bucket, num_buckets)


def keys_of(ds, col: str) -> list:
    """Collect one small key column to the driver (for broadcast joins).
    Only valid when the column is known-small (dimension side)."""
    return [r[col] for r in ds.select_columns([col]).take_all()]


def _neutral_fill(n: int, t: pa.DataType) -> pa.Array:
    """Absent-side fill for tagged unions. INTEGER columns get a 0 sentinel,
    not nulls: an arrow int column with any null converts to float64 in
    pandas, silently corrupting values above 2^53 (ids are often 64-bit
    hashes). The filled rows belong to the other side and are dropped or
    ignored before any value is read, so the sentinel never leaks."""
    if pa.types.is_integer(t):
        return pa.array(np.zeros(n, dtype=t.to_pandas_dtype()))
    return pa.nulls(n, t)


def _join_key_caster(*key_types):
    """How to normalize join-key columns into one ``_jk`` dtype: keep the
    native integer type when every side's key is an integer (int keys then
    ride the exchange's fixed-width fast path and merge as ints), else
    cast to string (the historical astype(str) semantics)."""
    if all(pa.types.is_integer(t) for t in key_types):
        target = max(key_types, key=lambda t: t.bit_width)
        return target
    return pa.string()


def _arrow_field_type(ds_schema, name: str):
    """Arrow type of one column from a Dataset schema — exact for
    arrow-block datasets (base_schema), numpy-mapped for pandas-block ones
    (object dtype → string, the only object columns these joins carry)."""
    bs = getattr(ds_schema, "base_schema", None)
    if isinstance(bs, pa.Schema):
        return bs.field(name).type
    t = dict(zip(ds_schema.names, ds_schema.types))[name]
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def bucketed_join(
    left,
    right,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int | None = None,
):
    """Large-large cogroup hash join: union both sides with a side tag,
    EXCHANGE on the join key (groupby.exchange_group_apply — one raw hash
    shuffle, no sort), pandas-merge inside each bucket. Robust where
    ``Dataset.join`` is not (empty hash partitions — see clustering.py) and
    shuffles each side exactly once.

    The tagged union is ARROW-native: each side fills the other side's
    columns with typed nulls (``pa.nulls``) so every block shares one
    schema — the prerequisite for the exchange's arrow concat. The previous
    pandas-block form rode Ray Data's sort-based groupby, which measured
    8.5 s / 22 s for the two attach joins of a 6.7k-pair verify at 1.6M
    docs where the exchange form takes ~1.6 s each.

    Column sets of the two sides must be disjoint apart from the join key;
    the join key is matched ``left_on`` = ``right_on`` (compared as
    strings when either side's key is non-integer, natively when both are
    ints — int keys then ride the exchange's fixed-width hash fast path).
    """
    import pyarrow.compute as pc

    from .groupby import exchange_group_apply

    right_on = right_on or left_on
    l_schema = left.schema()
    r_schema = right.schema()
    overlap = (set(l_schema.names) & set(r_schema.names)) - {left_on}
    if overlap:
        raise ValueError(f"bucketed_join: overlapping non-key columns {overlap}")

    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c != right_on]
    types = {c: _arrow_field_type(l_schema, c) for c in l_cols}
    types.update({c: _arrow_field_type(r_schema, c) for c in r_cols})
    jk_type = _join_key_caster(
        _arrow_field_type(l_schema, left_on),
        _arrow_field_type(r_schema, right_on),
    )

    def tag(side: int, key_col: str, own: set):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict = {
                "_jk": pc.cast(t.column(key_col), jk_type),
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in l_cols + r_cols:
                if c in own:
                    col = t.column(c)
                    if pa.types.is_null(types[c]) or col.type == types[c]:
                        cols[c] = col
                    else:
                        cols[c] = pc.cast(col, types[c])
                else:
                    cols[c] = _neutral_fill(n, types[c])
            return pa.table(cols)

        return fn

    both = left.map_batches(
        tag(0, left_on, set(l_cols)), batch_format="pyarrow"
    ).union(right.map_batches(tag(1, right_on, set(r_cols)), batch_format="pyarrow"))

    # original dtypes: absent-side nulls degrade columns that rode a mixed
    # pandas conversion to object (e.g. int8 flags). Restore after the merge
    # where the cast is lossless; columns that legitimately hold NaN
    # (outer-join misses) keep object.
    def _dtype_map(ds_schema):
        out = {}
        for name, typ in zip(ds_schema.names, ds_schema.types):
            if isinstance(typ, np.dtype):  # pandas-block datasets
                out[name] = typ
                continue
            try:
                out[name] = typ.to_pandas_dtype()
            except Exception:  # noqa: BLE001
                pass
        return out

    dtypes = {**_dtype_map(left.schema()), **_dtype_map(right.schema())}

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lpart = df[df["_side"] == 0][l_cols]
        rpart = df[df["_side"] == 1][["_jk"] + r_cols]
        lpart = lpart.assign(_jk=df.loc[df["_side"] == 0, "_jk"])
        out = lpart.merge(rpart, on="_jk", how=how)
        out = out.drop(columns=["_jk"])
        for c, dt in dtypes.items():
            if c in out.columns and out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (ValueError, TypeError):
                    pass
        return out

    return exchange_group_apply(both, "_jk", merge_bucket, num_buckets)
