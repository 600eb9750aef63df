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


class BroadcastSemiJoin:
    """Keep rows whose key is in a broadcast key set (semi) or not (anti).

    Reference M10 match-validity filter (splitter.py:167-170) and J6 anti-join.
    Used as ``ds.map_batches(BroadcastSemiJoin(ref, "k"), batch_format="pyarrow")``.
    """

    def __init__(self, keys_ref, col: str, anti: bool = False):
        self._ref = keys_ref
        self.col = col
        self.anti = anti
        self._keys: set | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._keys is None:
            keys = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self._keys = set(keys)
        col = batch.column(self.col).to_pylist()
        mask = np.fromiter((v in self._keys for v in col), dtype=bool, count=len(col))
        if self.anti:
            mask = ~mask
        return batch.filter(pa.array(mask))


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


def keys_of(ds, col: str) -> list:
    """Collect one small key column to the driver (for broadcast joins).
    Only valid when the column is known-small (dimension side)."""
    return [r[col] for r in ds.select_columns([col]).take_all()]
