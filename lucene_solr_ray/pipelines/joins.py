"""Join operators, Ray-Data-first.

Re-expressions of the Solr streaming-expression join zoo (SURVEY.md §2.5):

- ``broadcast_hash_join``: HashJoinStream/OuterHashJoinStream semantics
  (``solr/solrj/.../io/stream/HashJoinStream.java:38-65`` — hash side fully
  read into a map, stream side probes). Small side is ``ray.put`` ONCE and
  probed inside ``map_batches`` — no shuffle, the small-side lookup is
  never re-shipped per batch.
- ``partitioned_hash_join``: InnerJoinStream/BiJoinStream semantics
  (``io/stream/InnerJoinStream.java``) for two large sides: Ray's native
  hash-shuffle join, partitions scaled to the cluster (the sorted-stream
  precondition of the reference is unnecessary under hash partitioning).
- ``semi_join`` / ``anti_join``: IntersectStream / ComplementStream
  (``io/stream/IntersectStream.java``, ``ComplementStream.java``) via a
  broadcast key set + vectorized membership filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def broadcast_hash_join(
    left: rd.Dataset,
    right: pa.Table,
    on: str,
    how: str = "inner",
    right_on: str | None = None,
) -> rd.Dataset:
    """Probe-side Dataset x broadcast build-side Table."""
    right_df = right.to_pandas()
    right_ref = ray.put(right_df)
    right_on = right_on or on

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(right_ref)
        return batch.merge(small, how=how, left_on=on, right_on=right_on)

    return left.map_batches(probe, batch_format="pandas")


def semi_join(left: rd.Dataset, keys: np.ndarray, on: str) -> rd.Dataset:
    """Keep left rows whose key is in ``keys`` (broadcast key set)."""
    key_ref = ray.put(np.unique(keys))

    def fil(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(key_ref)
        return batch[np.isin(batch[on].to_numpy(), ks)]

    return left.map_batches(fil, batch_format="pandas")


def anti_join(left: rd.Dataset, keys: np.ndarray, on: str) -> rd.Dataset:
    """Keep left rows whose key is NOT in ``keys``."""
    key_ref = ray.put(np.unique(keys))

    def fil(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(key_ref)
        return batch[~np.isin(batch[on].to_numpy(), ks)]

    return left.map_batches(fil, batch_format="pandas")


def partitioned_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    how: str = "inner",
    right_on: str | None = None,
    partitions_cap: int = 64,
) -> rd.Dataset:
    """Two-large-sides hash join: Ray's native hash-shuffle join
    (InnerJoinStream/BiJoinStream semantics, both sides large). One
    shuffle keyed on the join key, no schema padding, no type round-trip;
    partition count scales with the cluster (see ``util.native_join``).
    """
    from .util import native_join

    right_on = right_on or on
    lcols = left.schema().names
    rcols = right.schema().names
    overlap = (set(lcols) & set(rcols)) - ({on} if on == right_on else set())
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")
    join_type = {"inner": "inner", "left": "left_outer",
                 "right": "right_outer", "outer": "full_outer"}[how]
    return native_join(left, right, on=on, right_on=right_on,
                       join_type=join_type, partitions_cap=partitions_cap)
