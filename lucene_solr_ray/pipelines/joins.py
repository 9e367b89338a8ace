"""Join operators, Ray-Data-first.

Re-expressions of the Solr streaming-expression join zoo (SURVEY.md §2.5):

- ``broadcast_hash_join``: HashJoinStream/OuterHashJoinStream semantics
  (``solr/solrj/.../io/stream/HashJoinStream.java:38-65`` — hash side fully
  read into a map, stream side probes). Small side is ``ray.put`` ONCE and
  probed inside ``map_batches`` — no shuffle, the small-side lookup is
  never re-shipped per batch.
- ``partitioned_hash_join``: InnerJoinStream/BiJoinStream semantics
  (``io/stream/InnerJoinStream.java``) for two large sides: both sides are
  bucketed by key hash, co-grouped with one shuffle, and merged pairwise
  inside ``map_groups`` (the portable partitioned hash join; the sorted-
  stream precondition of the reference is unnecessary under hash
  partitioning).
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
    num_buckets: int = 32,
    how: str = "inner",
    right_on: str | None = None,
) -> rd.Dataset:
    """Two-large-sides hash join: bucket both sides by key hash, one
    co-grouping shuffle, pandas merge per bucket.

    Scale note: ``num_buckets`` bounds per-task memory to
    ~(|L|+|R|)/num_buckets; skewed keys should be salted into sub-buckets
    before calling (not needed for the test workloads).
    """
    right_on = right_on or on
    lcols = left.schema().names
    rcols = right.schema().names
    overlap = (set(lcols) & set(rcols)) - ({on} if on == right_on else set())
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")

    def tag(side: str, key: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            # cheap deterministic int hash; keys are ints in the workloads
            out["__bucket"] = (pd.util.hash_array(
                batch[key].to_numpy()) % num_buckets).astype(np.int64)
            out["__side"] = side
            return out
        return fn

    l2 = left.map_batches(tag("l", on), batch_format="pandas")
    r2 = right.map_batches(tag("r", right_on), batch_format="pandas")

    # union requires identical schemas: pad each side with the other's columns
    def pad(cols_missing: list[str]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            for c in cols_missing:
                batch[c] = None
            return batch
        return fn

    l3 = l2.map_batches(pad([c for c in rcols if c not in lcols]),
                        batch_format="pandas")
    r3 = r2.map_batches(pad([c for c in lcols if c not in rcols]),
                        batch_format="pandas")
    ordered = sorted(set(lcols) | set(rcols)) + ["__bucket", "__side"]
    l3 = l3.select_columns(ordered)
    r3 = r3.select_columns(ordered)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lpart = group[group["__side"] == "l"][lcols]
        rpart = group[group["__side"] == "r"][rcols]
        return lpart.merge(rpart, how=how, left_on=on, right_on=right_on)

    joined = l3.union(r3).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")

    # the padded union nulls promote int columns to float in pandas;
    # cast every column back to its source Arrow type
    lsch, rsch = left.schema(), right.schema()
    types = dict(zip(lsch.names, lsch.types)) | dict(zip(rsch.names, rsch.types))

    def recast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            target = types.get(name)
            cols[name] = col.cast(target) if target is not None else col
        return pa.table(cols)

    return joined.map_batches(recast, batch_format="pyarrow")
