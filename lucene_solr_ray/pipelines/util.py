"""Shared helpers for the operator pipelines."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read of one test table."""
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def round_away(arr: pa.ChunkedArray | pa.Array, ndigits: int) -> pa.Array:
    """Bit-exact replication of DuckDB ROUND(double, n):
    sign(x) * floor(|x| * 10^n + 0.5) / 10^n in float64.

    (pyarrow's pc.round uses a different scaled algorithm and disagrees in
    the last ulp, which breaks value-hash comparisons.)
    """
    import numpy as np

    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    p = np.float64(10.0) ** ndigits
    out = np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p
    return pa.array(out, type=pa.float64())


def round_col(batch: pa.Table, col: str, ndigits: int, out: str | None = None) -> pa.Table:
    rounded = round_away(batch.column(col), ndigits)
    out = out or col
    if out in batch.column_names:
        batch = batch.drop_columns([out])
    return batch.append_column(out, rounded)


def _block_as_schema(block, schema: pa.Schema) -> pa.Table:
    """Convert one block (pandas or arrow) to a pyarrow table with exactly
    ``schema`` (column selection + cast)."""
    import pandas as pd

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    return pa.table(
        {name: block.column(name).cast(schema.field(name).type)
         for name in schema.names})


def materialize_typed(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Materialize ``ds`` and rebuild it from only its NON-EMPTY blocks,
    each cast to ``schema``.

    Why this exists: Ray's groupby/map_groups/aggregate ops emit
    zero-column (schema-less) empty blocks for empty hash partitions, and
    ``map_batches`` never invokes its fn on an empty block — the block is
    forwarded untouched. So fn-level schema normalizers cannot repair
    these, and a schema-less block reaching a hash-shuffle join's
    build side crashes pyarrow with "No match ... for key field". The
    fix has to happen at the block level: drop empty blocks, declare the
    schema on the rest (tiny remote task per block; no driver copies).
    The partition-count-dependence (more CPUs -> more empty partitions)
    is why the bug appears only at production parallelism.
    """
    import ray

    mat = ds.materialize()
    refs = [r for b in mat.iter_internal_ref_bundles()
            for r, m in zip(b.block_refs, b.metadata) if m.num_rows]
    if not refs:
        return rd.from_arrow(schema.empty_table())
    cast = ray.remote(num_cpus=0.1)(_block_as_schema)
    return rd.from_arrow_refs([cast.remote(r, schema) for r in refs])


def native_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    partitions_cap: int = 64,
) -> rd.Dataset:
    """Ray hash-shuffle join with cluster-adaptive partitioning.

    ``num_partitions`` scales with the cluster's CPU count (capped) and the
    aggregator actors are granted fractional CPUs so producers, aggregators
    and downstream stages can all make progress on small clusters — with
    the defaults, a 16-partition join on a 4-CPU cluster deadlocks waiting
    for 16 whole-CPU aggregator actors.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    nparts = max(2, min(partitions_cap, cpus // 2))
    # several shuffle ops can be live in one streaming DAG; keep each
    # join's aggregator reservation to ~1/4 of the cluster so producers
    # and sibling shuffles can still run
    agg_cpus = max(0.1, min(1.0, (cpus / 4) / nparts))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=nparts,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        aggregator_ray_remote_args={"num_cpus": agg_cpus},
    )


def bucketed_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    fn,
    pre=None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Hash-partitioned vectorized group aggregation.

    Ray's ``groupby().aggregate(...)`` pays ~1ms of Python accumulator
    overhead PER DISTINCT GROUP, which is pathological for high-cardinality
    keys (terms, pair-ids, signatures). This helper shuffles once on a
    synthetic bucket key (hash of the group keys, ~2 buckets per CPU) and
    runs ONE vectorized pandas aggregation per bucket instead.

    ``fn(df) -> df``: the vectorized per-bucket aggregation (e.g.
    ``df.groupby(keys).size()``). ``pre`` (optional): a per-batch partial
    combiner applied BEFORE the shuffle to shrink it; ``fn`` must then
    merge partials.
    """
    import numpy as np
    import pandas as pd

    import ray

    if num_buckets is None:
        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        num_buckets = max(4, 2 * cpus)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 and not all(k in batch.columns for k in keys):
            # upstream group ops can emit zero-column empty blocks
            return pd.DataFrame({"__bucket": pd.Series(dtype=np.int64)})
        if pre is not None:
            batch = pre(batch)
        h = np.zeros(len(batch), dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(1099511628211) ^ pd.util.hash_array(
                batch[k].to_numpy())
        # assign (copy-on-write) instead of copy()+setitem: one shallow
        # copy, not a second full data copy under every high-cardinality
        # aggregation (term_df, dedup, LSH)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))
