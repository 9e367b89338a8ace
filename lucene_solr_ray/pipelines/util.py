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
