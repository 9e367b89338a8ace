"""Export stream: full sorted result-set export with global ranks.

SortingResponseWriter + ExportQParserPlugin semantics
(``solr/core/.../response/SortingResponseWriter.java:62-116``): stream the
ENTIRE result set in sort order. Ray-side: ``ds.sort`` (the distributed
sort) then a block-offset pass attaches the global rank — the same
materialize + prefix-sum idiom as doc_id assignment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .util import read


@ray.remote
def _count(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _add_rank(block: pa.Table, offset: int) -> pa.Table:
    return block.append_column(
        "rnk", pa.array(np.arange(offset + 1, offset + 1 + block.num_rows),
                        type=pa.int64()))


def attach_global_rank(ds: rd.Dataset) -> rd.Dataset:
    """1-based global rank in the dataset's current order."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return rd.from_arrow_refs(
        [_add_rank.remote(r, int(offsets[i])) for i, r in enumerate(refs)])


def export_sorted_orders(sf_dir: str) -> rd.Dataset:
    """Entire orders table exported in (o_orderdate, o_orderkey) order with
    global rank — the export-handler workload."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    ordered = ds.sort(["o_orderdate", "o_orderkey"])
    return attach_global_rank(ordered)


def update_stream_to_parquet(ds: rd.Dataset, out_dir: str) -> str:
    """UpdateStream analog (io/stream/UpdateStream.java): sink a stream's
    tuples into a second store (partitioned parquet)."""
    ds.write_parquet(out_dir)
    return out_dir
