"""Graph traversal streams over edge tables.

Re-expression of the Solr graph streaming expressions
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java:54`` and ``ShortestPathStream.java``): per-level
breadth-first expansion where the EDGE TABLE streams (one filtered,
column-pruned distributed pass per level) and only the frontier /
visited node sets are held in memory — exactly the reference's
memory model (GatherNodesStream holds the gathered-node map on the
worker; ShortestPathStream keeps its visited set in memory while each
level's join runs against the collection). At frontiers too large for
one machine the distributed min-label-propagation machinery
(``dedup.minhash_dedup_keep``) is the scale path; these operators target
the root-bounded traversals the reference serves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .util import read


def _frontier_expand(edges: rd.Dataset, frontier: np.ndarray,
                     from_col: str, to_col: str) -> pd.DataFrame:
    """One BFS level: distinct (to, from-parent) pairs for edges whose
    source is in the broadcast frontier. The edge table streams; each
    batch filters vectorized against the broadcast sorted key array and
    pre-dedups before the driver merge."""
    keys_ref = ray.put(np.sort(frontier))

    def hit(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        f = batch[from_col].to_numpy()
        pos = np.searchsorted(keys, f)
        pos_ok = pos < len(keys)
        m = np.zeros(len(f), dtype=bool)
        m[pos_ok] = keys[pos[pos_ok]] == f[pos_ok]
        out = batch.loc[m, [to_col, from_col]]
        return out.drop_duplicates(to_col)

    level = edges.map_batches(hit, batch_format="pandas").to_pandas()
    if to_col not in level.columns:  # all-empty result loses its schema
        return pd.DataFrame({to_col: pd.Series(dtype=np.int64),
                             from_col: pd.Series(dtype=np.int64)})
    return level.drop_duplicates(to_col)


def gather_nodes(edges: rd.Dataset, roots, from_col: str, to_col: str,
                 depth: int = 1, scatter: str = "leaves") -> pa.Table:
    """GatherNodesStream: breadth-first gather from ``roots`` along
    ``from_col -> to_col`` edges for ``depth`` levels.

    Returns (node, level) — level 0 rows (the roots) are included only
    with ``scatter="branches"`` (the reference's scatter parameter;
    default emits leaves only, i.e. every gathered node of level >= 1).
    Nodes reached at multiple levels keep their FIRST (shortest) level.
    """
    roots = np.unique(np.asarray(list(roots), dtype=np.int64))
    visited: dict[int, int] = {int(r): 0 for r in roots}
    frontier = roots
    for level in range(1, depth + 1):
        if len(frontier) == 0:
            break
        found = _frontier_expand(edges, frontier, from_col, to_col)
        fresh = [int(n) for n in found[to_col].to_numpy()
                 if int(n) not in visited]
        for n in fresh:
            visited[n] = level
        frontier = np.asarray(fresh, dtype=np.int64)
    min_level = 0 if scatter == "branches" else 1
    rows = sorted((n, lv) for n, lv in visited.items() if lv >= min_level)
    return pa.table({
        "node": pa.array([r[0] for r in rows], type=pa.int64()),
        "level": pa.array([r[1] for r in rows], type=pa.int64()),
    })


def shortest_path(edges: rd.Dataset, src: int, dst: int, from_col: str,
                  to_col: str, max_depth: int = 6) -> list[int] | None:
    """ShortestPathStream: BFS from ``src`` until ``dst`` is reached
    (or ``max_depth`` levels), parents tracked for path reconstruction.
    Returns the node path [src, ..., dst], or None if unreachable."""
    src, dst = int(src), int(dst)
    if src == dst:
        return [src]
    parent: dict[int, int] = {src: src}
    frontier = np.asarray([src], dtype=np.int64)
    for _ in range(max_depth):
        if len(frontier) == 0:
            return None
        found = _frontier_expand(edges, frontier, from_col, to_col)
        fresh = []
        for n, p in zip(found[to_col].to_numpy(),
                        found[from_col].to_numpy()):
            n = int(n)
            if n not in parent:
                parent[n] = int(p)
                fresh.append(n)
        if dst in parent:
            path = [dst]
            while path[-1] != src:
                path.append(parent[path[-1]])
            return path[::-1]
        frontier = np.asarray(fresh, dtype=np.int64)
    return None


# --- bipartite lineitem graph helpers (driver-surface queries) ----------

_PART_OFFSET = 10_000_000  # part node ids disjoint from order ids


def _lineitem_bipartite_edges(sf_dir: str) -> rd.Dataset:
    """Undirected order <-> part graph from lineitem, as directed edges
    both ways; part nodes offset into their own id space."""
    ds = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = (t.column("l_partkey").to_numpy(zero_copy_only=False)
             + _PART_OFFSET)
        return pa.table({
            "f": pa.array(np.concatenate([o, p]), type=pa.int64()),
            "t": pa.array(np.concatenate([p, o]), type=pa.int64()),
        })

    return ds.map_batches(both, batch_format="pyarrow")


def gather_parts_of_customer(sf_dir: str, custkey: int = 7):
    """gatherNodes two-level walk: customer -> orders -> parts.
    Returns the distinct part keys (node) reachable from the customer.

    Node identity is the value, so each walked field gets its own id
    space (parts offset) — otherwise a part key numerically equal to a
    gathered orderkey would be wrongly deduped against level 1.
    """
    orders = read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    level1 = gather_nodes(orders, [custkey], "o_custkey", "o_orderkey",
                          depth=1)
    lineitem = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def offset_parts(t: pa.Table) -> pa.Table:
        p = (t.column("l_partkey").to_numpy(zero_copy_only=False)
             + _PART_OFFSET)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "part_node": pa.array(p, type=pa.int64()),
        })

    level2 = gather_nodes(
        lineitem.map_batches(offset_parts, batch_format="pyarrow"),
        level1.column("node").to_pylist(), "l_orderkey", "part_node",
        depth=1)
    parts = level2.column("node").to_numpy() - _PART_OFFSET
    return pa.table({"node": pa.array(np.sort(parts), type=pa.int64())})


def shortest_path_lineitem(sf_dir: str, max_depth: int = 4):
    """shortestPath over the order<->part bipartite graph, from the
    lowest to the highest orderkey. Returns (src, dst, hops) — empty
    when unreachable within max_depth (matches the SQL oracle's empty
    group)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    src, dst = int(keys.min()), int(keys.max())
    edges = _lineitem_bipartite_edges(sf_dir)
    path = shortest_path(edges, src, dst, "f", "t", max_depth=max_depth)
    if path is None:
        return pa.table({"src": pa.array([], type=pa.int64()),
                         "dst": pa.array([], type=pa.int64()),
                         "hops": pa.array([], type=pa.int64())})
    return pa.table({"src": pa.array([src], type=pa.int64()),
                     "dst": pa.array([dst], type=pa.int64()),
                     "hops": pa.array([len(path) - 1], type=pa.int64())})
