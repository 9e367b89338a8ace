"""Graph traversal streams (GatherNodesStream / ShortestPathStream)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.graph import gather_nodes, shortest_path
from lucene_solr_ray.pipelines.streaming_expr import evaluate


def _edges(pairs):
    return rd.from_arrow(pa.table({
        "f": pa.array([a for a, _ in pairs], type=pa.int64()),
        "t": pa.array([b for _, b in pairs], type=pa.int64()),
    }))


def test_gather_nodes_levels_and_scatter(ray_session):
    # 1 -> 2 -> 3 -> 4, 1 -> 3 (shortcut)
    e = _edges([(1, 2), (2, 3), (3, 4), (1, 3)])
    out = gather_nodes(e, [1], "f", "t", depth=3).to_pandas()
    got = dict(zip(out["node"], out["level"]))
    # node 3 keeps its FIRST level (1 via the shortcut), 4 is level 2
    assert got == {2: 1, 3: 1, 4: 2}
    b = gather_nodes(e, [1], "f", "t", depth=1,
                     scatter="branches").to_pandas()
    assert dict(zip(b["node"], b["level"])) == {1: 0, 2: 1, 3: 1}


def test_shortest_path_bfs(ray_session):
    # two routes 1->5: length 4 (1-2-3-4-5) and length 2 (1-6-5)
    e = _edges([(1, 2), (2, 3), (3, 4), (4, 5), (1, 6), (6, 5)])
    path = shortest_path(e, 1, 5, "f", "t", max_depth=6)
    assert path == [1, 6, 5]
    assert shortest_path(e, 1, 1, "f", "t") == [1]
    assert shortest_path(e, 5, 1, "f", "t", max_depth=6) is None  # directed
    assert shortest_path(e, 1, 99, "f", "t", max_depth=3) is None


def test_shortest_path_respects_max_depth(ray_session):
    e = _edges([(1, 2), (2, 3), (3, 4)])
    assert shortest_path(e, 1, 4, "f", "t", max_depth=2) is None
    assert shortest_path(e, 1, 4, "f", "t", max_depth=3) == [1, 2, 3, 4]


def test_gather_cycle_terminates(ray_session):
    e = _edges([(1, 2), (2, 1)])
    out = gather_nodes(e, [1], "f", "t", depth=10).to_pandas()
    assert dict(zip(out["node"], out["level"])) == {2: 1}


def test_streaming_expr_graph_functions(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "f": pa.array([1, 2, 3, 1, 6], type=pa.int64()),
        "t": pa.array([2, 3, 4, 6, 4], type=pa.int64()),
    }), str(tmp_path / "events.parquet"))  # reuse a registered table name
    out = evaluate('gatherNodes(events, root="1", walk="f->t", depth="2")',
                   str(tmp_path)).to_pandas()
    assert set(out["node"]) == {2, 6, 3, 4}
    sp = evaluate('shortestPath(events, from="1", to="4", edge="f=t", '
                  'maxDepth="5")', str(tmp_path)).to_pandas()
    assert sp["node"].tolist() == [1, 6, 4]
    assert sp["step"].tolist() == [0, 1, 2]
