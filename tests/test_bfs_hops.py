"""Planted-graph proofs for the frontier-expansion BFS."""

import pandas as pd
import pyarrow as pa
import ray.data


def _edges(pairs, undirected=True):
    src = [a for a, b in pairs] + ([b for a, b in pairs]
                                   if undirected else [])
    dst = [b for a, b in pairs] + ([a for a, b in pairs]
                                   if undirected else [])
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _sources(nodes):
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64())}))


def _run(pairs, sources, max_depth, undirected=True):
    from video_features_ray.stages.graph import bfs_hops

    out = bfs_hops(_edges(pairs, undirected), _sources(sources),
                   max_depth=max_depth, num_buckets=4).to_pandas()
    return dict(zip(out["node"], out["depth"]))


def test_path_graph_depths_and_cutoff():
    # 0-1-2-3-4-5: depth caps at 3, nodes 4,5 unreachable within it
    got = _run([(i, i + 1) for i in range(5)], [0], max_depth=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_shortest_path_wins_over_longer():
    # triangle 0-1, 1-2, 0-2 plus tail 2-3: node 2 is depth 1 (direct)
    got = _run([(0, 1), (1, 2), (0, 2), (2, 3)], [0], max_depth=3)
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_disconnected_component_excluded():
    got = _run([(0, 1), (10, 11)], [0], max_depth=3)
    assert got == {0: 0, 1: 1}


def test_multi_source_min_distance():
    # sources at both ends of a path: middle settles at min distance
    got = _run([(i, i + 1) for i in range(4)], [0, 4], max_depth=3)
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_directed_respects_edge_direction():
    got = _run([(0, 1), (1, 2), (3, 0)], [0], max_depth=3,
               undirected=False)
    assert got == {0: 0, 1: 1, 2: 2}  # 3 -> 0 never traversed
