"""Connected components + near-dup cluster dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.graphcc import (
    _unionfind_components,
    connected_components,
    near_dup_clusters,
)


def _ref_components(pairs):
    """Brute-force BFS reference."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: dict = {}
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], []
        vis = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in vis:
                    vis.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            seen[x] = root
    return seen


def test_unionfind_matches_bfs():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 300, 500).astype(np.int64)
    b = rng.integers(0, 300, 500).astype(np.int64)
    got = _unionfind_components(a, b)
    want = _ref_components(list(zip(a.tolist(), b.tolist())))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_connected_components_local_and_distributed_agree():
    """The distributed hash-min propagation equals the local union-find
    on a graph with a 6-node path (multi-iteration convergence), a
    clique, and pairs."""
    import ray.data as rd

    pairs = (
        [(i, i + 1) for i in range(10, 16)]          # path, diameter 6
        + [(a, b) for a in (30, 31, 32) for b in (31, 32, 33) if a < b]
        + [(50, 51), (60, 61)]
    )
    t = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs], pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    loc = (
        connected_components(ds, mode="local")
        .to_pandas().sort_values("node", ignore_index=True)
    )
    dist = (
        connected_components(ds, mode="distributed", num_partitions=4)
        .to_pandas().sort_values("node", ignore_index=True)
    )
    assert loc.values.tolist() == dist.values.tolist()
    want = _ref_components(pairs)
    assert dict(zip(loc.node, loc.cluster_id)) == want


@pytest.mark.usefixtures("ray_session")
def test_near_dup_clusters_keep_set():
    import ray.data as rd

    corpus = pa.table({"doc_id": pa.array(list(range(8)), pa.int64())})
    pairs = pa.table(
        {
            "id_a": pa.array([0, 1, 5], pa.int64()),
            "id_b": pa.array([1, 2, 6], pa.int64()),
        }
    )
    out = (
        near_dup_clusters(rd.from_arrow(corpus), rd.from_arrow(pairs))
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    # {0,1,2} -> 0; {5,6} -> 5; singletons self
    assert out.cluster_id.tolist() == [0, 0, 0, 3, 4, 5, 5, 7]
    assert out.is_rep.tolist() == [1, 0, 0, 1, 1, 1, 0, 1]


@pytest.mark.usefixtures("ray_session")
def test_triangle_counts_vs_bruteforce():
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.graphcc import triangle_counts

    rng = np.random.default_rng(9)
    n = 40
    # random directed multigraph with self loops and both orientations
    u = rng.integers(0, n, 600)
    v = rng.integers(0, n, 600)
    ds = rd.from_arrow(pa.table({"u": u, "v": v})).repartition(5)
    out = {
        r["host"]: r["n_triangles"]
        for r in triangle_counts(ds, num_buckets=4).take_all()
    }
    adj = np.zeros((n, n), dtype=bool)
    a, b = np.minimum(u, v), np.maximum(u, v)
    keep = a != b
    adj[a[keep], b[keep]] = True
    adj |= adj.T
    exp = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if adj[x, y] and adj[y, z] and adj[x, z]:
            for t in (x, y, z):
                exp[t] = exp.get(t, 0) + 1
    assert out == exp


@pytest.mark.usefixtures("ray_session")
def test_bfs_levels_path_graph_depths():
    import ray.data as rd

    from geodata_ray.stages.graphcc import bfs_levels

    # path 0->1->2->3->4 plus a shortcut 10->3; seeds {0, 10}
    edges = pd.DataFrame(
        {"u": [0, 1, 2, 3, 10], "v": [1, 2, 3, 4, 3]}
    )
    out = (
        bfs_levels(rd.from_pandas(edges).repartition(2), seeds=[0, 10],
                   max_depth=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    # node 3: min(3 hops via path, 1 hop via shortcut) = 1; node 4 at 2;
    # depth cap excludes nothing else here
    assert out == {0: 0, 10: 0, 1: 1, 3: 1, 2: 2, 4: 2}
    # depth cap: with max_depth=1, node 2 and 4 are absent
    out1 = bfs_levels(rd.from_pandas(edges), seeds=[0, 10], max_depth=1)
    got = set(out1.to_pandas()["node"])
    assert got == {0, 10, 1, 3}
    # node_bound guard raises instead of silently degrading
    with pytest.raises(ValueError):
        bfs_levels(rd.from_pandas(edges), seeds=[0], node_bound=1)
