"""Multi-source BFS distances vs a pure-Python BFS and the DuckDB twin."""

from collections import deque

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.bfs import (
    bfs_distances,
    bfs_distances_sql,
    distance_histogram,
)

# chain 0->1->2->3->4, a shortcut 0->3, a cycle back 4->0, a branch 1->5,
# an unreachable pair 8->9, and a self-loop (ignored)
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 0), (1, 5),
    (8, 9), (2, 2),
]


def _py_bfs(edges, seeds, max_depth):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == max_depth:
            continue
        for v in sorted(adj.get(u, ())):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("seeds", [[0], [0, 8], [5]])
def test_bfs_matches_python(spark, seeds):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, seeds, max_depth=3).collect()
    }
    assert got == _py_bfs(EDGES, seeds, 3)


def test_bfs_duckdb_twin(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, [0, 8], max_depth=3).collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = bfs_distances_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", [0, 8], 3
    )
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert got == oracle


def test_bfs_seed_outside_graph_and_depth0(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, [99], max_depth=2).collect()
    }
    assert got == {99: 0}
    got0 = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, [0], max_depth=0).collect()
    }
    assert got0 == {0: 0}


def test_distance_histogram(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    hist = {
        r["dist"]: r["n_nodes"]
        for r in distance_histogram(
            bfs_distances(df, [0], max_depth=3)
        ).collect()
    }
    # dist 0: {0}; dist 1: {1,3}; dist 2: {2,4,5}
    assert hist == {0: 1, 1: 2, 2: 3}
