"""Sampled Brandes betweenness (integer nano-unit arithmetic) vs a
pure-Python replication and the DuckDB twin."""

from collections import deque

import duckdb

from ps_projekt_pagerank_spark.operators.betweenness import (
    NANO,
    betweenness_sampled,
    betweenness_sampled_sql,
)

# diamond 0->{1,2}->3->4 (two shortest paths 0->3), a side chain 2->5,
# a cycle edge 4->0, and an isolated pair 8->9
EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (2, 5), (4, 0), (8, 9),
]


def _py_brandes_nano(edges, seeds, max_depth):
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
    bc = {v: 0 for v in nodes}
    for s in seeds:
        # BFS levels + sigma
        dist = {s: 0}
        sigma = {s: 1}
        q = deque([s])
        order = []
        while q:
            u = q.popleft()
            order.append(u)
            if dist[u] == max_depth:
                continue
            for v in sorted(adj.get(u, ())):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        # backward in nano units, deepest level first
        d_nano = {}
        for u in sorted(dist, key=lambda x: -dist[x]):
            total = 0
            for w in sorted(adj.get(u, ())):
                if dist.get(w) == dist[u] + 1:
                    total += (
                        sigma[u] * (NANO + d_nano.get(w, 0))
                    ) // sigma[w]
            if total:
                d_nano[u] = total
        for v, dn in d_nano.items():
            if v != s:
                bc[v] += dn
    return bc


def test_betweenness_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["bc_nano"]
        for r in betweenness_sampled(df, [0, 8], max_depth=4).collect()
    }
    expect = _py_brandes_nano(EDGES, [0, 8], 4)
    assert got == expect
    # node 3 mediates 0->4; node 8's BFS makes 9 a pure endpoint (0)
    assert got[3] > 0 and got[9] == 0
    # the diamond: 1 and 2 each carry half the 0->3 mass, 2 also feeds 5
    assert got[2] > got[1] > 0


def test_betweenness_duckdb_twin(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        tuple(r)
        for r in betweenness_sampled(df, [0, 2, 8], max_depth=3).collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = betweenness_sampled_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", [0, 2, 8], 3
    )
    oracle = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == oracle
