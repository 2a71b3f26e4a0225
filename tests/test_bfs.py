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


def test_bfs_per_seed_matches_python(spark):
    from ps_projekt_pagerank_spark.operators.bfs import bfs_per_seed

    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        (r["seed"], r["id"]): r["dist"]
        for r in bfs_per_seed(df, [0, 8], max_depth=3).collect()
    }
    expect = {}
    for s in (0, 8):
        for nid, d in _py_bfs(EDGES, [s], 3).items():
            expect[(s, nid)] = d
    assert got == expect


def test_effective_diameter_sampled(spark):
    from ps_projekt_pagerank_spark.operators.bfs import (
        effective_diameter_sampled,
    )

    # chain 0->1->2->3->4 from seed 0: pairs at dist 0..4, one each;
    # 90th pct of 5 pairs -> needs 5 covered -> h_eff = 4
    chain = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(chain, "src LONG, dst LONG")
    row = effective_diameter_sampled(df, [0], max_depth=6).collect()[0]
    assert (row["h_eff"], row["covered_pairs"], row["total_pairs"]) == (4, 5, 5)
    assert row["coverage"] == 1.0
    # 50th pct -> 3 of 5 pairs -> h_eff = 2
    row = effective_diameter_sampled(
        df, [0], max_depth=6, quantile_pct=50
    ).collect()[0]
    assert (row["h_eff"], row["covered_pairs"]) == (2, 3)


def test_effective_diameter_duckdb_twin(spark):
    import duckdb

    from ps_projekt_pagerank_spark.operators.bfs import (
        effective_diameter_sampled,
        effective_diameter_sql,
    )

    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = tuple(
        effective_diameter_sampled(df, [0, 8], max_depth=4).collect()[0]
    )
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = effective_diameter_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", [0, 8], 4
    )
    oracle = duckdb.connect().execute(sql).fetchone()
    assert got == oracle


def test_sssp_weighted_matches_python_and_duckdb(spark):
    from ps_projekt_pagerank_spark.operators.bfs import (
        sssp_weighted,
        sssp_weighted_sql,
    )

    # 0 -> 1 (w 5) vs 0 -> 2 -> 1 (w 1+1): the 2-hop path is shorter
    wedges = [(0, 1, 5), (0, 2, 1), (2, 1, 1), (1, 3, 2), (8, 9, 7)]
    df = spark.createDataFrame(wedges, "src LONG, dst LONG, w LONG")
    got = {
        r["id"]: r["dist"]
        for r in sssp_weighted(df, [0], rounds=4).collect()
    }
    assert got == {0: 0, 1: 2, 2: 1, 3: 4}
    # at rounds=1 only direct edges relax: 1 still costs 5
    got1 = {
        r["id"]: r["dist"]
        for r in sssp_weighted(df, [0], rounds=1).collect()
    }
    assert got1[1] == 5 and got1[2] == 1
    values = ", ".join(f"({s}, {d}, {w})" for s, d, w in wedges)
    sql = sssp_weighted_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst, w)", [0], 4
    )
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert got == oracle


def test_closeness_sampled(spark):
    from ps_projekt_pagerank_spark.operators.bfs import (
        closeness_sampled,
        closeness_sampled_sql,
    )

    seeds = [0, 8, 9, 5]
    edges = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["seed"]: r.asDict()
        for r in closeness_sampled(edges, seeds, max_depth=6).collect()
    }
    # python oracle from the module's own BFS reference
    n_nodes = len({x for e in EDGES for x in e})
    for s in seeds:
        dist = _py_bfs([e for e in EDGES], [s], 6)
        reached, sumd = len(dist), sum(dist.values())
        r = got[s]
        assert r["reached"] == reached and r["sum_dist"] == sumd
        if sumd > 0:
            assert r["closeness"] == pytest.approx((reached - 1) / sumd)
            assert r["closeness_wf"] == pytest.approx(
                (reached - 1) ** 2 / ((n_nodes - 1) * sumd)
            )
        else:  # seed 9 reaches nothing
            assert r["closeness"] is None and r["closeness_wf"] is None
    # duckdb twin agrees row-for-row
    con = duckdb.connect()
    rows = con.execute(
        closeness_sampled_sql(
            "SELECT * FROM (VALUES "
            + ", ".join(f"({a}, {b})" for a, b in EDGES)
            + ") AS t(src, dst)",
            seeds,
            6,
        )
    ).fetchall()
    twin = {r[0]: r for r in rows}
    for s in seeds:
        g = got[s]
        assert twin[s][1] == g["reached"] and twin[s][2] == g["sum_dist"]
        assert (twin[s][3] is None) == (g["closeness"] is None)
        if g["closeness"] is not None:
            assert twin[s][3] == pytest.approx(g["closeness"])
            assert twin[s][4] == pytest.approx(g["closeness_wf"])
