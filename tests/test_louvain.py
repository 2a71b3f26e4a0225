"""Louvain phase-1 sync moves: structure recovery, literal Python
replay, twin equality, multigraph weighting, guards."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.louvain import (
    louvain_moves,
    louvain_moves_sql,
)

# two triangles joined by one bridge edge
TWO_TRI = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


def _replay(edges, rounds):
    from collections import Counter, defaultdict

    sym = Counter()
    nodes = set()
    for u, v in edges:
        nodes |= {u, v}
        if u != v:
            sym[(u, v)] += 1
            sym[(v, u)] += 1
    adj = defaultdict(dict)
    deg = Counter()
    for (a, b), w in sym.items():
        adj[a][b] = w
        deg[a] += w
    m2 = sum(deg.values())
    c = {i: i for i in nodes}
    for rnd in range(1, rounds + 1):
        tot = Counter()
        for i in nodes:
            tot[c[i]] += deg.get(i, 0)
        new = {}
        for i in nodes:
            if (i + rnd) % 2 != 0:  # red-black half-sweep: inactive
                new[i] = c[i]
                continue
            kin = Counter({c[i]: 0})
            for j, w in adj[i].items():
                kin[c[j]] += w
            best_key, best_c = None, None
            for cc, kv in kin.items():
                score = m2 * kv - deg.get(i, 0) * (
                    tot[cc] - (deg.get(i, 0) if cc == c[i] else 0)
                )
                key = (-score, cc)
                if best_key is None or key < best_key:
                    best_key, best_c = key, cc
            new[i] = best_c
        c = new
    return c


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _edges_sql(edges):
    return " UNION ALL ".join(
        f"SELECT CAST({u} AS BIGINT) AS src, CAST({v} AS BIGINT) AS dst"
        for u, v in edges
    )


def test_two_triangles(spark):
    out = {
        r["id"]: r["community"]
        for r in louvain_moves(_edges_df(spark, TWO_TRI), 3).collect()
    }
    assert len({out[0], out[1], out[2]}) == 1
    assert len({out[3], out[4], out[5]}) == 1
    assert out[0] != out[3]
    assert out == _replay(TWO_TRI, 3)


def test_replay_on_denser_graph(spark):
    # deterministic pseudo-random graph: k-th edge (k*7 % 11, k*5 % 11)
    edges = [((k * 7) % 11, (k * 5) % 11) for k in range(40)]
    for rounds in (1, 2, 4):
        got = {
            r["id"]: r["community"]
            for r in louvain_moves(_edges_df(spark, edges), rounds).collect()
        }
        assert got == _replay(edges, rounds), f"rounds={rounds}"


def test_twin_equality(spark):
    edges = TWO_TRI + [(6, 6), (7, 0), (7, 0)]  # self-loop node + multi-edge
    got = sorted(
        tuple(r) for r in louvain_moves(_edges_df(spark, edges), 3).collect()
    )
    oracle = sorted(
        duckdb.connect()
        .execute(louvain_moves_sql(_edges_sql(edges), 3))
        .fetchall()
    )
    assert got == oracle


def test_self_loop_only_node_keeps_singleton(spark):
    out = {
        r["id"]: r["community"]
        for r in louvain_moves(
            _edges_df(spark, TWO_TRI + [(9, 9)]), 2
        ).collect()
    }
    assert out[9] == 9


def test_multigraph_weight_pulls_node(spark):
    # node 6 connects once to the 0-triangle, thrice to node 5
    edges = TWO_TRI + [(6, 0), (6, 5), (6, 5), (6, 5)]
    out = {
        r["id"]: r["community"]
        for r in louvain_moves(_edges_df(spark, edges), 3).collect()
    }
    assert out[6] == out[5]
    assert out == _replay(edges, 3)


def test_rounds_guard(spark):
    with pytest.raises(ValueError):
        louvain_moves(_edges_df(spark, TWO_TRI), 0)
    with pytest.raises(ValueError):
        louvain_moves_sql("SELECT 1 AS src, 2 AS dst", 0)
