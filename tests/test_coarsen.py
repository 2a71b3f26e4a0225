"""Matching-contraction coarsening: structural invariants, twin
equality, weight semantics."""

import duckdb

from ps_projekt_pagerank_spark.operators.coarsen import (
    coarsen_edges,
    coarsen_edges_sql,
    coarsen_map,
    coarsen_map_sql,
)
from ps_projekt_pagerank_spark.operators.matching import maximal_matching

DENSE = [((k * 7) % 13, (k * 5) % 13) for k in range(50)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _sql(edges):
    return " UNION ALL ".join(
        f"SELECT CAST({u} AS BIGINT) AS src, CAST({v} AS BIGINT) AS dst"
        for u, v in edges
    )


def test_map_invariants(spark):
    cmap = {r["id"]: r["super"] for r in coarsen_map(_df(spark, DENSE)).collect()}
    matched = {
        (r["u"], r["v"]) for r in maximal_matching(_df(spark, DENSE)).collect()
    }
    nodes = {x for e in DENSE for x in e}
    assert set(cmap) == nodes
    # representative = min of matched pair, self otherwise
    for u, v in matched:
        assert cmap[v] == u and cmap[u] == u
    matched_nodes = {x for e in matched for x in e}
    for n in nodes - matched_nodes:
        assert cmap[n] == n
    # supernode count = n - |matching|
    assert len(set(cmap.values())) == len(nodes) - len(matched)


def test_edges_weights_and_no_self_loops(spark):
    # two matched-prone pairs plus parallel edges: weight aggregates
    edges = [(0, 1), (2, 3), (0, 2), (0, 2), (1, 3), (3, 3), (0, 0)]
    cmap = {r["id"]: r["super"] for r in coarsen_map(_df(spark, edges)).collect()}
    out = {
        (r["cu"], r["cv"]): r["weight"]
        for r in coarsen_edges(_df(spark, edges)).collect()
    }
    assert all(cu < cv for cu, cv in out)
    # recompute expected from the map
    from collections import Counter

    want = Counter()
    for s, d in edges:
        a, b = cmap[s], cmap[d]
        if a != b:
            want[(min(a, b), max(a, b))] += 1
    assert out == dict(want)


def test_twin_equality(spark):
    edges = DENSE + [(1, 2), (2, 1)]
    got_map = sorted(
        tuple(r) for r in coarsen_map(_df(spark, edges)).collect()
    )
    got_edges = sorted(
        tuple(r) for r in coarsen_edges(_df(spark, edges)).collect()
    )
    con = duckdb.connect()
    assert got_map == sorted(
        con.execute(coarsen_map_sql(_sql(edges), 8)).fetchall()
    )
    assert got_edges == sorted(
        con.execute(coarsen_edges_sql(_sql(edges), 8)).fetchall()
    )


def test_coarsening_shrinks(spark):
    n0 = len({x for e in DENSE for x in e})
    cmap = coarsen_map(_df(spark, DENSE))
    n1 = cmap.select("super").distinct().count()
    assert n1 < n0
