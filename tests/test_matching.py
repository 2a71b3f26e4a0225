"""Maximal matching: maximality/disjointness invariants, literal Python
replay, twin equality."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.matching import (
    maximal_matching,
    maximal_matching_sql,
)

PATH6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
DENSE = [((k * 7) % 13, (k * 5) % 13) for k in range(50)]


def _prio(u, v):
    h = hashlib.md5(f"{u}#{v}".encode()).hexdigest()
    return f"{h}#{u:020d}#{v:020d}"


def _replay(edges):
    act = {
        (min(u, v), max(u, v))
        for u, v in edges
        if u != v
    }
    act = {(u, v): _prio(u, v) for u, v in act}
    matched = set()
    while act:
        picks = {}
        for (u, v), p in act.items():
            for x in (u, v):
                if x not in picks or p < picks[x]:
                    picks[x] = p
        mr = {
            (u, v)
            for (u, v), p in act.items()
            if picks[u] == p and picks[v] == p
        }
        if not mr:
            break
        matched |= mr
        mv = {x for e in mr for x in e}
        act = {
            e: p for e, p in act.items() if e[0] not in mv and e[1] not in mv
        }
    return matched


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _sql(edges):
    return " UNION ALL ".join(
        f"SELECT CAST({u} AS BIGINT) AS src, CAST({v} AS BIGINT) AS dst"
        for u, v in edges
    )


@pytest.mark.parametrize("edges", [PATH6, DENSE])
def test_replay_and_invariants(spark, edges):
    got = {(r["u"], r["v"]) for r in maximal_matching(_df(spark, edges)).collect()}
    assert got == _replay(edges)
    # disjoint: no vertex in two matched edges
    verts = [x for e in got for x in e]
    assert len(verts) == len(set(verts))
    # maximal: every simple edge has a matched endpoint
    simple = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    mv = set(verts)
    assert all(u in mv or v in mv for u, v in simple)


def test_twin_equality(spark):
    edges = DENSE + [(3, 3), (1, 2), (2, 1)]  # self-loop + dup + reverse-dup
    got = sorted(
        (r["u"], r["v"]) for r in maximal_matching(_df(spark, edges)).collect()
    )
    oracle = sorted(
        duckdb.connect().execute(maximal_matching_sql(_sql(edges), 8)).fetchall()
    )
    assert got == oracle


def test_empty_graph(spark):
    out = maximal_matching(_df(spark, [(5, 5)])).collect()
    assert out == []


def test_guards(spark):
    with pytest.raises(ValueError):
        maximal_matching(_df(spark, PATH6), 0)
    with pytest.raises(ValueError):
        maximal_matching_sql("SELECT 1 AS src, 2 AS dst", 0)
