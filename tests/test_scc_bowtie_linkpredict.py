"""SCC / bow-tie vs a pure-Python Tarjan oracle; Adamic-Adar vs a direct
Python replication; engine-vs-DuckDB parity for all three SQL twins."""

from __future__ import annotations

import math
import random
from collections import defaultdict
from itertools import combinations

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.linkpredict import (
    adamic_adar_pairs,
    adamic_adar_sql,
)
from ps_projekt_pagerank_spark.operators.scc import (
    bow_tie,
    strongly_connected_components,
)


def _py_scc(pairs):
    """Tarjan, iterative. Returns {node: min id of its SCC}."""
    adj = defaultdict(list)
    nodes = set()
    for a, b in pairs:
        nodes.update((a, b))
        if a != b:
            adj[a].append(b)
    index, low, onstack = {}, {}, set()
    stack, out, counter = [], {}, [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return out


# two 3-cycles bridged one-way, a 2-cycle island, a chain, a self-loop
SCC_EDGES = [
    (0, 1), (1, 2), (2, 0),          # cycle A (component 0)
    (2, 10), (10, 11), (11, 12), (12, 10),  # bridge into cycle B (10)
    (20, 21), (21, 20),              # island 2-cycle
    (30, 31), (31, 32),              # chain: three singletons
    (40, 40),                        # self-loop: singleton
]


def test_scc_matches_tarjan_fixed(spark):
    df = spark.createDataFrame(SCC_EDGES, "src LONG, dst LONG")
    got = {r["id"]: r["component"] for r in strongly_connected_components(df).collect()}
    assert got == _py_scc(SCC_EDGES)


def test_scc_matches_tarjan_random(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 30
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(80 + 20 * trial)
        ]
        df = spark.createDataFrame(pairs, "src LONG, dst LONG")
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components(df).collect()
        }
        assert got == _py_scc(pairs), trial


def test_scc_empty_edgeless(spark):
    df = spark.createDataFrame([(5, 5)], "src LONG, dst LONG")
    got = strongly_connected_components(df).collect()
    assert {(r["id"], r["component"]) for r in got} == {(5, 5)}


# bow-tie: 3-cycle core, IN node 100, OUT node 200, tendril 300 off IN,
# disconnected pair 400-401
BOWTIE_EDGES = [
    (0, 1), (1, 2), (2, 0),
    (100, 0),
    (1, 200),
    (100, 300),
    (400, 401),
]


def test_bowtie_fixed(spark):
    df = spark.createDataFrame(BOWTIE_EDGES, "src LONG, dst LONG")
    got = {r["id"]: r["part"] for r in bow_tie(df).collect()}
    assert got == {
        0: "CORE", 1: "CORE", 2: "CORE",
        100: "IN", 200: "OUT", 300: "TENDRIL",
        400: "DISCONNECTED", 401: "DISCONNECTED",
    }


def _py_adamic_adar(pairs, min_common, max_fanout):
    neigh = defaultdict(set)
    canon = set()
    for a, b in pairs:
        if a == b:
            continue
        canon.add((min(a, b), max(a, b)))
        neigh[a].add(b)
        neigh[b].add(a)
    scores = defaultdict(lambda: [0, 0.0])
    for w, ns in neigh.items():
        d = len(ns)
        if d < 2 or d > max_fanout:
            continue
        for x, y in combinations(sorted(ns), 2):
            scores[(x, y)][0] += 1
            scores[(x, y)][1] += 1.0 / math.log(d)
    return {
        k: (c, round(aa, 6))
        for k, (c, aa) in scores.items()
        if c >= min_common and k not in canon
    }


def test_adamic_adar_matches_python(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    df = spark.createDataFrame(pairs, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): (r["common"], round(r["aa"], 6))
        for r in adamic_adar_pairs(df, min_common=1, max_fanout=10).collect()
    }
    assert got == _py_adamic_adar(pairs, 1, 10)


def test_adamic_adar_plan_is_equijoin(spark):
    """candidate generation must stay a per-center equi-join — a
    CartesianProduct in the plan means the wedge join degenerated."""
    df = spark.createDataFrame([(0, 1), (1, 2)], "src LONG, dst LONG")
    plan = adamic_adar_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_adamic_adar_rejects_bad_fanout(spark):
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    with pytest.raises(ValueError):
        adamic_adar_pairs(df, max_fanout=1)


@pytest.mark.parametrize(
    "edges", [SCC_EDGES, BOWTIE_EDGES], ids=["scc", "bowtie"]
)
def test_sql_twins_match_spark(spark, edges):
    """The recursive-closure DuckDB twins land exactly on the iterative
    Spark results (same fixtures as the gate, in miniature)."""
    from __spark_entry__ import _bowtie_sql, _scc_sql

    values = ", ".join(f"({a}, {b})" for a, b in edges)
    esql = f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    con = duckdb.connect()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")

    scc_oracle = {
        (r[0], r[1]) for r in con.execute(_scc_sql(esql)).fetchall()
    }
    scc_spark = {
        (r["id"], r["component"])
        for r in strongly_connected_components(df).collect()
    }
    assert scc_spark == scc_oracle

    bt_oracle = {(r[0], r[1]) for r in con.execute(_bowtie_sql(esql)).fetchall()}
    bt_spark = {(r["id"], r["part"]) for r in bow_tie(df).collect()}
    assert bt_spark == bt_oracle


def test_adamic_adar_sql_twin(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(90)]
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    esql = f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    oracle = {
        (r[0], r[1]): (r[2], r[3])
        for r in duckdb.connect()
        .execute(adamic_adar_sql(esql, min_common=1, max_fanout=8))
        .fetchall()
    }
    df = spark.createDataFrame(pairs, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): (r["common"], round(r["aa"], 6))
        for r in adamic_adar_pairs(df, min_common=1, max_fanout=8).collect()
    }
    assert got == oracle
