"""OPIC vs a literal Python replay; conservation invariant; twin parity."""

from __future__ import annotations

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.opic import opic, opic_sql

# a small multigraph with a duplicate edge, a self-loop, and a sink (4)
EDGES = [(0, 1), (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (2, 2), (5, 0)]


def _py_opic(pairs, iterations):
    """synchronous-batch replay: uniform init, equal split over the
    multigraph out-links, sink cash recycled uniformly."""
    nodes = sorted({v for e in pairs for v in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    cash = {v: 1.0 / n for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        sink = sum(c for v, c in cash.items() if outdeg.get(v, 0) == 0)
        virtual = sink / n
        new = {v: 0.0 for v in nodes}
        for s, d in pairs:
            new[d] += cash[s] / outdeg[s]
        for v in nodes:
            hist[v] += cash[v]
            new[v] += virtual
        cash = new
    return {
        v: (cash[v], hist[v], (hist[v] + cash[v]) / (iterations + 1))
        for v in nodes
    }


def test_opic_matches_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: (r["cash"], r["history"], r["importance"])
        for r in opic(df, num_iterations=5).collect()
    }
    want = _py_opic(EDGES, 5)
    assert set(got) == set(want)
    for v in want:
        for g, w in zip(got[v], want[v]):
            assert abs(g - w) < 1e-12, (v, got[v], want[v])
    # conservation: importance sums to exactly 1 (up to float assoc)
    assert abs(sum(t[2] for t in got.values()) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="opic"):
        opic(df, num_iterations=0)


def test_opic_duckdb_twin(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: (
            round(r["cash"], 9),
            round(r["history"], 9),
            round(r["importance"], 9),
        )
        for r in opic(df, num_iterations=4).collect()
    }
    values = ", ".join(f"({a}, {b})" for a, b in EDGES)
    sql = opic_sql(f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 4)
    oracle = {
        r[0]: (round(r[1], 9), round(r[2], 9), round(r[3], 9))
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle
