"""Katz centrality vs NumPy + DuckDB-twin parity; neighborhood Jaccard
vs a pure-Python replication."""

import duckdb
import numpy as np
import pytest

from ps_projekt_pagerank_spark.operators.cocitation import (
    neighborhood_jaccard,
)
from ps_projekt_pagerank_spark.operators.katz import katz_fixed, katz_sql

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (0, 2), (4, 0), (0, 5)]
N = 6
ALPHA, BETA, ITERS = 0.05, 1.0, 4


def _edge_df(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def test_katz_matches_numpy(spark):
    W = np.zeros((N, N))
    for s, d in EDGES:
        W[s, d] += 1.0  # multigraph weights
    x = np.full(N, BETA)
    for _ in range(ITERS):
        x = BETA + ALPHA * (W.T @ x)
    got = {r["id"]: r["katz"] for r in katz_fixed(_edge_df(spark), ITERS).collect()}
    assert set(got) == set(range(N))
    for i in range(N):
        assert np.isclose(got[i], round(x[i], 9), atol=1e-12), i


def test_katz_sql_twin(spark):
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = katz_sql(f"SELECT * FROM (VALUES {values}) AS t(src, dst)", ITERS)
    oracle = dict(duckdb.connect().execute(sql).fetchall())
    got = {r["id"]: r["katz"] for r in katz_fixed(_edge_df(spark), ITERS).collect()}
    assert got == oracle


def test_katz_rejects_zero_iterations(spark):
    with pytest.raises(ValueError, match="num_iterations"):
        katz_fixed(_edge_df(spark), 0)
    with pytest.raises(ValueError, match="num_iterations"):
        katz_sql("SELECT 1 AS src, 2 AS dst", 0)


# two pairs of co-cited pages with different overlap sizes, one hub whose
# fanout gets capped away
NJ_EDGES = [
    (10, 1), (10, 2),          # s10 cites 1,2
    (11, 1), (11, 2), (11, 3), # s11 cites 1,2,3
    (12, 2), (12, 3),
    (13, 1),
    (99, 1), (99, 2), (99, 3), (99, 4), (99, 5),  # hub, capped at 4
]


def _py_neighborhood_jaccard(edges, min_common, cap):
    e = {(s, d) for s, d in edges}
    from collections import Counter

    fan = Counter(s for s, _ in e)
    e = {(s, d) for s, d in e if fan[s] <= cap}
    ins = {}
    for s, d in e:
        ins.setdefault(d, set()).add(s)
    out = {}
    ids = sorted(ins)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = len(ins[a] & ins[b])
            if c >= min_common:
                out[(a, b)] = (
                    c, round(c / len(ins[a] | ins[b]), 6)
                )
    return out


def test_neighborhood_jaccard_matches_python(spark):
    df = spark.createDataFrame(NJ_EDGES, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in neighborhood_jaccard(df, min_common=1, max_fanout=4).collect()
    }
    assert got == _py_neighborhood_jaccard(NJ_EDGES, 1, 4)
    # spot-check one value: I(1)={10,11,13}, I(2)={10,11,12} -> 2/4
    assert got[(1, 2)] == (2, 0.5)


def test_neighborhood_jaccard_caps_hub(spark):
    df = spark.createDataFrame(NJ_EDGES, "src LONG, dst LONG")
    rows = neighborhood_jaccard(df, min_common=1, max_fanout=4).collect()
    # node 99's fanout is 5 > 4: pairs (4, x) and (5, x) only existed via
    # the hub, so ids 4/5 must not appear at all
    seen = {r["a"] for r in rows} | {r["b"] for r in rows}
    assert 4 not in seen and 5 not in seen
