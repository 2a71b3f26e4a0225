"""Batched per-seed personalized PageRank vs single-seed NumPy-style
Python replication and the DuckDB twin."""

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.pagerank import (
    pagerank_personalized_batch,
    pagerank_personalized_batch_sql,
)

# multigraph with a sink (3) and a duplicate edge (0,1)
EDGES = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0)]
D = 0.85


def _py_ppr(edges, seed, iters):
    from collections import Counter, defaultdict

    out = Counter()
    for s, t in edges:
        out[(s, t)] += 1
    outdeg = Counter(s for s, _ in edges)
    rank = {seed: 1.0}
    for _ in range(iters):
        sink = sum(
            r for v, r in rank.items() if outdeg.get(v, 0) == 0
        )
        nxt = defaultdict(float)
        for (s, t), w in out.items():
            if s in rank:
                nxt[t] += D * w * (rank[s] / outdeg[s])
        nxt[seed] += (1.0 - D) + D * sink
        rank = dict(nxt)
    return rank


def test_ppr_batch_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        (r["seed"], r["id"]): r["rank"]
        for r in pagerank_personalized_batch(df, [0, 4], 3).collect()
    }
    expect = {}
    for s in (0, 4):
        for nid, rk in _py_ppr(EDGES, s, 3).items():
            expect[(s, nid)] = rk
    assert got.keys() == expect.keys()
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12, k


def test_ppr_batch_duckdb_twin(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        (r["seed"], r["id"]): r["rank"]
        for r in pagerank_personalized_batch(df, [0, 4], 3)
        .select("seed", "id", F.round("rank", 9).alias("rank"))
        .collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = pagerank_personalized_batch_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", [0, 4], 3
    )
    oracle = {
        (r[0], r[1]): r[2]
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def test_ppr_batch_validates_seeds(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    with pytest.raises(ValueError):
        pagerank_personalized_batch(df, [], 2)
    with pytest.raises(ValueError):
        pagerank_personalized_batch(df, [0, 999], 2)
