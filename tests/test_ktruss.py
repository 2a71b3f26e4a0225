"""k-truss peeling vs a pure-Python replication and the DuckDB twin."""

import duckdb

from ps_projekt_pagerank_spark.operators.triangles import (
    k_truss,
    k_truss_sql,
)

# a 4-clique {0,1,2,3} (every edge support 2 -> survives k=4), a triangle
# {4,5,6} glued to the clique by one edge (support 1 -> peeled at k=4 but
# kept at k=3), and a tail 6-7 (support 0 -> peeled at k>=3)
CLIQUE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
TRI = [(4, 5), (4, 6), (5, 6)]
GLUE = [(3, 4)]
TAIL = [(6, 7)]
EDGES = CLIQUE + TRI + GLUE + TAIL


def _py_ktruss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b])
            for a, b in es
        }
        kill = {e for e in es if sup[e] < k - 2}
        if not kill:
            return es
        es -= kill


def test_ktruss_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    for k in (2, 3, 4, 5):
        got = {
            (r["a"], r["b"]) for r in k_truss(df, k).collect()
        }
        assert got == _py_ktruss(EDGES, k), k
    assert {(r["a"], r["b"]) for r in k_truss(df, 4).collect()} == set(
        CLIQUE
    )
    assert {(r["a"], r["b"]) for r in k_truss(df, 5).collect()} == set()


def test_ktruss_cascading_peel(spark):
    # a chain of triangles sharing single edges: peeling one kills the
    # next round's support — exercises multi-round convergence
    chain = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5),
             (5, 6), (4, 6)]
    df = spark.createDataFrame(chain, "src LONG, dst LONG")
    got = {(r["a"], r["b"]) for r in k_truss(df, 4).collect()}
    assert got == _py_ktruss(chain, 4) == set()


def test_ktruss_duckdb_twin(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {(r["a"], r["b"]) for r in k_truss(df, 4).collect()}
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = k_truss_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 4, rounds=5
    )
    oracle = {
        (r[0], r[1]) for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle
