"""Weisfeiler-Lehman colors vs a pure-Python replication and the DuckDB
twin; structural-equivalence semantics."""

import hashlib

import duckdb

from ps_projekt_pagerank_spark.operators.wl import (
    wl_color_histogram,
    wl_colors,
    wl_colors_sql,
)

# two isomorphic directed triangles (structurally identical nodes) plus
# a hub 10 -> {0, 3} that breaks 0 and 3 away from their cycle twins
EDGES = [
    (0, 1), (1, 2), (2, 0),
    (3, 4), (4, 5), (5, 3),
    (10, 0), (10, 3),
]


def _py_wl(edges, rounds):
    es = {(s, d) for s, d in edges if s != d}
    nodes = sorted({n for e in es for n in e})
    outs = {n: sorted(d for s, d in es if s == n) for n in nodes}
    ins = {n: sorted(s for s, d in es if d == n) for n in nodes}
    c = {
        n: hashlib.md5(
            f"{len(outs[n])}#{len(ins[n])}".encode()
        ).hexdigest()
        for n in nodes
    }
    for _ in range(rounds):
        nc = {}
        for n in nodes:
            oc = ",".join(sorted(c[d] for d in outs[n]))
            ic = ",".join(sorted(c[s] for s in ins[n]))
            nc[n] = hashlib.md5(f"{c[n]}|{oc}|{ic}".encode()).hexdigest()
        c = nc
    return c


def test_wl_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["wl_color"] for r in wl_colors(df, rounds=2).collect()
    }
    assert got == _py_wl(EDGES, 2)
    # isomorphic positions share colors; hub-touched nodes differ
    assert got[1] == got[4] and got[2] == got[5] and got[0] == got[3]
    assert got[0] != got[1] and got[10] not in (got[0], got[1])


def test_wl_duckdb_twin_and_histogram(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["wl_color"] for r in wl_colors(df, rounds=2).collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = wl_colors_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", rounds=2
    )
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert got == oracle
    hist = {
        r["wl_color"]: r["n_nodes"]
        for r in wl_color_histogram(wl_colors(df, rounds=2)).collect()
    }
    assert sorted(hist.values()) == [1, 2, 2, 2]  # hub alone, 3 pairs
