"""Degree assortativity vs an exact-integer-moments Python replication
and the DuckDB twin."""

import math

import duckdb

from ps_projekt_pagerank_spark.operators.graph import (
    degree_assortativity,
    degree_assortativity_sql,
)

EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 0), (3, 1),
    (4, 0), (4, 5), (5, 4), (0, 1),  # multi-edge kept (counts twice)
]


def _py_assortativity(edges):
    od, idg = {}, {}
    for s, d in edges:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    deg = {
        "so": lambda s, d: od.get(s, 0), "si": lambda s, d: idg.get(s, 0),
        "do": lambda s, d: od.get(d, 0), "di": lambda s, d: idg.get(d, 0),
    }
    out = {}
    for ls, ld, a, b in [
        ("out", "in", "so", "di"), ("out", "out", "so", "do"),
        ("in", "in", "si", "di"), ("in", "out", "si", "do"),
    ]:
        xs = [deg[a](s, d) for s, d in edges]
        ys = [deg[b](s, d) for s, d in edges]
        n = len(edges)
        sx, sy = sum(xs), sum(ys)
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        # the same IEEE expression as the engines, from exact int moments
        va = float(sxx) * float(n) - float(sx) * sx
        vb = float(syy) * float(n) - float(sy) * sy
        cov = float(sxy) * float(n) - float(sx) * sy
        den = math.sqrt(va) * math.sqrt(vb)
        out[(ls, ld)] = cov / den if den > 0 else None
    return out


def test_assortativity_matches_python_exactly(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        (r["src_deg"], r["dst_deg"]): r["assortativity"]
        for r in degree_assortativity(df).collect()
    }
    assert got == _py_assortativity(EDGES)


def test_assortativity_duckdb_twin_exactly(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        (r["src_deg"], r["dst_deg"]): r["assortativity"]
        for r in degree_assortativity(df).collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = degree_assortativity_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    )
    oracle = {
        (r[0], r[1]): r[2] for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle  # bit-exact, no rounding anywhere


def test_assortativity_null_on_constant_degrees(spark):
    # a directed 3-cycle: every degree is 1 -> zero variance -> NULL r
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src LONG, dst LONG")
    rows = degree_assortativity(df).collect()
    assert len(rows) == 4
    assert all(r["assortativity"] is None for r in rows)
