"""Directed modularity and component-size reports vs exact-integer Python
replications and the DuckDB twins."""

import duckdb

from ps_projekt_pagerank_spark.operators.components import (
    component_size_histogram,
    component_summary,
    connected_components,
)
from ps_projekt_pagerank_spark.operators.modularity import (
    modularity,
    modularity_sql,
)

# two dense blocks {0,1,2} and {3,4,5} plus one cross edge and a self-loop;
# multi-edge (0,1) kept (counts twice in m and in degrees)
EDGES = [
    (0, 1), (1, 2), (2, 0), (0, 1),
    (3, 4), (4, 5), (5, 3),
    (2, 3),
    (4, 4),
]
LABELS = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def _py_modularity(edges, labels):
    m = len(edges)
    intra = sum(1 for s, d in edges if labels[s] == labels[d])
    out_c, in_c = {}, {}
    for s, d in edges:
        out_c[labels[s]] = out_c.get(labels[s], 0) + 1
        in_c[labels[d]] = in_c.get(labels[d], 0) + 1
    s_ = sum(out_c[c] * in_c.get(c, 0) for c in out_c)
    # the same IEEE expression as the engines, from exact int moments
    return m, intra, s_, float(intra) / m - float(s_) / m / m


def test_modularity_matches_python_exactly(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    lab = spark.createDataFrame(
        list(LABELS.items()), "id LONG, label LONG"
    )
    row = modularity(e, lab).collect()[0]
    m, intra, s_, q = _py_modularity(EDGES, LABELS)
    assert (
        row["n_edges"],
        row["intra_edges"],
        row["degree_product_sum"],
        row["modularity"],
    ) == (m, intra, s_, q)


def test_modularity_duckdb_twin_exactly(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    lab = spark.createDataFrame(
        list(LABELS.items()), "id LONG, label LONG"
    )
    got = modularity(e, lab).collect()[0]
    ev = ", ".join(f"({s}, {d})" for s, d in EDGES)
    lv = ", ".join(f"({i}, {c})" for i, c in LABELS.items())
    sql = modularity_sql(
        f"SELECT * FROM (VALUES {ev}) AS t(src, dst)",
        f"SELECT * FROM (VALUES {lv}) AS t(id, label)",
    )
    oracle = duckdb.connect().execute(sql).fetchone()
    assert tuple(got) == oracle  # bit-exact, no rounding anywhere


def test_modularity_perfect_partition_positive(spark):
    # drop the cross edge and the self-loop: two clean directed 3-cycles
    clean = [e for e in EDGES if e not in ((2, 3), (4, 4), (0, 1))][:6]
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)], "src LONG, dst LONG"
    )
    lab = spark.createDataFrame(list(LABELS.items()), "id LONG, label LONG")
    q = modularity(e, lab).collect()[0]["modularity"]
    assert abs(q - 0.5) < 1e-12  # 6/6 intra - 2*(3*3)/36 = 1 - 0.5
    del clean


def test_component_reports(spark):
    # components {0,1,2,3}, {10,11}, isolated via self-loop {20}
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 20)], "src LONG, dst LONG"
    )
    cc = connected_components(e)
    hist = {
        r["size"]: r["n_components"]
        for r in component_size_histogram(cc).collect()
    }
    assert hist == {4: 1, 2: 1, 1: 1}
    s = component_summary(cc).collect()[0]
    assert (s["n_nodes"], s["n_components"], s["giant_size"]) == (7, 3, 4)
    assert s["giant_fraction"] == 4.0 / 7.0
