"""Edge-reciprocity and degree-correlation-curve semantics
(Garlaschelli & Loffredo 2004; Pastor-Satorras et al. 2001)."""

import duckdb

from ps_projekt_pagerank_spark.operators.structure import (
    avg_neighbor_degree,
    avg_neighbor_degree_sql,
    node_reciprocity,
    node_reciprocity_sql,
    reciprocity,
    reciprocity_sql,
)

# (0,1) mutual; (1,2) one-way; (3,3) self-loop dropped; (0,1) dup row
EDGES = [(0, 1), (1, 0), (1, 2), (3, 3), (0, 1)]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def test_global_reciprocity(spark):
    row = reciprocity(_edges(spark)).first()
    # distinct self-loop-free edges: (0,1),(1,0),(1,2) -> 2 reciprocal
    assert row["n_edges"] == 3
    assert row["n_reciprocal"] == 2
    assert row["reciprocity"] == 0.666667


def test_global_reciprocity_empty_and_all_mutual(spark):
    empty = spark.createDataFrame([(5, 5)], "src LONG, dst LONG")
    row = reciprocity(empty).first()
    assert row["n_edges"] == 0 and row["reciprocity"] == 0.0
    full = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src LONG, dst LONG"
    )
    assert reciprocity(full).first()["reciprocity"] == 1.0


def test_node_reciprocity(spark):
    rows = {
        r["id"]: (r["out_deg"], r["n_reciprocal"], r["reciprocity"])
        for r in node_reciprocity(_edges(spark)).collect()
    }
    # node 3 (self-loop only) emits nothing; node 2 has no out-edges
    assert set(rows) == {0, 1}
    assert rows[0] == (1, 1, 1.0)
    assert rows[1] == (2, 1, 0.5)


def test_avg_neighbor_degree_star(spark):
    # star 0-{1,2,3}: hub deg 3 with nn-mean 1; leaves deg 1 with
    # nn-mean 3 — the textbook disassortative curve
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src LONG, dst LONG"
    )
    rows = {
        r["deg"]: (r["n_nodes"], r["avg_nn_deg"])
        for r in avg_neighbor_degree(star).collect()
    }
    assert rows == {3: (1, 1.0), 1: (3, 3.0)}


def test_avg_neighbor_degree_mixed_mean(spark):
    # path 0-1-2 plus pendant 3-1: node 1 has deg 3 (nn-mean 1),
    # leaves have deg 1 (nn-mean 3) — then add edge 2-4 so node 2 has
    # deg 2 with neighbors {1,4} of degs {3,1} -> nn-mean 2.0
    g = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 1), (2, 4)], "src LONG, dst LONG"
    )
    rows = {
        r["deg"]: (r["n_nodes"], r["avg_nn_deg"])
        for r in avg_neighbor_degree(g).collect()
    }
    # deg-1 nodes: 0 (nn 3), 3 (nn 3), 4 (nn 2) -> mean 8/3
    assert rows[1] == (3, round(8 / 3, 6))
    assert rows[2] == (1, 2.0)
    # node 1 (deg 3) neighbors {0,2,3} have degs {1,2,1} -> mean 4/3
    assert rows[3] == (1, round(4 / 3, 6))


def test_twins_match_spark(spark):
    sql_edges = "SELECT * FROM (VALUES " + ", ".join(
        f"({s}, {d})" for s, d in EDGES
    ) + ") AS t(src, dst)"
    con = duckdb.connect()
    got = con.execute(reciprocity_sql(sql_edges)).fetchall()
    want = [tuple(r) for r in reciprocity(_edges(spark)).collect()]
    assert got == want
    got_n = sorted(con.execute(node_reciprocity_sql(sql_edges)).fetchall())
    want_n = sorted(tuple(r) for r in node_reciprocity(_edges(spark)).collect())
    assert got_n == want_n
    got_k = sorted(con.execute(avg_neighbor_degree_sql(sql_edges)).fetchall())
    want_k = sorted(
        tuple(r) for r in avg_neighbor_degree(_edges(spark)).collect()
    )
    assert got_k == want_k
