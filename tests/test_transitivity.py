"""Global transitivity ratio (operators/triangles.py)."""

from ps_projekt_pagerank_spark.operators.triangles import global_transitivity


def _one(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return global_transitivity(df).collect()[0]


def test_triangle_is_fully_transitive(spark):
    r = _one(spark, [(1, 2), (2, 3), (1, 3)])
    assert (r["n_wedges"], r["n_triangles"]) == (3, 1)
    assert r["transitivity"] == 1.0


def test_path_has_open_wedge(spark):
    r = _one(spark, [(1, 2), (2, 3)])
    assert (r["n_wedges"], r["n_triangles"]) == (1, 0)
    assert r["transitivity"] == 0.0


def test_single_edge_undefined(spark):
    r = _one(spark, [(1, 2)])
    assert r["n_wedges"] == 0
    assert r["transitivity"] is None
