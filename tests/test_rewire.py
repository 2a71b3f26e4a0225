"""Configuration-model rewiring (operators/rewire.py)."""

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.rewire import (
    motif_significance,
    rewire_configuration,
)

EDGES = [
    (1, 2), (1, 3), (1, 3),  # duplicate edge — multigraph in, multigraph out
    (2, 3), (3, 4), (4, 1), (5, 1), (5, 2),
]


def _degs(df, col):
    return {
        r[col]: r["n"]
        for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()
    }


def test_degree_sequences_preserved(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    r = rewire_configuration(e)
    assert r.count() == len(EDGES)
    assert _degs(r, "src") == _degs(e, "src")
    assert _degs(r, "dst") == _degs(e, "dst")


def test_deterministic(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    a = sorted(map(tuple, rewire_configuration(e).collect()))
    b = sorted(map(tuple, rewire_configuration(e).collect()))
    assert a == b


def test_motif_significance_shape(spark):
    # a clique has max closure; its null keeps degrees but usually breaks
    # some triangles — we only assert the report's invariants, not chance
    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    e = spark.createDataFrame(clique, "src LONG, dst LONG")
    row = motif_significance(e).collect()[0]
    assert row["observed_triangles"] == 10
    assert row["null_triangles"] >= 0
    if row["null_triangles"] > 0:
        assert row["excess_ratio"] is not None
    else:
        assert row["excess_ratio"] is None
