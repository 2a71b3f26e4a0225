"""Random-failure robustness curve (operators/robustness.py)."""

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.robustness import (
    random_failure_robustness,
)


def test_p_zero_is_whole_graph_and_curve_monotone_shape(spark):
    # a path 0-1-2-...-9: fragile to any removal
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src LONG, dst LONG"
    )
    rows = {
        r["p"]: r
        for r in random_failure_robustness(edges, fracs=(0.0, 0.5)).collect()
    }
    base = rows[0.0]
    assert base["n_nodes"] == 10
    assert base["giant_size"] == 10
    assert base["giant_frac"] == 1.0
    half = rows[0.5]
    # md5 draw removes SOME nodes at p=0.5 on 10 ids (deterministic)
    assert 0 < half["n_nodes"] < 10
    assert half["giant_size"] <= half["n_nodes"]


def test_deterministic_and_salted(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src LONG, dst LONG"
    )
    a = random_failure_robustness(edges, fracs=(0.4,)).collect()
    b = random_failure_robustness(edges, fracs=(0.4,)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c1 = random_failure_robustness(edges, fracs=(0.4,), salt="other").collect()
    c2 = random_failure_robustness(edges, fracs=(0.4,), salt="other").collect()
    assert [tuple(r) for r in c1] == [tuple(r) for r in c2]


def test_bad_frac_raises(spark):
    edges = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    import pytest

    with pytest.raises(ValueError):
        random_failure_robustness(edges, fracs=(1.5,))
