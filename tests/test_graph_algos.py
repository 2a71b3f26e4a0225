"""CC / label propagation / triangles vs sequential oracles (exact)."""

import pytest

from ps_projekt_pagerank_spark.fixtures import FIXTURE_GRAPHS, MINI_EDGES, SMALL_EDGES
from ps_projekt_pagerank_spark.operators.components import connected_components
from ps_projekt_pagerank_spark.operators.labelprop import label_propagation
from ps_projekt_pagerank_spark.operators.triangles import (
    triangles_per_node,
    triangles_total,
)
from ps_projekt_pagerank_spark.oracle import graph_algos as oracle
from ps_projekt_pagerank_spark.sources.snap import edges_from_pairs


@pytest.mark.parametrize("name", ["sink-test", "mini", "small"])
def test_connected_components_exact(spark, name):
    edge_list = FIXTURE_GRAPHS[name]
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges_from_pairs(spark, edge_list)).collect()
    }
    assert got == oracle.connected_components(edge_list)


def test_cc_disconnected_blocks(spark):
    edge_list = [(0, 1), (1, 2), (10, 11), (12, 11), (20, 20), (30, 31)]
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges_from_pairs(spark, edge_list)).collect()
    }
    assert got == oracle.connected_components(edge_list)
    assert len(set(got.values())) == 4  # {0..2},{10..12},{20},{30,31}


@pytest.mark.parametrize("name", ["mini", "small"])
def test_label_propagation_exact(spark, name):
    edge_list = FIXTURE_GRAPHS[name]
    got = {
        r["id"]: r["label"]
        for r in label_propagation(
            edges_from_pairs(spark, edge_list), rounds=5
        ).collect()
    }
    assert got == oracle.label_propagation(edge_list, rounds=5)


def test_triangles_exact(spark):
    for edge_list in (MINI_EDGES, SMALL_EDGES):
        expected_total, expected_per = oracle.triangle_count(edge_list)
        edges = edges_from_pairs(spark, edge_list)
        assert triangles_total(edges).first()["triangles"] == expected_total
        got = {
            r["id"]: r["triangles"] for r in triangles_per_node(edges).collect()
        }
        assert got == expected_per


def test_triangles_dedup_and_self_loops(spark):
    # duplicate edges must NOT inflate the count; self-loops ignored
    edge_list = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)]
    expected_total, _ = oracle.triangle_count(edge_list)
    assert expected_total == 1
    edges = edges_from_pairs(spark, edge_list)
    assert triangles_total(edges).first()["triangles"] == 1


@pytest.mark.parametrize("name", ["sink-test", "mini", "small"])
def test_connected_components_star_exact(spark, name):
    from ps_projekt_pagerank_spark.operators.components import (
        connected_components_star,
    )

    edge_list = FIXTURE_GRAPHS[name]
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(
            edges_from_pairs(spark, edge_list)
        ).collect()
    }
    assert got == oracle.connected_components(edge_list)


def test_connected_components_star_chain_and_random(spark):
    """A long chain (the O(diameter) worst case min-label propagation is
    slow on — star handles it in O(log n) rounds) plus a seeded random
    multigraph with self-loops and isolated blocks."""
    import random

    from ps_projekt_pagerank_spark.operators.components import (
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(60)]
    rng = random.Random(3)
    rand = [(rng.randrange(50), rng.randrange(50)) for _ in range(60)]
    rand += [(77, 77), (90, 91)]
    for edge_list in (chain, rand):
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(
                edges_from_pairs(spark, edge_list)
            ).collect()
        }
        assert got == oracle.connected_components(edge_list)
