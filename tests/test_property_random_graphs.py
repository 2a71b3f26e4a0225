"""Property tests (SURVEY.md §5c): hypothesis invariants on the sequential
oracle, plus seeded pseudorandom multigraphs pushed through the full Spark
operators and matched against the oracle — the random-topology counterpart
of the curated fixture goldens."""

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ps_projekt_pagerank_spark import DAMPING, NORTH_EPSILON
from ps_projekt_pagerank_spark.operators.components import connected_components
from ps_projekt_pagerank_spark.operators.labelprop import label_propagation
from ps_projekt_pagerank_spark.operators.pagerank import pagerank
from ps_projekt_pagerank_spark.operators.triangles import (
    triangles_per_node,
    triangles_total,
)
from ps_projekt_pagerank_spark.oracle import graph_algos as oga
from ps_projekt_pagerank_spark.oracle import pagerank as oracle_pagerank
from ps_projekt_pagerank_spark.sources.snap import edges_from_pairs

edge_lists = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=100,
)


@settings(max_examples=60, deadline=None)
@given(edge_lists)
def test_oracle_mass_positivity_termination(edges):
    # pure Jacobi power iteration (delta=-1 never freezes): the probability
    # mass invariant is exact — this is the textbook PageRank property
    true_ranks, _ = oracle_pagerank(edges, delta=-1.0, max_iterations=300)
    n = len(true_ranks)
    assert math.isclose(sum(true_ranks.values()), 1.0, abs_tol=1e-9)

    # frozen-node variant (the reference's semantics): hypothesis found that
    # a node can freeze PREMATURELY when one sweep coincidentally reproduces
    # its value exactly (e.g. edges=[(0,0),(0,1),(2,3)] freezes node 0 at
    # 1/n in sweep 1), so sum(ranks)=1 is a fixture-level observation
    # (test_oracle.py), NOT a universal invariant. What IS universal: the
    # teleport floor (every committed value is sink_sum >= (1-d)/n or the
    # 1/n init), termination, and determinism.
    ranks_e, iters_e = oracle_pagerank(edges, delta=NORTH_EPSILON)
    assert all(r >= (1.0 - DAMPING) / n - 1e-12 for r in ranks_e.values())
    assert iters_e >= 1
    ranks2, iters2 = oracle_pagerank(edges, delta=NORTH_EPSILON)
    assert ranks2 == ranks_e and iters2 == iters_e


@settings(max_examples=60, deadline=None)
@given(edge_lists)
def test_oracle_components_are_min_reachable(edges):
    comp = oga.connected_components(edges)
    # component id is a member of its own component and is the minimum
    members: dict[int, list[int]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    for c, nodes in members.items():
        assert c == min(nodes)
    # endpoints of every edge agree
    for s, d in edges:
        assert comp[s] == comp[d]


def _random_multigraph(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


def test_spark_pagerank_random_graph_matches_oracle(spark):
    # includes duplicate edges, self-loops, and sinks with high probability
    edge_list = _random_multigraph(seed=7, n_nodes=40, n_edges=120)
    expected, expected_iters = oracle_pagerank(edge_list, delta=NORTH_EPSILON)
    res = pagerank(
        edges_from_pairs(spark, edge_list),
        epsilon=NORTH_EPSILON,
        max_iterations=500,
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert res.iterations == expected_iters
    assert set(got) == set(expected)
    assert all(math.isclose(got[k], v, abs_tol=1e-6) for k, v in expected.items())


def test_spark_graph_algos_random_graph_match_oracle(spark):
    edge_list = _random_multigraph(seed=11, n_nodes=60, n_edges=90)
    edges = edges_from_pairs(spark, edge_list)

    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == oga.connected_components(edge_list)

    labels = {r["id"]: r["label"] for r in label_propagation(edges, rounds=3).collect()}
    assert labels == oga.label_propagation(edge_list, rounds=3)

    total = triangles_total(edges).first()["triangles"]
    per_node = {
        r["id"]: r["triangles"] for r in triangles_per_node(edges).collect()
    }
    expected_total, expected_per_node = oga.triangle_count(edge_list)
    assert total == expected_total
    assert per_node == expected_per_node
    assert total * 3 == sum(expected_per_node.values())
