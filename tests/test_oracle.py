"""Oracle golden tests (BASELINE.md measured goldens)."""

import math

from ps_projekt_pagerank_spark import NORTH_EPSILON
from ps_projekt_pagerank_spark.fixtures import (
    FIXTURE_GRAPHS,
    GOLDEN_ITERATIONS_1E16,
    MINI_EDGES,
    SINK_TEST_EDGES,
    SMALL_EDGES,
    tripled,
)
from ps_projekt_pagerank_spark.oracle import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)


def test_sink_test_closed_form():
    ranks, iters = pagerank(SINK_TEST_EDGES)
    assert iters == GOLDEN_ITERATIONS_1E16["sink-test"] == 44
    assert math.isclose(ranks[0], 0.15 / 0.4275, rel_tol=1e-12)
    assert math.isclose(ranks[1], 1 - 0.15 / 0.4275, rel_tol=1e-12)


def test_mini_goldens():
    ranks, iters = pagerank(MINI_EDGES)
    assert iters == GOLDEN_ITERATIONS_1E16["mini"] == 25
    assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-12)
    top = sorted(ranks, key=lambda k: -ranks[k])
    assert set(top[:2]) == {0, 5}
    assert round(ranks[0], 4) == round(ranks[5], 4) == 0.1493
    assert round(ranks[3], 4) == 0.1471
    assert round(ranks[4], 4) == 0.1411
    assert round(ranks[6], 5) == round(ranks[7], 5) == 0.06158


def test_small_goldens():
    ranks, iters = pagerank(SMALL_EDGES)
    assert iters == GOLDEN_ITERATIONS_1E16["small"] == 29
    assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-12)
    assert max(ranks, key=ranks.get) == 4
    assert round(ranks[4], 5) == 0.03401
    assert round(ranks[3], 5) == 0.03359
    assert round(ranks[5], 5) == 0.03355
    assert round(ranks[0], 5) == 0.03103


def test_rank_mass_invariant_all_fixtures():
    # at delta=1e-16 mass is exact; at eps=1e-6 each frozen rank may sit up
    # to eps from its fixed point, so the invariant holds to O(N*eps)
    for name, edges in FIXTURE_GRAPHS.items():
        ranks, _ = pagerank(edges)
        assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-12), name
        ranks6, _ = pagerank(edges, delta=NORTH_EPSILON)
        n = len(ranks6)
        assert math.isclose(sum(ranks6.values()), 1.0, abs_tol=n * NORTH_EPSILON), name


def test_tripled_preserves_mass_and_grows():
    t = tripled(MINI_EDGES)
    assert len(t) == 3 * len(MINI_EDGES)
    ranks, _ = pagerank(t)
    assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-12)


def test_connected_components_small_two_components():
    comp = connected_components(SMALL_EDGES)
    # FIXTURES.md §3.3: two weakly-connected components
    assert len(set(comp.values())) == 2
    assert comp[0] == comp[2] == comp[3] == 0
    assert comp[1] == comp[6] == comp[30] == 1


def test_label_propagation_deterministic():
    a = label_propagation(SMALL_EDGES, rounds=5)
    b = label_propagation(SMALL_EDGES, rounds=5)
    assert a == b
    assert set(a) == set(connected_components(SMALL_EDGES))


def test_triangle_count_mini():
    total, per_node = triangle_count(MINI_EDGES)
    # undirected simple graph on mini: verified by hand below
    # adjacency: 0-{2,3,4,5}, 3-{0,1,4,5,6,7,8}, 2-{0,1,4,5}, 4-{0,2,3,5}, 5-{0,2,3,4,9}
    # triangles: (0,3,4),(0,3,5),(0,2,4),(0,2,5),(0,4,5),(3,4,5),(2,4,5)
    assert total == 7
    assert per_node[0] == 5
    assert per_node[9] == 0
    assert sum(per_node.values()) == 3 * total
