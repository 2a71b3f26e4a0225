"""Warm-start connected components: equality with cold rebuild and the
few-rounds convergence evidence (a round-capped warm run solves a graph
the same-capped cold run cannot)."""

from ps_projekt_pagerank_spark.operators.components import (
    connected_components,
)

# two long chains (diameter 9 each), far apart
CHAIN_A = [(i, i + 1) for i in range(0, 9)]
CHAIN_B = [(i, i + 1) for i in range(100, 109)]


def test_warm_start_equals_cold_after_merge(spark):
    base = spark.createDataFrame(
        CHAIN_A + CHAIN_B, "src LONG, dst LONG"
    )
    prev = connected_components(base)
    # append a merge edge: the two chains become one component
    merged = spark.createDataFrame(
        CHAIN_A + CHAIN_B + [(9, 100)], "src LONG, dst LONG"
    )
    cold = {
        r["id"]: r["component"]
        for r in connected_components(merged).collect()
    }
    warm = {
        r["id"]: r["component"]
        for r in connected_components(merged, init_labels=prev).collect()
    }
    assert warm == cold
    assert set(warm.values()) == {0}


def test_warm_start_converges_instantly_on_unchanged_graph(spark):
    # the crawl-loop payoff: a batch that adds no new connectivity (a
    # repeated edge) re-converges in ZERO productive rounds — round 1
    # changes nothing and the loop exits — while a cold run at the same
    # 1-round cap can't even collapse one chain (diameter 9). NOTE the
    # warm start does NOT shortcut component MERGES: min-label still
    # propagates hop-by-hop through the graph (a merge costs up to the
    # merged diameter in rounds, see test above for correctness there).
    base = spark.createDataFrame(
        CHAIN_A + CHAIN_B, "src LONG, dst LONG"
    )
    prev = connected_components(base)
    rebatch = spark.createDataFrame(
        CHAIN_A + CHAIN_B + [(0, 1)], "src LONG, dst LONG"
    )
    cold_capped = {
        r["id"]: r["component"]
        for r in connected_components(rebatch, max_rounds=1).collect()
    }
    assert set(cold_capped.values()) != {0, 100}
    warm_capped = {
        r["id"]: r["component"]
        for r in connected_components(
            rebatch, max_rounds=1, init_labels=prev
        ).collect()
    }
    assert set(warm_capped.values()) == {0, 100}


def test_warm_start_new_nodes_default_to_own_id(spark):
    base = spark.createDataFrame(CHAIN_A, "src LONG, dst LONG")
    prev = connected_components(base)
    # a brand-new disconnected pair appears in the next crawl batch
    grown = spark.createDataFrame(
        CHAIN_A + [(500, 501)], "src LONG, dst LONG"
    )
    warm = {
        r["id"]: r["component"]
        for r in connected_components(grown, init_labels=prev).collect()
    }
    assert warm[500] == 500 and warm[501] == 500
    assert all(warm[i] == 0 for i in range(10))
