"""Round-4 hardening: ADVICE r3 fixes (redirect cycles, FM empty case,
cluster_stats ragged guard, budget precondition) and the VERDICT task-8
overflow guards — each guard tripped on a constructed fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.sketches import (
    fm_count_distinct,
    fm_count_distinct_sql,
)
from ps_projekt_pagerank_spark.functions.urls import resolve_redirects


# --------------------------------------------------------------- redirects
def _resolved(spark, mapping):
    df = spark.createDataFrame(mapping, "src LONG, dst LONG")
    return {
        r["src"]: r["final"] for r in resolve_redirects(df).collect()
    }


def test_redirects_self_loop_is_terminal(spark):
    # a -> a is dropped up front: a stops being a source, so chains ending
    # at a resolve TO a, and a itself emits no row
    got = _resolved(spark, [(1, 1), (2, 1)])
    assert got == {2: 1}


def test_redirects_cycle_members_excluded(spark):
    # 2-cycle a<->b: both finals keep redirecting -> excluded, matching
    # the SQL twin's terminal filter; the acyclic chain resolves normally
    got = _resolved(spark, [(1, 2), (2, 1), (5, 6), (6, 7)])
    assert got == {5: 7, 6: 7}


def test_redirects_chain_into_cycle_excluded(spark):
    # 9 -> 1 -> 2 -> 1: every walk from 9 stays in the cycle forever
    got = _resolved(spark, [(9, 1), (1, 2), (2, 1), (3, 4)])
    assert got == {3: 4}


def test_redirects_cycle_converges_early(spark):
    # the non-terminal count plateaus at the cycle size -> the loop stops
    # long before max_rounds (32 doubling rounds would take minutes of
    # wall; the plateau stop needs ~3)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src LONG, dst LONG")
    import time

    t0 = time.perf_counter()
    out = resolve_redirects(df, max_rounds=32).collect()
    assert out == []
    assert time.perf_counter() - t0 < 60


# ------------------------------------------------------------- FM empty set
def test_fm_empty_input_estimates_zero(spark):
    df = spark.createDataFrame([], "v LONG")
    row = fm_count_distinct(df, "v").collect()[0]
    assert row["sum_positions"] == 0
    assert row["est_distinct"] == 0.0


def test_fm_all_null_estimates_zero(spark):
    df = spark.createDataFrame([(None,), (None,)], "v STRING")
    row = fm_count_distinct(df, "v").collect()[0]
    assert row["est_distinct"] == 0.0


def test_fm_empty_sql_twin_agrees():
    con = duckdb.connect()
    row = con.sql(
        fm_count_distinct_sql("SELECT 1 AS v WHERE false")
    ).fetchall()[0]
    assert row == (0, 0.0)


def test_fm_nonempty_still_estimates(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v LONG")
    row = fm_count_distinct(df, "v").collect()[0]
    assert row["est_distinct"] > 10.0


# ------------------------------------------------- cluster_stats ragged dim
def test_cluster_stats_uniform_ok(spark):
    from ps_projekt_pagerank_spark.functions.embeddings import cluster_stats

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0]), (1, [2.0, 2.0])],
        "label INT, embedding ARRAY<DOUBLE>",
    )
    rows = {r["label"]: r for r in cluster_stats(df).collect()}
    assert rows[0]["n_vectors"] == 2 and rows[0]["dim"] == 2
    assert rows[1]["n_vectors"] == 1


def test_cluster_stats_ragged_raises(spark):
    from ps_projekt_pagerank_spark.functions.embeddings import cluster_stats

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0, 5.0])],
        "label INT, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(Exception, match="ragged vector lengths"):
        cluster_stats(df).collect()


# ------------------------------------------------- crawl budget precondition
def test_host_crawl_budget_guard_trips_on_non_probability(spark):
    from ps_projekt_pagerank_spark.operators.hostgraph import (
        host_crawl_budget,
    )

    bad = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0)], "host STRING, rank DOUBLE"
    )
    with pytest.raises(Exception, match="host_crawl_budget"):
        host_crawl_budget(bad, total_budget=10).collect()


def test_host_crawl_budget_valid_allocates_exactly(spark):
    from ps_projekt_pagerank_spark.operators.hostgraph import (
        host_crawl_budget,
    )

    hr = spark.createDataFrame(
        [("a", 0.5), ("b", 0.3), ("c", 0.2)], "host STRING, rank DOUBLE"
    )
    rows = host_crawl_budget(hr, total_budget=7).collect()
    assert sum(r["budget"] for r in rows) == 7


# --------------------------------------------------------- overflow guards
def test_betweenness_overflow_guard_trips(spark):
    # layered blow-up: sigma multiplies by the layer width each level, so
    # a node at layer k has sigma = 64^(k-1). The backward term is
    # sigma_v * (1e9 + delta); it overflows once sigma_v > 9.2e9, i.e. a
    # SOURCE layer of 64^6 = 6.9e10 — layer 7 of 8 (the deepest layer is
    # never a backward source). 28k edges, trivially sized for a test.
    from ps_projekt_pagerank_spark.operators.betweenness import (
        betweenness_sampled,
    )

    width, layers = 64, 8
    edges = [(0, 1 + j) for j in range(width)]
    for layer in range(layers - 1):
        base_a = 1 + layer * width
        base_b = 1 + (layer + 1) * width
        edges += [
            (base_a + i, base_b + j)
            for i in range(width)
            for j in range(width)
        ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    with pytest.raises(Exception, match="exceeds int64"):
        betweenness_sampled(df, [0], max_depth=layers + 1).collect()


def test_pmi_overflow_guard_trips(spark):
    # 2200 docs x 1000 identical tokens = 2.2M tokens, so
    # pair_count (~2.198e6) > int64max / n_tok^2 (~1.905e6) — the guard
    # must fire before the silent wrap. The corpus is generated INSIDE
    # Spark (array_repeat), not shipped as a 13MB LocalRelation literal:
    # a driver-side fixture of this size costs minutes of plan
    # serialization while proving exactly the same bound
    from pyspark.sql import functions as F
    from ps_projekt_pagerank_spark.functions.text import pmi_collocations

    df = spark.range(2200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("a"), 1000)).alias("text"),
    )
    with pytest.raises(Exception, match="int64"):
        pmi_collocations(df, min_count=1, min_pmi_bits=0).collect()


def test_pmi_normal_corpus_unaffected(spark):
    from ps_projekt_pagerank_spark.functions.text import pmi_collocations

    df = spark.createDataFrame(
        [(1, "x y x y x y z w"), (2, "x y q r")],
        "doc_id LONG, text STRING",
    )
    rows = pmi_collocations(df, min_count=2, min_pmi_bits=0).collect()
    assert any(r["w1"] == "x" and r["w2"] == "y" for r in rows)
