"""Golden tests: Spark PageRank vs the NumPy oracle (north-rule bar:
ranks allclose 1e-6 + equal iteration counts at epsilon=1e-6)."""

import math

import pytest

from ps_projekt_pagerank_spark import NORTH_EPSILON
from ps_projekt_pagerank_spark.fixtures import FIXTURE_GRAPHS, MINI_EDGES, tripled_k
from ps_projekt_pagerank_spark.operators.graph import build_graph
from ps_projekt_pagerank_spark.operators.pagerank import pagerank, pagerank_fixed
from ps_projekt_pagerank_spark.oracle import pagerank as oracle_pagerank
from ps_projekt_pagerank_spark.plans.reporting import (
    order_agreement,
    top_bottom_k,
    total_rank,
)
from ps_projekt_pagerank_spark.sources.snap import edges_from_pairs


def _assert_matches_oracle(spark, edge_list, **kw):
    expected, expected_iters = oracle_pagerank(edge_list, delta=NORTH_EPSILON)
    edges = edges_from_pairs(spark, edge_list)
    result = pagerank(edges, epsilon=NORTH_EPSILON, **kw)
    got = {r["id"]: r["rank"] for r in result.ranks.collect()}
    assert result.iterations == expected_iters
    assert set(got) == set(expected)
    for nid, r in expected.items():
        assert math.isclose(got[nid], r, abs_tol=1e-6), (nid, got[nid], r)


@pytest.mark.parametrize("name", ["sink-test", "mini", "small"])
def test_fixture_golden(spark, name):
    _assert_matches_oracle(spark, FIXTURE_GRAPHS[name])


def test_salted_two_stage_agg_matches(spark):
    _assert_matches_oracle(spark, FIXTURE_GRAPHS["mini"], salt_buckets=4)


def test_multigraph_duplicates_and_self_loops(spark):
    # duplicate edge doubles the contribution; self-loop is legal
    edge_list = [(0, 1), (0, 1), (1, 1), (1, 0), (2, 0), (0, 2)]
    _assert_matches_oracle(spark, edge_list)


def test_tripled_scale_up(spark):
    edge_list = tripled_k(MINI_EDGES, 2)  # 198 edges
    _assert_matches_oracle(spark, edge_list)


def test_graph_tables_counts(spark):
    g = build_graph(edges_from_pairs(spark, MINI_EDGES))
    assert g.num_nodes == 10
    assert g.num_edges == 22
    assert g.num_sinks == 5  # {1,6,7,8,9}
    sinks = {
        r["id"] for r in g.nodes.where("is_sink").select("id").collect()
    }
    assert sinks == {1, 6, 7, 8, 9}
    g.unpersist()


def test_fixed_iteration_power_method(spark):
    # fixed-k (no freezing) equals the oracle run with freezing disabled by
    # a huge delta... instead compare against the oracle truncated manually
    import numpy as np

    edges = edges_from_pairs(spark, MINI_EDGES)
    got = {r["id"]: r["rank"] for r in pagerank_fixed(edges, 4).collect()}
    # oracle with delta=0 never freezes; run 4 sweeps via max_iterations=4
    expected, _ = oracle_pagerank(MINI_EDGES, delta=0.0, max_iterations=4)
    assert np.allclose(
        [got[k] for k in sorted(got)], [expected[k] for k in sorted(expected)],
        atol=1e-12,
    )


def test_reporting(spark):
    edges = edges_from_pairs(spark, MINI_EDGES)
    res = pagerank(edges, epsilon=NORTH_EPSILON)
    assert math.isclose(total_rank(res.ranks), 1.0, abs_tol=10 * NORTH_EPSILON)
    tb = top_bottom_k(res.ranks, edges, k=3).collect()
    top_ids = [r["id"] for r in tb if r["which"] == "top"]
    assert set(top_ids[:2]) == {0, 5}
    assert order_agreement(res.ranks, res.ranks) == 1.0


def test_checkpoint_resume(spark, tmp_path):
    from ps_projekt_pagerank_spark.sources.checkpoint import IterationCheckpointer

    edge_list = FIXTURE_GRAPHS["mini"]
    ck_dir = str(tmp_path / "ck")
    cp = IterationCheckpointer(ck_dir)
    edges = edges_from_pairs(spark, edge_list)
    # run only 5 iterations, then resume to convergence from the snapshot
    partial = pagerank(edges, epsilon=NORTH_EPSILON, max_iterations=5,
                       checkpointer=cp)
    assert partial.iterations == 5
    assert cp.latest(spark)[0] == 5
    resumed = pagerank(edges, epsilon=NORTH_EPSILON,
                       checkpointer=IterationCheckpointer(ck_dir))
    expected, expected_iters = oracle_pagerank(edge_list, delta=NORTH_EPSILON)
    assert resumed.iterations == expected_iters
    got = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    for nid, r in expected.items():
        assert math.isclose(got[nid], r, abs_tol=1e-6)
    assert len(IterationCheckpointer(ck_dir).metrics()) >= expected_iters - 5


def test_snap_reader(spark, tmp_path):
    from ps_projekt_pagerank_spark.sources.snap import read_snap_edges

    p = tmp_path / "g.txt"
    p.write_text(
        "# Directed graph\n# Nodes: 999 Edges: 5105039\n# FromNodeId\tToNodeId\n"
        "0\t1\n0\t1\n1\t2\n2\t0\n"
    )
    edges = read_snap_edges(spark, str(p))
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert sorted(rows) == [(0, 1), (0, 1), (1, 2), (2, 0)]  # dup kept


@pytest.mark.parametrize(
    ("fname", "name"),
    [
        ("mini-web-Google.txt", "mini"),
        ("small-web-Google.txt", "small"),
        ("sink-test-web-Google.txt", "sink-test"),
    ],
)
def test_snap_reader_on_reference_fixtures(spark, fname, name):
    """S1 reader on the reference repo's actual committed fixture files
    (read-only): comment/header handling, tab separation, and that our
    inlined FIXTURE_GRAPHS edge sets are exactly what the files contain."""
    import os

    from ps_projekt_pagerank_spark.sources.snap import read_snap_edges

    path = f"/root/reference/web-Google/{fname}"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not present")
    rows = read_snap_edges(spark, path).collect()
    got = sorted((r["src"], r["dst"]) for r in rows)
    assert got == sorted(FIXTURE_GRAPHS[name])


def test_auto_salt_engages_on_hub_and_matches_unsalted(spark):
    """build_graph must derive salt_buckets > 1 when one dst holds far more
    adjacency rows than the mean AND more than a partition's fair share;
    the salted two-stage gather must reproduce the unsalted ranks. Uniform
    graphs must stay at 1 (salting there only adds a second agg)."""
    # star: 4000 distinct sources all pointing at node 0, plus a sparse
    # uniform background so the mean in-degree stays tiny
    star = [(i, 0) for i in range(1, 4001)] + [
        (i, 1 + i % 997) for i in range(1, 4001)
    ]
    g = build_graph(edges_from_pairs(spark, star), partitions=8)
    assert g.salt_buckets > 1, (g.salt_buckets, g.max_dst_rows, g.mean_dst_rows)
    assert g.max_dst_rows == 4000

    salted = pagerank(None, epsilon=1e-6, max_iterations=50, graph=g)
    unsalted = pagerank(
        None, epsilon=1e-6, max_iterations=50, graph=g, salt_buckets=1
    )
    a = {r["id"]: r["rank"] for r in salted.ranks.collect()}
    b = {r["id"]: r["rank"] for r in unsalted.ranks.collect()}
    assert a.keys() == b.keys()
    for nid in a:
        assert math.isclose(a[nid], b[nid], abs_tol=1e-9), nid
    g.unpersist()

    g_uniform = build_graph(edges_from_pairs(spark, MINI_EDGES))
    assert g_uniform.salt_buckets == 1
    g_uniform.unpersist()


@pytest.mark.parametrize("block", [2, 3, 4])
def test_multi_sweep_block_parity(spark, block):
    """block_size must not change iteration counts or ranks — the fused
    in-plan sink-mass scalars and the reference's per-sweep counting rule
    (empty sweep counted) must survive blocking."""
    edges = edges_from_pairs(spark, FIXTURE_GRAPHS["mini"])
    base = pagerank(edges, epsilon=1e-6, max_iterations=100, block_size=1)
    blocked = pagerank(
        edges, epsilon=1e-6, max_iterations=100, block_size=block
    )
    assert blocked.iterations == base.iterations
    a = {r["id"]: r["rank"] for r in base.ranks.collect()}
    b = {r["id"]: r["rank"] for r in blocked.ranks.collect()}
    assert a.keys() == b.keys()
    for nid in a:
        assert math.isclose(a[nid], b[nid], abs_tol=1e-12), nid


def test_checkpointer_backend_selection(spark, tmp_path):
    from ps_projekt_pagerank_spark.sources.checkpoint import (
        IterationCheckpointer,
        iceberg_catalogs,
    )

    # the sandbox image ships no Iceberg runtime — detection must say so
    # (on a deployment with spark.sql.catalog.<name>=SparkCatalog this
    # returns the catalog names and the table backend activates)
    assert iceberg_catalogs(spark) == []
    with pytest.raises(ValueError):
        IterationCheckpointer()
    with pytest.raises(ValueError):
        IterationCheckpointer(base_dir=str(tmp_path), table="ice.db.t")


def test_checkpointer_iceberg_roundtrip(spark, tmp_path):
    """Runs only where an Iceberg catalog is wired (real deployments);
    exercises create-on-first-write, append, max(iter) resume and the
    metrics table."""
    from ps_projekt_pagerank_spark.sources.checkpoint import (
        IterationCheckpointer,
        iceberg_catalogs,
    )

    cats = iceberg_catalogs(spark)
    if not cats:
        pytest.skip("no Iceberg catalog on this session")
    table = f"{cats[0]}.default.pr_ck_test"
    cp = IterationCheckpointer(table=table)
    edges = edges_from_pairs(spark, FIXTURE_GRAPHS["mini"])
    res = pagerank(edges, epsilon=1e-6, max_iterations=5, checkpointer=cp)
    k, df = cp.latest(spark)
    assert k == res.iterations or k == res.iterations - 1
    assert set(df.columns) >= {"id", "rank", "active"}
    assert len(cp.metrics()) >= 1
