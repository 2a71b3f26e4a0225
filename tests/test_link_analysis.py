"""HITS + personalized PageRank vs NumPy replications, degree
distribution vs a hand count."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.hits import hits
from ps_projekt_pagerank_spark.operators.pagerank import (
    pagerank_personalized_fixed,
)
from ps_projekt_pagerank_spark.plans.reporting import degree_distribution

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (0, 2), (4, 0), (0, 5)]
N = 6  # node 5 is a sink (exercises sink mass + the outdeg-0 coalesce)


def _edge_df(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def test_hits_matches_numpy(spark):
    W = np.zeros((N, N))
    for s, d in EDGES:
        W[s, d] += 1.0  # multigraph weights, like the built adjacency
    hub = np.ones(N)
    for _ in range(4):
        auth = W.T @ hub
        auth = auth / auth.max()
        hub = W @ auth
        hub = hub / hub.max()
    got = {r["id"]: (r["auth"], r["hub"]) for r in hits(_edge_df(spark), 4).collect()}
    assert set(got) == set(range(N))
    for i in range(N):
        assert np.isclose(got[i][0], auth[i], atol=1e-9), ("auth", i)
        assert np.isclose(got[i][1], hub[i], atol=1e-9), ("hub", i)


def test_hits_rejects_zero_iterations(spark):
    from ps_projekt_pagerank_spark.operators.hits import hits_sql

    with pytest.raises(ValueError, match="iterations"):
        hits(_edge_df(spark), 0)
    with pytest.raises(ValueError, match="iterations"):
        hits_sql("SELECT 1 AS src, 2 AS dst", 0)


def test_ppr_rejects_bad_seeds(spark):
    with pytest.raises(ValueError, match="seed"):
        pagerank_personalized_fixed(_edge_df(spark), [], 2)
    with pytest.raises(ValueError, match="seed"):
        pagerank_personalized_fixed(_edge_df(spark), [777, 888], 2)


def test_ppr_matches_numpy_and_localizes(spark):
    d = 0.85
    seeds = [0]
    tele = np.array([1.0 if i in seeds else 0.0 for i in range(N)])
    tele /= tele.sum()
    W = np.zeros((N, N))
    for s, dd_ in EDGES:
        W[s, dd_] += 1.0
    outdeg = W.sum(axis=1)
    rank = tele.copy()
    for _ in range(4):
        sink = rank[outdeg == 0].sum()
        restart = (1 - d) + d * sink
        contrib = np.zeros(N)
        for s in range(N):
            if outdeg[s] > 0:
                contrib += W[s] * rank[s] / outdeg[s]
        rank = restart * tele + d * contrib
    got = {
        r["id"]: r["rank"]
        for r in pagerank_personalized_fixed(
            _edge_df(spark), seeds=seeds, num_iterations=4
        ).collect()
    }
    for i in range(N):
        assert np.isclose(got[i], rank[i], atol=1e-12), i
    # personalization localizes: the seed outranks everything its mass
    # can only reach through multiple hops
    assert got[0] > got[3]
    # node 3 has no in-links and is not a seed -> exactly zero
    assert got[3] == 0.0


def test_degree_distribution_counts(spark):
    got = {
        r["outdeg"]: r["n_nodes"]
        for r in degree_distribution(_edge_df(spark)).collect()
    }
    # node outdegs: 0->4, 1/2/4->1, 3->2, 5->0 (sink)
    assert got == {4: 1, 1: 3, 2: 1, 0: 1}


def test_salsa_matches_numpy(spark):
    from ps_projekt_pagerank_spark.operators.salsa import salsa

    W = np.zeros((N, N))
    for s, d in EDGES:
        W[s, d] += 1.0
    ind = W.sum(axis=0)
    outd = W.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        w_back = np.where(ind > 0, W / ind[None, :], 0.0)
        w_fwd = np.where(outd[:, None] > 0, W / outd[:, None], 0.0)
    auth = np.ones(N)
    for _ in range(4):
        hub = w_back @ auth
        hub = hub / hub.max()
        auth = w_fwd.T @ hub
        auth = auth / auth.max()
    got = {
        r["id"]: (r["auth"], r["hub"]) for r in salsa(_edge_df(spark), 4).collect()
    }
    assert set(got) == set(range(N))
    for i in range(N):
        assert np.isclose(got[i][0], auth[i], atol=1e-9), ("auth", i)
        assert np.isclose(got[i][1], hub[i], atol=1e-9), ("hub", i)
    # SALSA's signature vs HITS: scores follow normalized degrees, so the
    # sink node 5 still has auth > 0 while holding hub = 0
    assert got[5][0] > 0 and got[5][1] == 0.0


def test_salsa_rejects_zero_iterations(spark):
    from ps_projekt_pagerank_spark.operators.salsa import salsa, salsa_sql

    with pytest.raises(ValueError, match="iterations"):
        salsa(_edge_df(spark), 0)
    with pytest.raises(ValueError, match="iterations"):
        salsa_sql("SELECT 1 AS src, 2 AS dst", 0)
