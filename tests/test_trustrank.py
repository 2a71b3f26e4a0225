"""TrustRank / spam-mass (VLDB'04) vs a NumPy replication on a spam-farm
fixture, plus DuckDB-twin parity for the composed SQL."""

import duckdb
import numpy as np

from ps_projekt_pagerank_spark.operators.trustrank import (
    spam_mass,
    spam_mass_sql,
    trustrank,
)

# trusted core 0-2 link each other; spam farm 4-7 all pump node 3 (the
# boosted target); one organic link 1 -> 3 so the target isn't isolated.
EDGES = [
    (0, 1), (1, 2), (2, 0), (0, 2),
    (4, 3), (5, 3), (6, 3), (7, 3),
    (3, 4), (3, 5),  # farm reciprocation (classic link-farm shape)
    (1, 3),
]
N = 8
TRUSTED = [0, 1, 2]
D = 0.85
ITERS = 6


def _edge_df(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def _np_rank(tele):
    W = np.zeros((N, N))
    for s, d_ in EDGES:
        W[s, d_] += 1.0
    outdeg = W.sum(axis=1)
    rank = tele.copy()
    for _ in range(ITERS):
        sink = rank[outdeg == 0].sum()
        restart = (1 - D) + D * sink
        contrib = np.zeros(N)
        for s in range(N):
            if outdeg[s] > 0:
                contrib += W[s] * rank[s] / outdeg[s]
        rank = restart * tele + D * contrib
    return rank


def test_spam_mass_matches_numpy(spark):
    pr = _np_rank(np.full(N, 1.0 / N))
    tele = np.array([1.0 / len(TRUSTED) if i in TRUSTED else 0.0 for i in range(N)])
    tr = _np_rank(tele)
    got = {r["id"]: r for r in spam_mass(_edge_df(spark), TRUSTED, ITERS).collect()}
    assert set(got) == set(range(N))
    for i in range(N):
        p9, t9 = round(pr[i], 9), round(tr[i], 9)
        assert np.isclose(got[i]["pr"], p9, atol=1e-12), i
        assert np.isclose(got[i]["tr"], t9, atol=1e-12), i
        assert np.isclose(got[i]["mass"], round(p9 - t9, 9), atol=1e-12), i
        assert np.isclose(
            got[i]["rel_mass"], round((p9 - t9) / p9, 6), atol=1e-12
        ), i


def test_spam_farm_has_high_relative_mass(spark):
    rows = {r["id"]: r for r in spam_mass(_edge_df(spark), TRUSTED, ITERS).collect()}
    # 6/7 receive zero trusted flow -> rank is pure spam mass; 4/5 get a
    # trickle through the boosted target 3 (which has one organic in-link
    # from trusted node 1), so theirs is high but below 1; the trusted
    # core's TR exceeds its PR (teleport concentrates there) -> rel <= 0
    for farm in (6, 7):
        assert rows[farm]["rel_mass"] > 0.95, farm
    for farm in (4, 5):
        assert 0.5 < rows[farm]["rel_mass"] < 1.0, farm
    for good in TRUSTED:
        assert rows[good]["rel_mass"] <= 0.0, good
    # the boosted target: clearly positive spam mass, but well below its
    # pure-farm satellites (the organic trusted in-link dilutes it)
    assert rows[3]["rel_mass"] > 0.3
    assert rows[3]["rel_mass"] < rows[4]["rel_mass"]


def test_trustrank_is_seed_ppr(spark):
    tr = {r["id"]: r["rank"] for r in trustrank(_edge_df(spark), TRUSTED, 3).collect()}
    tele = np.array([1.0 / len(TRUSTED) if i in TRUSTED else 0.0 for i in range(N)])
    W = np.zeros((N, N))
    for s, d_ in EDGES:
        W[s, d_] += 1.0
    outdeg = W.sum(axis=1)
    rank = tele.copy()
    for _ in range(3):
        sink = rank[outdeg == 0].sum()
        restart = (1 - D) + D * sink
        contrib = np.zeros(N)
        for s in range(N):
            if outdeg[s] > 0:
                contrib += W[s] * rank[s] / outdeg[s]
        rank = restart * tele + D * contrib
    for i in range(N):
        assert np.isclose(tr[i], rank[i], atol=1e-12), i


def test_spam_mass_sql_twin(spark):
    import __spark_entry__ as entry

    edges_sql = "SELECT * FROM (VALUES %s) AS t(src, dst)" % ", ".join(
        f"({s}, {d})" for s, d in EDGES
    )
    sql = spam_mass_sql(
        entry._pagerank_fixed_sql(ITERS, edges_sql=edges_sql),
        _ppr_sql_on(entry, edges_sql),
    )
    oracle = {
        row[0]: row
        for row in duckdb.connect().execute(sql).fetchall()
    }
    got = {r["id"]: r for r in spam_mass(_edge_df(spark), TRUSTED, ITERS).collect()}
    assert set(got) == set(oracle)
    for i in got:
        g, o = got[i], oracle[i]
        assert (g["pr"], g["tr"], g["mass"], g["rel_mass"]) == (
            o[1], o[2], o[3], o[4],
        ), i


def _ppr_sql_on(entry, edges_sql):
    """_ppr_fixed_sql is bound to the gate's _WEB CTE; rebind the leading
    edge CTE to this test's VALUES table."""
    sql = entry._ppr_fixed_sql(TRUSTED, ITERS)
    head = f"WITH e AS ({entry._WEB})"
    assert sql.startswith(head)
    return f"WITH e AS ({edges_sql})" + sql[len(head):]
