"""Deterministic maximal independent set (Luby 1986, derandomized with an
md5 priority) over the undirected simple graph — the classic symmetry-
breaking primitive for distributed scheduling (e.g. politeness-window
assignment for crawl workers over the host graph; reference computes only
PageRank, Graph.cpp:118-173; north-rule extension).

Priority p(v) = md5(v) || '#' || zero-padded v — a strict total order
(the id suffix breaks even the astronomically-unlikely md5 tie), identical
hex in Spark and DuckDB. Per round, every still-undecided node whose
priority is a strict local minimum among its undecided neighbors joins the
MIS; its neighbors become excluded; repeat until no node is undecided.
With random-oracle priorities the expected round count is O(log n).

The greedy is fully deterministic, so the unrolled SQL twin (mis_sql,
round count measured at the fixture scale) lands on the same set.

Scale shape: the symmetrized edge list is checkpointed once; each round
is one |active|-row join + hash agg (min, map-side combine) + two
anti-joins; ONE counting action per round drives the stop decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _priority(col):
    return F.format_string(
        "%s#%020d", F.md5(col.cast("string").cast("binary")), col
    )


def maximal_independent_set(
    edges: DataFrame, max_rounds: int = 100
) -> DataFrame:
    """(id LONG) — the members of the deterministic MIS."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
        )
        .unionAll(
            edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").cast("long").alias("a"),
                F.col("src").cast("long").alias("b"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    active = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .select("id", _priority(F.col("id")).alias("prio"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "id long")
    n_active = active.count()
    rounds = 0
    while n_active > 0:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"maximal_independent_set: no fixpoint in {max_rounds} "
                "rounds (expected O(log n))"
            )
        # min undecided-neighbor priority per undecided node
        nbr_min = (
            und.join(
                active.select(
                    F.col("id").alias("b"), F.col("prio").alias("p_b")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("p_b").alias("nbr_min"))
        )
        winners = (
            active.join(nbr_min, "id", "left")
            .where(
                F.col("nbr_min").isNull()
                | (F.col("prio") < F.col("nbr_min"))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        excluded = (
            und.join(winners.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"))
            .distinct()
        )
        mis = mis.unionAll(winners)
        nxt = (
            active.join(winners, "id", "left_anti")
            .join(excluded, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        active.unpersist()
        active, n_active = nxt, nxt.count()
        rounds += 1
    return mis.select("id")


def mis_sql(edges_sql: str, rounds: int) -> str:
    """Unrolled DuckDB twin of maximal_independent_set.

    ``rounds`` must be the measured fixpoint round count at the fixture
    scale (the Spark loop is deterministic, so the counted loop stops at
    the same round). Active sets are MATERIALIZED — each is referenced
    three times per round and DuckDB's planner otherwise inlines the
    whole unroll exponentially (see gate-and-bench notes on k-truss).
    """
    prio = "md5(CAST(id AS VARCHAR)) || '#' || lpad(CAST(id AS VARCHAR), 20, '0')"
    parts = [
        f"WITH raw AS ({edges_sql})",
        "und AS (SELECT DISTINCT a, b FROM ("
        "SELECT src AS a, dst AS b FROM raw WHERE src <> dst "
        "UNION ALL SELECT dst AS a, src AS b FROM raw WHERE src <> dst))",
        "a0 AS MATERIALIZED (SELECT id, " + prio + " AS prio FROM "
        "(SELECT DISTINCT id FROM (SELECT src AS id FROM raw "
        "UNION ALL SELECT dst AS id FROM raw)))",
    ]
    for k in range(rounds):
        parts += [
            f"nm{k} AS (SELECT und.a AS id, min(x.prio) AS m FROM und "
            f"JOIN a{k} x ON x.id = und.b GROUP BY und.a)",
            f"w{k} AS MATERIALIZED (SELECT a.id FROM a{k} a "
            f"LEFT JOIN nm{k} n ON n.id = a.id "
            "WHERE n.m IS NULL OR a.prio < n.m)",
            f"ex{k} AS (SELECT DISTINCT und.b AS id FROM und "
            f"JOIN w{k} w ON w.id = und.a)",
            f"a{k + 1} AS MATERIALIZED (SELECT * FROM a{k} WHERE "
            f"id NOT IN (SELECT id FROM w{k}) "
            f"AND id NOT IN (SELECT id FROM ex{k}))",
        ]
    union = " UNION ALL ".join(
        f"SELECT id FROM w{k}" for k in range(rounds)
    )
    return ",\n".join(parts) + f"\nSELECT id FROM ({union})"
