"""Deterministic maximal matching (Israeli-Itai style, derandomized with
an md5 edge priority) over the undirected simple graph — the second
classic symmetry-breaking primitive beside our MIS (operators/mis.py):
pair up crawl hosts for politeness co-scheduling, build disjoint
edge-budget assignments, or seed graph coarsening (matching-based
contraction is the standard multilevel-partitioner kernel). The
reference computes only rank vectors (Graph.cpp:118-173); this is part
of the north-rule §2.5 extension family.

Priority p(u,v) = md5("u#v") || '#' || zero-padded u || '#' || v — a
strict total order over edges, identical hex in Spark and DuckDB (same
construction as MIS's node priority). Per round, every vertex picks its
minimum-priority incident edge; an edge both of whose endpoints picked
it joins the matching, matched vertices drop out, repeat. The global
minimum-priority edge is always mutual, so every round makes progress
and the greedy terminates in O(log n) expected rounds under the
random-oracle heuristic; the result is maximal (no remaining edge has
two unmatched endpoints) and fully deterministic, so the unrolled SQL
twin lands on the same matching — extra unrolled rounds past exhaustion
are no-ops on an empty edge set.

Scale shape: per round ONE |active|-row explode (two rows per edge) +
hash-agg argmin (map-side combine) + two equi-joins + two anti-joins;
the matched set and surviving edge set are eagerly localCheckpoint-ed
each round (lineage cut — the active set feeds five downstream branches,
so an uncut plan grows exponentially), giving three jobs per round, each
O(|active|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_priority(u, v):
    return F.format_string(
        "%s#%020d#%020d",
        F.md5(F.concat_ws("#", u.cast("string"), v.cast("string")).cast("binary")),
        u,
        v,
    )


def maximal_matching(edges: DataFrame, max_rounds: int = 100) -> DataFrame:
    """(u LONG, v LONG) with u < v — the deterministic maximal matching
    of the undirected simple graph underlying ``edges``."""
    if max_rounds < 1:
        raise ValueError(
            f"maximal_matching: max_rounds must be >= 1, got {max_rounds}"
        )
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    act = und.select(
        "u", "v", _edge_priority(F.col("u"), F.col("v")).alias("prio")
    ).persist()
    spark = edges.sparkSession
    matched = spark.createDataFrame([], "u long, v long")
    for _ in range(max_rounds):
        incid = act.select(F.col("u").alias("x"), "prio").unionByName(
            act.select(F.col("v").alias("x"), "prio")
        )
        picks = incid.groupBy("x").agg(F.min("prio").alias("mp"))
        # eager localCheckpoint cuts lineage every round — without it the
        # logical plan (act appears ~5x per round) grows exponentially,
        # same reason the PageRank sweep checkpoints (pagerank.py)
        mr = (
            act.join(
                picks.select(F.col("x").alias("u"), F.col("mp").alias("_p1")),
                "u",
            )
            .join(
                picks.select(F.col("x").alias("v"), F.col("mp").alias("_p2")),
                "v",
            )
            .where((F.col("prio") == F.col("_p1")) & (F.col("prio") == F.col("_p2")))
            .select("u", "v")
            .localCheckpoint()
        )
        if mr.count() == 0:  # active set exhausted (empty graph)
            break
        matched = matched.unionByName(mr)
        mv = mr.select(F.col("u").alias("x")).unionByName(
            mr.select(F.col("v").alias("x"))
        )
        nxt = (
            act.join(mv.withColumnRenamed("x", "u"), "u", "left_anti")
            .join(mv.withColumnRenamed("x", "v"), "v", "left_anti")
            .select("u", "v", "prio")
            .localCheckpoint()
        )
        act.unpersist()
        act = nxt
    act.unpersist()
    return matched.select("u", "v")


def maximal_matching_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB twin — ``rounds`` unrolled mutual-pick rounds (measure the
    fixture's round count first; extra rounds are empty no-ops)."""
    if rounds < 1:
        raise ValueError(f"maximal_matching_sql: rounds must be >= 1, got {rounds}")
    prio = (
        "md5(CAST(u AS VARCHAR) || '#' || CAST(v AS VARCHAR)) || '#' || "
        "lpad(CAST(u AS VARCHAR), 20, '0') || '#' || "
        "lpad(CAST(v AS VARCHAR), 20, '0')"
    )
    parts = [
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM ({edges_sql}) WHERE src <> dst)",
        f"a0 AS MATERIALIZED (SELECT u, v, {prio} AS prio FROM und)",
    ]
    for r in range(1, rounds + 1):
        prev = f"a{r - 1}"
        parts.append(
            f"pk{r} AS MATERIALIZED (SELECT x, MIN(prio) AS mp FROM "
            f"(SELECT u AS x, prio FROM {prev} "
            f"UNION ALL SELECT v, prio FROM {prev}) GROUP BY 1)"
        )
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT a.u, a.v FROM {prev} a "
            f"JOIN pk{r} p1 ON a.u = p1.x AND a.prio = p1.mp "
            f"JOIN pk{r} p2 ON a.v = p2.x AND a.prio = p2.mp)"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT u, v, prio FROM {prev} WHERE "
            f"u NOT IN (SELECT u FROM m{r} UNION ALL SELECT v FROM m{r}) "
            f"AND v NOT IN (SELECT u FROM m{r} UNION ALL SELECT v FROM m{r}))"
        )
    union = " UNION ALL ".join(
        f"SELECT u, v FROM m{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ", ".join(parts) + f" SELECT u, v FROM ({union})"
