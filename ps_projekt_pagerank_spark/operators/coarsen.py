"""Graph coarsening by matching contraction — the multilevel kernel
(Hendrickson/Leland, Karypis/Kumar METIS): contract each edge of the
deterministic maximal matching (operators/matching.py) into a supernode,
keep inter-supernode multiplicity as an integer edge weight. One
coarsening level roughly halves the matched portion of the graph while
preserving cut structure — the standard preprocessing for partitioning a
crawl graph across executors, and a composition proof that the matching
operator produces a usable contraction set.

Representative choice is deterministic: a matched pair (u, v) with u < v
collapses into supernode u; unmatched nodes represent themselves. The
contracted edge table is undirected-canonical (cu < cv), weight = number
of original directed edges (multigraph count) between the two supernodes;
intra-supernode edges (the matched edge itself, parallel copies, and
original self-loops) drop out.

Scale shape: on top of the matching's rounds, contraction is two
|E|-row equi-joins against the |V|-row supernode map (broadcast-able —
the map is two narrow BIGINT columns) and one hash agg. Nothing
quadratic; the map join is the same shape as PageRank's rank-scatter.

The reference engine has no coarsening (rank vectors only,
Graph.cpp:118-173); north-rule §2.5 extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.matching import (
    maximal_matching,
    maximal_matching_sql,
)


def coarsen_map(edges: DataFrame) -> DataFrame:
    """(id LONG, super LONG) — every node of ``edges`` mapped to its
    supernode representative under the deterministic maximal matching."""
    nodes = edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
    matched = maximal_matching(edges)
    return (
        nodes.join(
            matched.select(F.col("v").alias("id"), F.col("u").alias("_rep")),
            "id",
            "left",
        )
        .select("id", F.coalesce("_rep", F.col("id")).alias("super"))
    )


def coarsen_edges(edges: DataFrame, cmap: DataFrame | None = None) -> DataFrame:
    """(cu LONG, cv LONG, weight BIGINT) with cu < cv — the contracted
    weighted edge table. Pass a precomputed :func:`coarsen_map` result to
    avoid re-running the matching."""
    if cmap is None:
        cmap = coarsen_map(edges)
    e = (
        edges.select("src", "dst")
        .join(
            cmap.select(F.col("id").alias("src"), F.col("super").alias("_su")),
            "src",
        )
        .join(
            cmap.select(F.col("id").alias("dst"), F.col("super").alias("_sv")),
            "dst",
        )
        .where(F.col("_su") != F.col("_sv"))
    )
    return (
        e.groupBy(
            F.least("_su", "_sv").alias("cu"),
            F.greatest("_su", "_sv").alias("cv"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def coarsen_map_sql(edges_sql: str, match_rounds: int) -> str:
    """DuckDB twin of :func:`coarsen_map`."""
    return (
        f"WITH mm AS MATERIALIZED ({maximal_matching_sql(edges_sql, match_rounds)}), "
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        f"(SELECT src AS id FROM ({edges_sql}) "
        f"UNION ALL SELECT dst FROM ({edges_sql}))) "
        "SELECT n.id, COALESCE(mv.u, n.id) AS super "
        "FROM nodes n LEFT JOIN mm mv ON n.id = mv.v"
    )


def coarsen_edges_sql(edges_sql: str, match_rounds: int) -> str:
    """DuckDB twin of :func:`coarsen_edges`."""
    return (
        f"WITH cmap AS MATERIALIZED ({coarsen_map_sql(edges_sql, match_rounds)}) "
        "SELECT least(ms.super, md.super) AS cu, "
        "greatest(ms.super, md.super) AS cv, "
        "CAST(count(*) AS BIGINT) AS weight "
        f"FROM ({edges_sql}) e "
        "JOIN cmap ms ON e.src = ms.id "
        "JOIN cmap md ON e.dst = md.id "
        "WHERE ms.super <> md.super GROUP BY 1, 2"
    )
