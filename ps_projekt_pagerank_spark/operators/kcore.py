"""k-core decomposition by iterative peeling (Seidman 1983; on web graphs
the classic dense-nucleus extractor — crawl seed selection, spam-farm
detection, and community cores all start from "drop everything with fewer
than k surviving neighbors until stable").

Peeling is the textbook fixpoint: repeatedly delete nodes whose degree in
the CURRENT subgraph is < k; what remains is the (unique, maximal) k-core
of the simple undirected view. Each round here is one degree hash-agg over
the surviving edge set plus two semi-joins (endpoint filters) — all
key-hash shuffles, partial-agg friendly, nothing quadratic. Round count is
the cascade depth (how long deletions keep triggering deletions), which on
heavy-tailed web graphs is tens, not |V|; every round cuts lineage with an
eager localCheckpoint and the loop stops on the first round that deletes
nothing (one |E'|-row count action per round — the same counted-fixpoint
shape as the PageRank frozen sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import canonical_edges


def k_core(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """(id LONG) — nodes of the k-core of the simple undirected view of
    ``edges``; empty when no such subgraph exists. ``k`` must be ≥ 1."""
    if k < 1:
        raise ValueError(f"k_core needs k >= 1, got {k}")
    e = canonical_edges(edges).localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("a").alias("id"))
            .unionAll(e.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("id")
        kept = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_kept = kept.count()
        stable = n_kept == n_edges
        e.unpersist()
        e, n_edges = kept, n_kept
        if stable:
            break
    return (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .distinct()
    )
