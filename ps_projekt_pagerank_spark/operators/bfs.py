"""Multi-source BFS shortest-path distances (north-rule extension; no
reference counterpart — the reference's only traversal is the rank sweep).

The crawl-frontier / seed-distance primitive: given a seed set, label every
node with its minimum hop count from any seed (directed, unit weights).
This is the standard Pregel-style frontier expansion re-expressed as
DataFrame joins — the same gather shape as PageRank's scatter join with
``min`` semantics supplied by the anti-join (a node is claimed by the
FIRST round that reaches it, which is exactly its shortest distance).

Scale: the deduplicated edge table is partitioned by ``src`` and persisted
once; each round shuffles only the frontier (|frontier| ≤ |V| rows) into
that partitioning, and the visited set grows monotonically to |reachable|.
One Spark action per round (the frontier localCheckpoint; its row count
early-exits the loop). Rounds ≤ min(max_depth, eccentricity of the seed
set) — on web graphs effective diameter is ~6-8 (Broder et al., WWW'00),
so the loop is short even uncapped. Frontiers are NOT broadcast (unlike
``ego_network``'s small-radius variant): on a real crawl a middle-round
frontier can be a large fraction of |V|, so the join is left to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def bfs_distances(
    edges: DataFrame, seeds: list[int], max_depth: int
) -> DataFrame:
    """(id LONG, dist INT) — minimum directed hop count from any seed,
    nodes within ``max_depth`` hops only (unreached nodes are absent, the
    seeds themselves are dist 0 whether or not they appear in ``edges``).
    """
    if not seeds:
        raise ValueError("bfs_distances needs >= 1 seed node")
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    visited = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(seeds))], "id LONG, dist INT"
    )
    frontier = visited.select("id")
    for depth in range(1, max_depth + 1):
        frontier = (
            e.join(frontier, e["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionAll(
            frontier.select("id", F.lit(depth).alias("dist"))
        ).localCheckpoint(eager=True)
    e.unpersist(blocking=False)
    return visited


def distance_histogram(distances: DataFrame) -> DataFrame:
    """(dist INT, n_nodes BIGINT) — nodes per shortest-distance ring; the
    hop-plot report (effective-diameter evidence). One |V|→|depths| hash
    agg, map-side combinable."""
    return distances.groupBy("dist").agg(F.count("*").alias("n_nodes"))


def bfs_distances_sql(
    edges_sql: str, seeds: list[int], max_depth: int
) -> str:
    """DuckDB twin — unrolled monotone reachable-set chain: s_k = nodes
    within k hops; dist = min k whose set contains the node. Set monotony
    makes the min-over-k reduction equal BFS's first-claim semantics."""
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        f"s0 AS (SELECT * FROM (VALUES {seed_rows}) AS t(id))",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"s{k} AS (SELECT id FROM s{k - 1} UNION "
            f"SELECT e.dst AS id FROM e JOIN s{k - 1} s ON e.src = s.id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT id, {k} AS dist FROM s{k}" for k in range(max_depth + 1)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, CAST(min(dist) AS INT) AS dist FROM ({unions}) "
        "GROUP BY id"
    )
