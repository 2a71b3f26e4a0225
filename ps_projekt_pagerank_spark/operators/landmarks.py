"""Landmark (pivot) distance oracle — constant-time shortest-path
estimates over a web graph (Potamias et al., "Fast Shortest Path
Distance Estimation in Large Networks", CIKM 2009).

Exact pairwise distances need a BFS per query — unusable when a ranking
or crawl-scheduling stage asks for millions of (src, dst) distances.
The standard oracle: pick L high-degree LANDMARKS, precompute every
node's distance TO and FROM each landmark (2·L BFS sweeps, shared by
all queries), then answer est(u, v) = min_l d(u, l) + d(l, v) — an
UPPER bound by the triangle inequality, exact whenever some shortest
path passes a landmark (high-degree landmarks make that common on
hub-and-spoke web graphs).

Built on ``bfs_per_seed`` (operators/bfs.py): one composite-key frame
runs all L forward sweeps together, a second runs the backward sweeps
on the reversed edge table. The only driver action is collecting the L
landmark ids (the IVF probe-cell pattern); estimates are one join per
side + a hash agg, never a per-pair traversal.

Engine parity: distances and the min-sum readout are integer-exact;
landmark selection is deterministic (out-degree desc, id asc on the
deduplicated self-loop-free edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.bfs import bfs_per_seed


def select_landmarks(edges: DataFrame, num_landmarks: int) -> list[int]:
    """Top-``num_landmarks`` nodes by out-degree (distinct self-loop-free
    edges; ties break to the smaller id) — collected to the driver, L
    scalars."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    rows = (
        e.groupBy("src")
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "src")
        .limit(num_landmarks)
        .collect()
    )
    return [int(r["src"]) for r in rows]


def landmark_distances(
    edges: DataFrame,
    pairs: DataFrame,
    num_landmarks: int = 4,
    max_depth: int = 6,
) -> DataFrame:
    """(src, dst, est_dist INT) — the landmark upper-bound distance
    estimate for each row of ``pairs`` (columns src, dst); pairs not
    connected through any landmark within ``max_depth`` hops per side
    emit no row (the oracle cannot bound them)."""
    if num_landmarks < 1:
        raise ValueError("need >= 1 landmark")
    lmk = select_landmarks(edges, num_landmarks)
    fwd = bfs_per_seed(edges, lmk, max_depth)  # dist = d(seed -> id)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    bwd = bfs_per_seed(rev, lmk, max_depth)  # dist = d(id -> seed)
    return (
        pairs.select("src", "dst")
        .join(
            bwd.select(
                "seed", F.col("id").alias("src"), F.col("dist").alias("du")
            ),
            "src",
        )
        .join(
            fwd.select(
                "seed", F.col("id").alias("dst"), F.col("dist").alias("dv")
            ),
            ["seed", "dst"],
        )
        .groupBy("src", "dst")
        .agg(F.min(F.col("du") + F.col("dv")).cast("int").alias("est_dist"))
    )


def _bfs_chain_sql(e_cte: str, seeds_cte: str, max_depth: int, pfx: str) -> str:
    """Unrolled multi-seed BFS CTEs over edge CTE ``e_cte``, seeds from
    ``seeds_cte`` (one column id) — bfs_per_seed_sql's chain with CTE
    seeds instead of literals. Returns the CTE list (caller joins them
    with commas); the final distance set is ``{pfx}d`` (seed, id, dist)."""
    parts = [f"{pfx}0 AS (SELECT id AS seed, id FROM {seeds_cte})"]
    for k in range(1, max_depth + 1):
        parts.append(
            f"{pfx}{k} AS (SELECT seed, id FROM {pfx}{k - 1} UNION "
            f"SELECT s.seed, e.dst AS id FROM {e_cte} e "
            f"JOIN {pfx}{k - 1} s ON e.src = s.id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT seed, id, {k} AS dist FROM {pfx}{k}"
        for k in range(max_depth + 1)
    )
    parts.append(
        f"{pfx}d AS (SELECT seed, id, min(dist) AS dist FROM ({unions}) "
        "GROUP BY seed, id)"
    )
    return ", ".join(parts)


def landmark_distances_sql(
    edges_sql: str,
    pairs_sql: str,
    num_landmarks: int = 4,
    max_depth: int = 6,
) -> str:
    """DuckDB twin — identical landmark selection, forward/backward
    unrolled BFS, and min-sum readout. ``pairs_sql`` must yield columns
    (src, dst)."""
    return (
        f"WITH le AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst), "
        "lr AS (SELECT dst AS src, src AS dst FROM le), "
        "lmk AS (SELECT src AS id FROM (SELECT src, count(*) AS d "
        "FROM le GROUP BY src) "
        f"ORDER BY d DESC, src LIMIT {num_landmarks}), "
        + _bfs_chain_sql("le", "lmk", max_depth, "lf")
        + ", "
        + _bfs_chain_sql("lr", "lmk", max_depth, "lb")
        + f", lp AS (SELECT src, dst FROM ({pairs_sql})) "
        "SELECT p.src, p.dst, CAST(min(b.dist + f.dist) AS INT) AS est_dist "
        "FROM lp p "
        "JOIN lbd b ON b.id = p.src "
        "JOIN lfd f ON f.seed = b.seed AND f.id = p.dst "
        "GROUP BY p.src, p.dst"
    )
