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


def bfs_per_seed(
    edges: DataFrame, seeds: list[int], max_depth: int
) -> DataFrame:
    """(seed LONG, id LONG, dist INT) — independent BFS from EACH seed in
    one composite-key frame (state rows are (seed, id); the frontier join
    and visited anti-join key on both). The per-source distance samples
    the classic sampled effective-diameter estimate needs.

    Scale: |seeds| interleaved traversals share every scan/shuffle — state
    is at most |seeds|·|V| rows, the per-round edge join fans each
    frontier row out by out-degree exactly like single-source BFS.
    """
    if not seeds:
        raise ValueError("bfs_per_seed needs >= 1 seed node")
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
        [(int(s), int(s), 0) for s in sorted(set(seeds))],
        "seed LONG, id LONG, dist INT",
    )
    frontier = visited.select("seed", "id")
    for depth in range(1, max_depth + 1):
        frontier = (
            e.join(frontier, e["src"] == frontier["id"])
            .select("seed", F.col("dst").alias("id"))
            .distinct()
            .join(visited, ["seed", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionAll(
            frontier.select("seed", "id", F.lit(depth).alias("dist"))
        ).localCheckpoint(eager=True)
    e.unpersist(blocking=False)
    return visited


def effective_diameter_sampled(
    edges: DataFrame,
    seeds: list[int],
    max_depth: int,
    quantile_pct: int = 90,
) -> DataFrame:
    """One row (h_eff INT, covered_pairs BIGINT, total_pairs BIGINT,
    coverage DOUBLE) — the sampled effective diameter: the smallest depth
    h <= max_depth at which >= ``quantile_pct``% of all reached
    (seed, node) pairs lie within h hops (Broder et al.'s "effective
    diameter ~ 16" statistic, estimated from BFS samples instead of ANF
    sketches — every moment here is an exact BIGINT count, so any engine
    reproduces the row bit-for-bit; the ANF operator remains the
    full-graph scale path).

    If the ``quantile_pct`` mass is not covered by ``max_depth``,
    h_eff = max_depth (coverage says how close it got).
    """
    dist = bfs_per_seed(edges, seeds, max_depth)
    hist = dist.groupBy("dist").agg(F.count("*").alias("n"))
    # cumulative coverage per depth without a window: tiny (max_depth+1
    # rows) self-join on dist <= h
    tot = hist.agg(F.sum("n").alias("total_pairs"))
    cum = (
        hist.alias("a")
        .join(hist.alias("b"), F.col("b.dist") <= F.col("a.dist"))
        .groupBy(F.col("a.dist").alias("h"))
        .agg(F.sum("b.n").alias("covered"))
    )
    q = int(quantile_pct)
    hit = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("covered") * 100 >= F.col("total_pairs") * q)
        .agg(F.min("h").alias("h_hit"))
    )
    final = (
        hit.crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("h_hit", F.lit(int(max_depth))).alias("h_eff"),
            "total_pairs",
        )
        .join(
            cum.select(F.col("h").alias("h_eff"), "covered"), "h_eff"
        )
    )
    return final.select(
        F.col("h_eff").cast("int").alias("h_eff"),
        F.col("covered").alias("covered_pairs"),
        "total_pairs",
        (
            F.col("covered").cast("double")
            / F.col("total_pairs").cast("double")
        ).alias("coverage"),
    )


def bfs_per_seed_sql(
    edges_sql: str, seeds: list[int], max_depth: int
) -> str:
    """DuckDB twin of bfs_per_seed — the single-source unrolled monotone
    chain with the seed carried through every set."""
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        f"p0 AS (SELECT id AS seed, id FROM (VALUES {seed_rows}) AS t(id))",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"p{k} AS (SELECT seed, id FROM p{k - 1} UNION "
            f"SELECT s.seed, e.dst AS id FROM e JOIN p{k - 1} s "
            "ON e.src = s.id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT seed, id, {k} AS dist FROM p{k}"
        for k in range(max_depth + 1)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT seed, id, CAST(min(dist) AS INT) AS dist "
        f"FROM ({unions}) GROUP BY seed, id"
    )


def effective_diameter_sql(
    edges_sql: str,
    seeds: list[int],
    max_depth: int,
    quantile_pct: int = 90,
) -> str:
    """DuckDB twin of effective_diameter_sampled."""
    q = int(quantile_pct)
    return (
        f"WITH dist AS ({bfs_per_seed_sql(edges_sql, seeds, max_depth)}), "
        "hist AS (SELECT dist, count(*) AS n FROM dist GROUP BY dist), "
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_pairs FROM hist), "
        "cum AS (SELECT a.dist AS h, CAST(sum(b.n) AS BIGINT) AS covered "
        "FROM hist a JOIN hist b ON b.dist <= a.dist GROUP BY a.dist), "
        "hit AS (SELECT min(h) AS h_hit FROM cum CROSS JOIN tot "
        f"WHERE covered * 100 >= total_pairs * {q}), "
        "fin AS (SELECT CAST(coalesce(h_hit, "
        f"{int(max_depth)}) AS INT) AS h_eff, total_pairs "
        "FROM hit CROSS JOIN tot) "
        "SELECT fin.h_eff, cum.covered AS covered_pairs, fin.total_pairs, "
        "CAST(cum.covered AS DOUBLE) / CAST(fin.total_pairs AS DOUBLE) "
        "AS coverage "
        "FROM fin JOIN cum ON cum.h = fin.h_eff"
    )


def sssp_weighted(
    edges: DataFrame, seeds: list[int], rounds: int
) -> DataFrame:
    """(id LONG, dist LONG) — multi-source shortest WEIGHTED distances
    after exactly ``rounds`` min-plus relaxations (Bellman-Ford steps):
    dist'(v) = min(dist(v), min over in-edges (dist(u) + w)). With
    rounds >= the longest shortest path's hop count this is exact SSSP;
    fewer rounds give the best distance within that many hops — the same
    fixed-sweep contract as ``pagerank_fixed`` (and what makes the op
    unrollable as ANSI SQL). Weights must be non-negative integers —
    distances stay exact BIGINTs, bit-identical cross-engine.

    Scale: per round one |frontier|-to-adjacency equi-join (src-
    partitioned cached edges) + a min hash agg over the sparse state
    (only reached nodes carry rows); one action per round (the lineage-
    cutting checkpoint).
    """
    if not seeds:
        raise ValueError("sssp_weighted needs >= 1 seed node")
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    spark = edges.sparkSession
    e = (
        edges.select(
            "src", "dst", F.col("w").cast("long").alias("w")
        )
        .where(F.col("src") != F.col("dst"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    state = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(seeds))], "id LONG, dist LONG"
    )
    for _ in range(rounds):
        cand = (
            e.join(state, e["src"] == state["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        state = (
            state.unionAll(cand)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    e.unpersist(blocking=False)
    return state


def sssp_weighted_sql(
    edges_sql: str, seeds: list[int], rounds: int
) -> str:
    """DuckDB twin — the identical min-plus unroll (MATERIALIZED: each
    round references the previous state twice)."""
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst, CAST(w AS BIGINT) AS w "
        f"FROM ({edges_sql}) WHERE src <> dst)",
        "s0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS dist "
        f"FROM (VALUES {seed_rows}) AS t(id))",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT id, min(dist) AS dist FROM ("
            f"SELECT id, dist FROM s{k - 1} "
            f"UNION ALL SELECT e.dst AS id, s.dist + e.w AS dist "
            f"FROM e JOIN s{k - 1} s ON e.src = s.id) GROUP BY id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, dist FROM s{rounds}"


def closeness_sampled(
    edges: DataFrame, seeds: list[int], max_depth: int
) -> DataFrame:
    """(seed, reached, sum_dist, closeness, closeness_wf) — outward
    closeness centrality for sampled seed nodes, bounded at ``max_depth``
    hops (nodes farther than that are excluded — the standard truncated/
    sampled estimate; raise max_depth past the effective diameter for the
    exact value). ``closeness`` is the classic (reached-1)/sum_dist;
    ``closeness_wf`` applies the Wasserman-Faust reachable-fraction
    correction (reached-1)^2 / ((n_nodes-1) * sum_dist), which makes
    scores comparable across disconnected components.

    Every moment is an exact BIGINT (counts and distance sums); the two
    scores are single IEEE divisions — engine-exact vs
    ``closeness_sampled_sql``. Seeds that reach nothing (isolated or
    sink seeds) get NULL scores rather than a 0/0.

    Scale: rides bfs_per_seed (|seeds| interleaved traversals sharing
    every shuffle); the finish is one |seeds|-row agg plus a broadcast
    one-row node count. Reference parity: the reference computes no
    centralities beyond PageRank (pagerank.cpp); closeness extends the
    link-analysis family the survey's §2.5 calls for.
    """
    dist = bfs_per_seed(edges, seeds, max_depth)
    n_nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .agg(F.countDistinct("id").alias("n_nodes"))
    )
    per = dist.groupBy("seed").agg(
        F.count("*").alias("reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
    )
    r1 = F.col("reached") - 1
    return per.crossJoin(F.broadcast(n_nodes)).select(
        "seed",
        "reached",
        "sum_dist",
        F.when(
            F.col("sum_dist") > 0,
            r1.cast("double") / F.col("sum_dist").cast("double"),
        ).alias("closeness"),
        F.when(
            F.col("sum_dist") > 0,
            (r1 * r1).cast("double")
            / ((F.col("n_nodes") - 1) * F.col("sum_dist")).cast("double"),
        ).alias("closeness_wf"),
    )


def closeness_sampled_sql(
    edges_sql: str, seeds: list[int], max_depth: int
) -> str:
    """DuckDB twin of closeness_sampled — same unrolled BFS chain, same
    BIGINT moments, same guarded IEEE divisions."""
    return (
        f"WITH dist AS ({bfs_per_seed_sql(edges_sql, seeds, max_depth)}), "
        f"nn AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n_nodes "
        f"FROM (SELECT src AS id FROM ({edges_sql}) "
        f"UNION ALL SELECT dst FROM ({edges_sql}))), "
        "per AS (SELECT seed, CAST(count(*) AS BIGINT) AS reached, "
        "CAST(sum(dist) AS BIGINT) AS sum_dist FROM dist GROUP BY seed) "
        "SELECT seed, reached, sum_dist, "
        "CASE WHEN sum_dist > 0 THEN CAST(reached - 1 AS DOUBLE) / "
        "CAST(sum_dist AS DOUBLE) END AS closeness, "
        "CASE WHEN sum_dist > 0 THEN "
        "CAST((reached - 1) * (reached - 1) AS DOUBLE) / "
        "CAST((n_nodes - 1) * sum_dist AS DOUBLE) END AS closeness_wf "
        "FROM per CROSS JOIN nn"
    )
