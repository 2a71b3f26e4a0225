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
from pyspark.storagelevel import StorageLevel

from .triangles import canonical_edges


def coreness(
    edges: DataFrame, rounds: int | None = None, max_rounds: int = 100
) -> DataFrame:
    """(id LONG, coreness LONG) — the core number of EVERY node of the
    simple undirected view (the largest k such that the node survives in
    the k-core). Full decomposition, not one fixed-k slice like
    :func:`k_core`.

    Computed by the h-index iteration (Lü/Zhou/Zhang/Stanley, "The
    H-index of a network node", Nature Communications 2016): start from
    h₀ = degree; each round replace h(v) by the H-index of its
    neighbors' current values (the largest h with ≥ h neighbors whose
    value ≥ h). The sequence is per-node monotone non-increasing and its
    fixpoint is exactly the core number — the same answer as Seidman
    peeling, but each round is ONE neighbor-value join + ONE
    degree-partitioned window + ONE hash agg, with round count ~ the
    graph's "coreness relaxation depth" (22 on the gate fixture) instead
    of Σ-over-k cascade depths (≈150 there). That is what makes it both
    unrollable as a DuckDB twin and shuffle-cheap at 100×: per round the
    shuffled payload is the |2E|-row (id, neighbor-h) list, the window is
    partitioned BY NODE (degree-sized partitions — same hub caveat as
    wl.py: a 10^7-degree hub makes one wide partition; cap upstream if
    that bites), and convergence is a scalar Σh check (monotone ⇒ sum
    stable ⟺ fixpoint) — one agg action per round, no row diff join.

    ``rounds=None`` (production) iterates to the counted fixpoint;
    an explicit ``rounds`` runs exactly that many — the gate twin shape
    (pytest asserts fixed-rounds == fixpoint == a literal peel oracle).
    Isolated / self-loop-only nodes report coreness 0.
    """
    from pyspark.sql import Window

    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    all_nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nbr = e.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionAll(
        e.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    )
    deg = nbr.groupBy("id").agg(F.count("*").alias("h"))
    h = (
        all_nodes.join(deg, "id", "left")
        .select("id", F.coalesce("h", F.lit(0)).alias("h"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    if rounds is None:
        prev_sum = h.agg(F.sum("h")).collect()[0][0]
    w = Window.partitionBy("id").orderBy(F.desc("val"))
    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        nv = nbr.join(
            h.select(F.col("id").alias("nb"), F.col("h").alias("val")), "nb"
        ).select("id", "val")
        hx = (
            nv.withColumn("rn", F.row_number().over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("rn"), F.col("val"))).alias("h"))
        )
        h_new = (
            all_nodes.join(hx, "id", "left")
            .select("id", F.coalesce("h", F.lit(0)).alias("h"))
            .localCheckpoint(eager=True)
        )
        h.unpersist()
        h = h_new
        if rounds is None:
            s = h.agg(F.sum("h")).collect()[0][0]
            if s == prev_sum:
                break
            prev_sum = s
    e.unpersist(blocking=False)
    all_nodes.unpersist(blocking=False)
    return h.select("id", F.col("h").cast("long").alias("coreness"))


def coreness_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB twin of :func:`coreness` with explicit ``rounds`` — the
    h-index round unrolled (MATERIALIZED: each h is referenced by the
    next round's join AND the node left-join)."""
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst)",
        f"allnodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id "
        f"FROM ({edges_sql}) UNION ALL SELECT dst FROM ({edges_sql})))",
        "nbr AS MATERIALIZED (SELECT a AS id, b AS nb FROM e "
        "UNION ALL SELECT b AS id, a AS nb FROM e)",
        "h0 AS MATERIALIZED (SELECT n.id, coalesce(d.h, 0) AS h FROM "
        "allnodes n LEFT JOIN (SELECT id, count(*) AS h FROM nbr GROUP BY id) "
        "d ON n.id = d.id)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"h{r} AS MATERIALIZED (SELECT n.id, coalesce(x.h, 0) AS h FROM "
            f"allnodes n LEFT JOIN (SELECT id, max(least(rn, val)) AS h FROM "
            f"(SELECT nbr.id, p.h AS val, row_number() OVER "
            f"(PARTITION BY nbr.id ORDER BY p.h DESC) AS rn FROM nbr "
            f"JOIN h{r - 1} p ON nbr.nb = p.id) GROUP BY id) x "
            f"ON n.id = x.id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT id, CAST(h AS BIGINT) AS coreness FROM h{rounds}"
    )


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
