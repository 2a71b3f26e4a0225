"""Distributed greedy graph coloring (Jones & Plassmann 1993) with the
derandomized md5 priority the MIS operator uses — distance-1 coloring of
the undirected simple graph. On a crawl fleet this schedules contention:
color the host co-contention graph and crawl one color class per wave,
and no two conflicting hosts are fetched together (the same role MIS
plays, but covering EVERY node in χ ≤ Δ+1 waves instead of one
independent wave). Reference computes only PageRank (Graph.cpp:118-173);
north-rule scheduling extension.

Per round, every still-uncolored node whose priority is a strict local
minimum among its uncolored neighbors picks the smallest color index not
used by its already-colored neighbors. Winners of one round are mutually
non-adjacent (they are an MIS of the uncolored subgraph), so the greedy
is conflict-free and fully deterministic — the unrolled SQL twin
(coloring_sql, round count measured at fixture scale) lands on the exact
same assignment.

Scale shape: the symmetrized edge list is checkpointed once; each round
is two |frontier|-row joins + hash aggs (min / count-distinct, map-side
combine), one bounded explode (a winner's candidate list is its
used-color count + 1, ≤ its degree), and ONE counting action. Round
count is the longest priority-decreasing path, O(log n / log log n)
w.h.p. for random priorities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mis import _priority


def graph_coloring(
    edges: DataFrame,
    max_rounds: int = 200,
    round_log: list | None = None,
) -> DataFrame:
    """(id LONG, color INT) — every node colored; adjacent nodes differ.

    ``round_log`` (optional) receives one append per completed round —
    how the coloring_sql unroll count is measured and test-asserted.
    """
    base = edges.where(F.col("src") != F.col("dst"))
    und = (
        base.select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
        )
        .unionAll(
            base.select(
                F.col("dst").cast("long").alias("a"),
                F.col("src").cast("long").alias("b"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    uncolored = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .select("id", _priority(F.col("id")).alias("prio"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    colored = spark.createDataFrame([], "id long, color int")
    n_left = uncolored.count()
    rounds = 0
    while n_left > 0:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"graph_coloring: no fixpoint in {max_rounds} rounds"
            )
        nbr_min = (
            und.join(
                uncolored.select(
                    F.col("id").alias("b"), F.col("prio").alias("p_b")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("p_b").alias("nbr_min"))
        )
        winners = (
            uncolored.join(nbr_min, "id", "left")
            .where(
                F.col("nbr_min").isNull()
                | (F.col("prio") < F.col("nbr_min"))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        # colors already taken around each winner
        used = (
            und.join(winners.withColumnRenamed("id", "a"), "a")
            .join(
                colored.withColumnRenamed("id", "b"), "b"
            )
            .select(F.col("a").alias("id"), "color")
            .distinct()
        )
        n_used = used.groupBy("id").agg(F.count("*").alias("k"))
        # candidates 0..k (k used colors leave a free slot in [0, k])
        cand = (
            winners.join(n_used, "id", "left")
            .select(
                "id",
                F.explode(
                    F.sequence(
                        F.lit(0), F.coalesce(F.col("k"), F.lit(0))
                    )
                ).alias("color"),
            )
        )
        assigned = (
            cand.join(used, ["id", "color"], "left_anti")
            .groupBy("id")
            .agg(F.min("color").cast("int").alias("color"))
        )
        colored = colored.unionAll(assigned).localCheckpoint(eager=True)
        nxt = uncolored.join(winners, "id", "left_anti").localCheckpoint(
            eager=True
        )
        uncolored.unpersist()
        uncolored, n_left = nxt, nxt.count()
        rounds += 1
        if round_log is not None:
            round_log.append(rounds)
    return colored


def coloring_sql(edges_sql: str, rounds: int) -> str:
    """Unrolled DuckDB twin of graph_coloring. ``rounds`` must be the
    measured fixpoint round count at the fixture scale (asserted by
    tests/test_coloring.py). Uncolored/colored sets are MATERIALIZED —
    each is referenced several times per round."""
    prio = (
        "md5(CAST(id AS VARCHAR)) || '#' || "
        "lpad(CAST(id AS VARCHAR), 20, '0')"
    )
    parts = [
        f"WITH raw AS ({edges_sql})",
        "und AS (SELECT DISTINCT a, b FROM ("
        "SELECT src AS a, dst AS b FROM raw WHERE src <> dst "
        "UNION ALL SELECT dst AS a, src AS b FROM raw WHERE src <> dst))",
        "u0 AS MATERIALIZED (SELECT id, " + prio + " AS prio FROM "
        "(SELECT DISTINCT id FROM (SELECT src AS id FROM raw "
        "UNION ALL SELECT dst AS id FROM raw)))",
        "c0 AS (SELECT CAST(NULL AS BIGINT) AS id, "
        "CAST(NULL AS INT) AS color WHERE FALSE)",
    ]
    for k in range(rounds):
        parts += [
            f"nm{k} AS (SELECT und.a AS id, min(x.prio) AS m FROM und "
            f"JOIN u{k} x ON x.id = und.b GROUP BY und.a)",
            f"w{k} AS MATERIALIZED (SELECT u.id FROM u{k} u "
            f"LEFT JOIN nm{k} n ON n.id = u.id "
            "WHERE n.m IS NULL OR u.prio < n.m)",
            f"used{k} AS MATERIALIZED (SELECT DISTINCT und.a AS id, "
            f"c.color FROM und JOIN w{k} w ON w.id = und.a "
            f"JOIN c{k} c ON c.id = und.b)",
            f"cand{k} AS (SELECT w.id, unnest(range(0, "
            f"coalesce(kd.k, 0) + 1)) AS color FROM w{k} w LEFT JOIN "
            f"(SELECT id, count(*) AS k FROM used{k} GROUP BY id) kd "
            "ON kd.id = w.id)",
            f"asg{k} AS (SELECT cand{k}.id, "
            f"CAST(min(cand{k}.color) AS INT) AS color FROM cand{k} "
            f"LEFT JOIN used{k} ON used{k}.id = cand{k}.id "
            f"AND used{k}.color = cand{k}.color "
            f"WHERE used{k}.id IS NULL GROUP BY cand{k}.id)",
            f"c{k + 1} AS MATERIALIZED (SELECT id, color FROM c{k} "
            f"UNION ALL SELECT id, color FROM asg{k})",
            f"u{k + 1} AS MATERIALIZED (SELECT * FROM u{k} WHERE "
            f"id NOT IN (SELECT id FROM w{k}))",
        ]
    return ",\n".join(parts) + f"\nSELECT id, color FROM c{rounds}"
