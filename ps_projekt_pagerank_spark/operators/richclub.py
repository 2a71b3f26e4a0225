"""Rich-club coefficient (Zhou & Mondragón 2004; Colizza et al. 2006,
unnormalized variant) — do high-degree nodes link to each other more
densely than chance? A standard topology statistic for web/link graphs
(the reference computes only PageRank, Graph.cpp:118-173; this is a
north-rule link-analysis extension like assortativity).

For each degree threshold k:

    N_k   = |{v : deg(v) > k}|            (deg = undirected simple degree)
    E_k   = |{(u,v) in E_simple : deg(u) > k and deg(v) > k}|
    phi(k) = 2·E_k / (N_k·(N_k − 1))      (0.0 when N_k < 2)

Scale shape: one |E|-row canonicalization + hash agg for degrees, then
the edge table joins the |V|-row degree table twice (shuffle on edge
endpoints — the same co-location the adjacency build pays) and cross
joins the TINY broadcast threshold list; everything downstream is a
hash agg with map-side combine. No windows, no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_KS = (1, 2, 4, 8, 16, 32)


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Canonical (u < v) distinct edge list, self-loops dropped."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
        )
        .distinct()
    )


def rich_club(
    edges: DataFrame, ks: Sequence[int] = DEFAULT_KS
) -> DataFrame:
    """(k INT, n_nodes BIGINT, n_edges BIGINT, phi DOUBLE) per threshold.

    phi is rounded to 9 dp (cross-engine compare contract).
    """
    if not ks:
        raise ValueError("rich_club needs at least one threshold")
    spark = edges.sparkSession
    simple = _simple_undirected(edges)
    deg = (
        simple.select(F.col("u").alias("id"))
        .unionAll(simple.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ks_df = spark.createDataFrame(
        [(int(k),) for k in sorted(set(int(k) for k in ks))], "k int"
    )
    # per-k node counts: |V_k|-row agg after a broadcast theta-join with
    # the constant-size threshold list
    nodes_k = (
        deg.join(F.broadcast(ks_df), deg["deg"] > ks_df["k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    # per-k edge counts: annotate each edge with min(deg_u, deg_v) once,
    # then the same broadcast theta-join
    e_deg = (
        simple.join(deg.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(
            deg.withColumnRenamed("id", "v").withColumnRenamed(
                "deg", "deg_v"
            ),
            "v",
        )
        .select(F.least("deg_u", "deg_v").alias("min_deg"))
    )
    edges_k = (
        e_deg.join(F.broadcast(ks_df), e_deg["min_deg"] > ks_df["k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        ks_df.join(nodes_k, "k", "left")
        .join(edges_k, "k", "left")
        .select(
            "k",
            F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.when(
                F.coalesce("n_nodes", F.lit(0)) < 2, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    2.0
                    * F.coalesce("n_edges", F.lit(0))
                    / (
                        F.col("n_nodes").cast("double")
                        * (F.col("n_nodes") - F.lit(1))
                    ),
                    9,
                )
            )
            .alias("phi"),
        )
    )


def rich_club_sql(
    edges_sql: str, ks: Sequence[int] = DEFAULT_KS
) -> str:
    """DuckDB twin of rich_club (same canonicalization + theta joins)."""
    ks_rows = ", ".join(
        f"({int(k)})" for k in sorted(set(int(k) for k in ks))
    )
    return (
        f"WITH raw AS ({edges_sql}), "
        "simple AS (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM raw WHERE src <> dst), "
        "deg AS (SELECT id, count(*) AS deg FROM "
        "(SELECT u AS id FROM simple UNION ALL SELECT v AS id FROM simple) "
        "GROUP BY id), "
        f"ks(k) AS (VALUES {ks_rows}), "
        "nk AS (SELECT ks.k, count(*) AS n_nodes FROM deg JOIN ks "
        "ON deg.deg > ks.k GROUP BY ks.k), "
        "ed AS (SELECT least(du.deg, dv.deg) AS min_deg FROM simple "
        "JOIN deg du ON du.id = simple.u JOIN deg dv ON dv.id = simple.v), "
        "ek AS (SELECT ks.k, count(*) AS n_edges FROM ed JOIN ks "
        "ON ed.min_deg > ks.k GROUP BY ks.k) "
        "SELECT ks.k, coalesce(nk.n_nodes, 0) AS n_nodes, "
        "coalesce(ek.n_edges, 0) AS n_edges, "
        "CASE WHEN coalesce(nk.n_nodes, 0) < 2 THEN 0.0 ELSE "
        "round(2.0 * coalesce(ek.n_edges, 0) / "
        "(CAST(nk.n_nodes AS DOUBLE) * (nk.n_nodes - 1)), 9) END AS phi "
        "FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k"
    )
