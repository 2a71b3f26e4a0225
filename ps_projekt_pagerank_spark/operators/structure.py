"""Edge reciprocity — the directed-mutuality structure metric of the
web graph (Broder et al., "Graph structure in the Web", WWW 2000 report
links that are mutual far above chance; Garlaschelli & Loffredo,
"Patterns of Link Reciprocity in Directed Networks", PRL 2004 make it a
first-class statistic).

Reciprocity r = |{(u,v) : (u,v) in E and (v,u) in E}| / |E| over the
DISTINCT self-loop-free edge set. Per-node reciprocity is the same
fraction restricted to a node's out-edges — hubs whose links are never
returned (directories, link farms) sit at 0; tightly-knit communities
sit near 1, which makes the per-node score a cheap spam/community
signal next to TrustRank.

Scale: ONE self-equi-join of the distinct edge table against its
swapped projection on (src,dst) — hash-partitioned both sides, no
fan-out beyond edge multiplicity 1, then a hash agg. No windows, no
Python, no driver loops; survives 100x by the same argument as the
out-degree agg (operators/graph.py).

Reference scope note: the reference engine (Graph4CL.cpp) stops at
degree accounting; reciprocity is part of the wider link-graph toolkit
this engine adds on the same adjacency inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _reciprocity_counts(edges: DataFrame) -> DataFrame:
    """1-row (n_edges, n_reciprocal) over the distinct self-loop-free
    edge set — the SINGLE implementation of the reciprocity semi-join;
    both public projections (this module's 6-dp form and
    ``operators.graph.reciprocity``'s report schema) build on it so the
    two can never diverge.

    Scale: one distinct over |E| plus one self-equi-join on the full
    (src, dst) key — plain hash shuffles, join output ≤ |E| rows."""
    e = _clean_edges(edges)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    marked = e.join(rev, ["src", "dst"], "left_semi")
    return e.agg(F.count("*").alias("n_edges")).crossJoin(
        marked.agg(F.count("*").alias("n_reciprocal"))
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity): distinct
    self-loop-free edge count, how many have their reverse present, and
    the ratio rounded to 6 dp (0.0 on an empty graph)."""
    return (
        _reciprocity_counts(edges)
        .select(
            "n_edges",
            "n_reciprocal",
            F.when(
                F.col("n_edges") > 0,
                F.round(
                    F.col("n_reciprocal")
                    / F.col("n_edges").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("reciprocity"),
        )
    )


def node_reciprocity(edges: DataFrame) -> DataFrame:
    """(id, out_deg, n_reciprocal, reciprocity) for every node with at
    least one self-loop-free out-edge: the fraction of its distinct
    out-links that are returned. Ratio rounded to 6 dp."""
    e = _clean_edges(edges)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    flagged = e.join(rev, ["src", "dst"], "left_semi").select(
        "src", F.lit(1).alias("_r")
    )
    per = (
        e.select("src", F.lit(0).alias("_r"))
        .unionAll(flagged)
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(F.lit(1) - F.col("_r")).alias("out_deg"),
            F.sum("_r").alias("n_reciprocal"),
        )
    )
    return per.select(
        "id",
        F.col("out_deg").cast("long").alias("out_deg"),
        F.col("n_reciprocal").cast("long").alias("n_reciprocal"),
        F.round(
            F.col("n_reciprocal") / F.col("out_deg").cast("double"), 6
        ).alias("reciprocity"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(deg, n_nodes, avg_nn_deg) — the degree-correlation CURVE
    k -> knn(k) (Pastor-Satorras, Vazquez & Vespignani, PRL 2001) over
    the undirected simple graph: for each undirected degree k, the mean
    over nodes of degree k of their neighbors' mean degree, rounded to
    6 dp. Assortativity (operators/assortativity.py) is this curve's
    slope sign; the curve itself shows WHERE the web graph is
    disassortative (hub-to-leaf regions).

    Scale: symmetrize + distinct (one shuffle), degree agg, one
    |E|-row equi-join of edge endpoints to degrees, two hash aggs.
    The per-node mean uses exact integer sums (sum of neighbor degrees
    is a BIGINT) closed by one double division — engine-exact.
    """
    e = _clean_edges(edges)
    und = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    nbr = (
        und.join(deg.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src")
        .agg(
            F.sum("deg").alias("_sum_nd"),
            F.count("*").alias("_n_nb"),
        )
    )
    # per-node mean as NANO-UNIT integers ((sum*1e9) div n — exact
    # BIGINT arithmetic, identical cross-engine), so the group average
    # is an exact BIGINT sum closed by one double division: FP summation
    # order can't split the engines at the 6-dp round. int64 bound:
    # per-node sum of neighbor degrees < 9.2e9 (same convention as the
    # betweenness nano-units, operators/betweenness.py).
    per_node = deg.join(
        nbr.withColumnRenamed("src", "id"), "id"
    ).select(
        "deg",
        F.expr(
            "CAST(_sum_nd AS BIGINT) * 1000000000 div _n_nb"
        ).alias("_nn_nano"),
    )
    return (
        per_node.groupBy("deg")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.round(
                F.sum("_nn_nano")
                / (F.count("*") * F.lit(1_000_000_000)).cast("double"),
                6,
            ).alias("avg_nn_deg"),
        )
        .select(F.col("deg").cast("long").alias("deg"), "n_nodes", "avg_nn_deg")
    )


def avg_neighbor_degree_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`avg_neighbor_degree` — same
    symmetrization, same exact-integer per-node means, same rounding."""
    return (
        f"WITH rce AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst), "
        "und AS (SELECT src, dst FROM rce UNION "
        "SELECT dst AS src, src AS dst FROM rce), "
        "dg AS (SELECT src AS id, count(*) AS deg FROM und GROUP BY src), "
        "nb AS (SELECT u.src, "
        "CAST(sum(d.deg) AS BIGINT) * 1000000000 // count(*) AS nn_nano "
        "FROM und u JOIN dg d ON u.dst = d.id GROUP BY u.src) "
        "SELECT CAST(dg.deg AS BIGINT) AS deg, "
        "CAST(count(*) AS BIGINT) AS n_nodes, "
        "round(CAST(sum(nb.nn_nano) AS DOUBLE) / "
        "(count(*) * CAST(1000000000 AS DOUBLE)), 6) AS avg_nn_deg "
        "FROM dg JOIN nb ON dg.id = nb.src GROUP BY dg.deg"
    )


def reciprocity_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`reciprocity` — same distinct self-loop-free
    edge set, same semi-join, same rounding."""
    return (
        f"WITH rce AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst), "
        "rcm AS (SELECT count(*) AS n_reciprocal FROM rce a "
        "WHERE EXISTS (SELECT 1 FROM rce b "
        "WHERE b.src = a.dst AND b.dst = a.src)) "
        "SELECT CAST(n_edges AS BIGINT) AS n_edges, "
        "CAST(n_reciprocal AS BIGINT) AS n_reciprocal, "
        "CASE WHEN n_edges > 0 THEN "
        "round(n_reciprocal / CAST(n_edges AS DOUBLE), 6) "
        "ELSE 0.0 END AS reciprocity "
        "FROM (SELECT count(*) AS n_edges FROM rce), rcm"
    )


def node_reciprocity_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`node_reciprocity`."""
    return (
        f"WITH rce AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst) "
        "SELECT src AS id, CAST(count(*) AS BIGINT) AS out_deg, "
        "CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM rce b "
        "WHERE b.src = a.dst AND b.dst = a.src) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_reciprocal, "
        "round(sum(CASE WHEN EXISTS (SELECT 1 FROM rce b "
        "WHERE b.src = a.dst AND b.dst = a.src) THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE), 6) AS reciprocity "
        "FROM rce a GROUP BY src"
    )
