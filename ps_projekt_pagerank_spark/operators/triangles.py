"""Triangle counting over the canonicalized simple graph (north-rule
extension; contract = oracle.graph_algos.triangle_count).

Standard distributed algorithm: canonicalize (src<dst), dedup, then a
wedge self-join closed by a semi-check join — all DataFrame equi-joins, so
Catalyst picks broadcast/SMJ and AQE splits skewed build sides. Each
triangle a<b<c is found exactly once as wedge (a-b, b-c) closed by edge
(a-c).

Degree-ordered orientation (the web-scale essential): each undirected edge
is oriented from its lower-(degree, id) endpoint to the higher one, and
wedges are enumerated only from out-neighbor PAIRS at the pivot — so a
degree-d hub contributes C(out_d, 2) wedges with out_d bounded by the
number of HIGHER-degree neighbors (≤ O(sqrt(E)) on any graph), instead of
C(d, 2). On power-law web graphs this is the difference between a feasible
job and a quadratic hub blowup. Every triangle is counted exactly once, at
its minimum-(degree, id) corner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def canonical_edges(edges: DataFrame) -> DataFrame:
    """undirected simple view: self-loops dropped, (min,max), distinct."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def _oriented(e: DataFrame) -> DataFrame:
    """(u, v): each canonical edge oriented low→high by (degree, id)."""
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def _closed_triangles(
    edges: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(closed, e, o): closed = one row (x, y, z) per triangle; e/o are the
    persisted canonical and oriented edge sets — callers MUST unpersist both
    after materializing anything derived from ``closed``."""
    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    o = _oriented(e).persist(StorageLevel.MEMORY_AND_DISK)
    w1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = o.select(F.col("u").alias("x2"), F.col("v").alias("z"))
    # unordered out-neighbor pairs at the pivot: y < z by id avoids double
    # enumeration; the closing undirected edge is checked canonically
    wedges = w1.join(
        w2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z"))
    ).select("x", "y", "z")
    closed = wedges.join(
        e,
        (F.least("y", "z") == F.col("a")) & (F.greatest("y", "z") == F.col("b")),
        "left_semi",
    )
    return closed, e, o


def triangles_total(edges: DataFrame) -> DataFrame:
    """1-row DataFrame: (triangles LONG)."""
    closed, e, o = _closed_triangles(edges)
    # materialize the scalar (localCheckpoint keeps the result a DataFrame)
    # so the two persisted edge sets can be released before returning
    out = closed.agg(F.count("*").alias("triangles")).localCheckpoint(eager=True)
    e.unpersist()
    o.unpersist()
    return out


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(id LONG, triangles LONG) — triangles through each node; nodes in no
    triangle get 0."""
    closed, e, o = _closed_triangles(edges)
    counts = (
        closed.select(F.col("x").alias("id"))
        .unionAll(closed.select(F.col("y").alias("id")))
        .unionAll(closed.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
        # ≤|V| rows; materializing here lets e/o be released eagerly
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    o.unpersist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return nodes.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, coefficient) — local clustering coefficient
    on the simple undirected view: c(v) = 2·t(v) / (deg(v)·(deg(v)−1)),
    0.0 for degree < 2 (the Watts-Strogatz per-node statistic; on web
    graphs the classic density probe for template/boilerplate link blocks).

    ``coefficient`` is a single multiply/divide rounded to 9 dp, so any
    engine reproduces it bit-for-bit from the same integer (triangles,
    degree) pair. Scale: adds ONE hash agg (canonical degree) and a |V|-row
    join on top of triangles_per_node's oriented-wedge plan — no new join
    shape beyond what triangle counting already pays.
    """
    tri = triangles_per_node(edges)
    e = canonical_edges(edges)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    # left join: self-loop-only nodes are in `tri` (degree 0) but have no
    # canonical edge at all
    return tri.join(deg, "id", "left").select(
        "id",
        F.coalesce("degree", F.lit(0)).alias("degree"),
        "triangles",
        F.when(F.coalesce("degree", F.lit(0)) < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
                9,
            )
        )
        .alias("coefficient"),
    )
