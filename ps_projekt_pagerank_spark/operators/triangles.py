"""Triangle counting over the canonicalized simple graph (north-rule
extension; contract = oracle.graph_algos.triangle_count).

Standard distributed algorithm: canonicalize (src<dst), dedup, then a
wedge self-join closed by a semi-check join — all DataFrame equi-joins, so
Catalyst picks broadcast/SMJ and AQE splits skewed build sides. Each
triangle a<b<c is found exactly once as wedge (a-b, b-c) closed by edge
(a-c).

Degree-ordering note for web scale: wedges are enumerated from the
canonical orientation only (low id → high id), which bounds per-node wedge
fan-out by the out-orientation degree; the classic further refinement
(orient by degree instead of id to cap hub fan-out) drops in here by
replacing the id comparison with a (degree, id) lexicographic one.
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


def triangles_total(edges: DataFrame) -> DataFrame:
    """1-row DataFrame: (triangles LONG)."""
    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = e.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    wedges = w1.join(w2, F.col("y") == F.col("y2")).select("x", "y", "z")
    closed = wedges.join(
        e, (F.col("x") == F.col("a")) & (F.col("z") == F.col("b")), "left_semi"
    )
    out = closed.agg(F.count("*").alias("triangles"))
    return out


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(id LONG, triangles LONG) — triangles through each node; nodes in no
    triangle get 0."""
    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = e.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    tri = (
        w1.join(w2, F.col("y") == F.col("y2"))
        .select("x", "y", "z")
        .join(
            e,
            (F.col("x") == F.col("a")) & (F.col("z") == F.col("b")),
            "left_semi",
        )
    )
    counts = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return nodes.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
