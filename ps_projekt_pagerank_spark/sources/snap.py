"""S1 — SNAP edge-list scan (reference reader: src/Graph.cpp:32-101).

Semantics preserved (SURVEY.md §1.1):
- ``#``-prefixed comment lines skipped; the ``# Nodes:`` header is only a
  capacity hint (stale in fixtures) and is NOT trusted for anything;
- whitespace-separated ``src dst`` pairs, one edge per line;
- duplicate edges kept, self-loops legal (multigraph);
- node set = ids appearing in edges.

Spark-first: a declarative text scan + split/cast — Catalyst prunes and
pushes down; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src LONG, dst LONG"


def read_snap_edges(spark: SparkSession, path: str) -> DataFrame:
    """Edge DataFrame (src LONG, dst LONG) from a SNAP text file."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(~F.col("value").startswith("#") & (F.trim("value") != ""))
        .select(
            toks.getItem(0).cast("long").alias("src"),
            toks.getItem(1).cast("long").alias("dst"),
        )
    )


def edges_from_pairs(
    spark: SparkSession, pairs: list[tuple[int, int]], partitions: int | None = None
) -> DataFrame:
    """Edge DataFrame from an in-memory fixture edge list (tests/bench)."""
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], schema=EDGE_SCHEMA
    )
    if partitions:
        df = df.repartition(partitions)
    return df
