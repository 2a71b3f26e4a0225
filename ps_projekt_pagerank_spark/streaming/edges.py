"""Streaming edge ingestion — the continuously-crawled-graph path
(north-rule extension; the reference ingests one static edge file,
Graph.cpp:44-57 — a crawl never stops, so the graph tables must be
maintainable from an edge stream).

``stream_edge_degrees`` maintains the running out-degree table (G2) from
an arriving edge stream; ``stream_edge_counts`` maintains the weighted
adjacency increments (the G3 build as a running aggregation). Both are
the same logical queries as their batch twins (operators.graph), run in
update/complete mode over a file source in tests (memory sink +
processAllAvailable; Kafka/Iceberg on a cluster). Batch-vs-stream
equality is the test contract, like streaming/events.

At scale the update-mode sink would be an upsert store (Iceberg MERGE /
state-store-backed); the aggregation state is per-node / per-(src,dst) —
bounded by |V| and |adjacency rows|, with the same hash-partitioned
shuffle shape as the batch build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _edge_stream(spark: SparkSession, parquet_dir: str) -> DataFrame:
    schema = spark.read.parquet(parquet_dir).schema
    return spark.readStream.schema(schema).parquet(parquet_dir)


def stream_edge_degrees(
    spark: SparkSession, parquet_dir: str, query_name: str = "edge_degrees"
) -> DataFrame:
    """Run G2 (out-degree per node) as a streaming aggregation over the
    edge parquet dir; returns the completed memory-sink table
    (id, outdeg)."""
    stream = _edge_stream(spark, parquet_dir)
    agg = stream.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("outdeg")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    out = spark.table(query_name)
    q.stop()
    return out


def stream_edge_counts(
    spark: SparkSession, parquet_dir: str, query_name: str = "edge_counts"
) -> DataFrame:
    """Run the G3 weighted-adjacency collapse ((src,dst) -> w) as a
    streaming aggregation; returns the completed memory-sink table."""
    stream = _edge_stream(spark, parquet_dir)
    agg = stream.groupBy("src", "dst").agg(F.count("*").alias("w"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    out = spark.table(query_name)
    q.stop()
    return out
