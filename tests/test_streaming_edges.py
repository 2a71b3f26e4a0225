"""Streaming edge ingestion: the stream-maintained degree/adjacency
tables must equal their batch twins over the same edges (written as
multiple parquet chunks, so the stream processes several micro-batches)."""

from ps_projekt_pagerank_spark.fixtures import FIXTURE_GRAPHS, tripled_k
from ps_projekt_pagerank_spark.operators.graph import out_degrees
from ps_projekt_pagerank_spark.streaming.edges import (
    stream_edge_counts,
    stream_edge_degrees,
)
from tests.test_pagerank_spark import edges_from_pairs


def _write_chunks(spark, tmp_path):
    pairs = tripled_k(FIXTURE_GRAPHS["small"], 2)
    d = str(tmp_path / "edges")
    third = len(pairs) // 3
    for i, chunk in enumerate(
        (pairs[:third], pairs[third: 2 * third], pairs[2 * third:])
    ):
        edges_from_pairs(spark, chunk).write.mode("append").parquet(d)
    return pairs, d


def test_stream_degrees_match_batch(spark, tmp_path):
    pairs, d = _write_chunks(spark, tmp_path)
    batch = {
        r["id"]: r["outdeg"]
        for r in out_degrees(edges_from_pairs(spark, pairs)).collect()
    }
    streamed = {
        r["id"]: r["outdeg"]
        for r in stream_edge_degrees(spark, d, "t_deg").collect()
    }
    assert streamed == batch


def test_stream_adjacency_counts_match_batch(spark, tmp_path):
    pairs, d = _write_chunks(spark, tmp_path)
    batch = {}
    for s, t in pairs:
        batch[(s, t)] = batch.get((s, t), 0) + 1
    streamed = {
        (r["src"], r["dst"]): r["w"]
        for r in stream_edge_counts(spark, d, "t_adj").collect()
    }
    assert streamed == batch
