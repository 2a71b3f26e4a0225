"""Search serving: BM25 relevance × PageRank authority — the classic
two-signal web ranking (relevance from the body index, authority from
the link graph; Brin & Page 1998 §4.5 describes exactly this fusion).

Composes two existing engine pieces into ONE Catalyst plan:
``functions.search.doc_bm25_search`` (term-sharded inverted index,
integer-log2 idf) and a rank vector from ``operators.pagerank``. The
BM25 top-k is resolved FIRST (TakeOrderedAndProject over the postings),
so the authority join touches k rows, never the corpus — at serving
scale the rank vector is the big side and k is tiny, which makes the
join a broadcast of the k candidates against the rank table.

Engine-exactness: bm25 is rounded 6 dp by its operator, authority is
the 9-dp-rounded rank, and the fused score multiplies the two rounded
doubles and rounds 12 dp — bit-identical in any IEEE engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def search_with_authority(
    docs: DataFrame,
    ranks: DataFrame,
    query_terms: list[str],
    doc_node: Column,
    k_candidates: int = 20,
    k: int = 10,
) -> DataFrame:
    """(doc_id, bm25, authority, fused) — top-``k`` of the BM25
    ``k_candidates`` re-ranked by relevance × authority.

    ``doc_node`` maps a document id onto its link-graph node id (url
    dictionary at production scale; a modular map in the fixtures).
    Candidates whose node has no rank row keep authority NULL and are
    dropped — a page outside the graph has no authority evidence.
    """
    from ps_projekt_pagerank_spark.functions.search import doc_bm25_search

    cand = doc_bm25_search(docs, query_terms, k=k_candidates).withColumn(
        "_node", doc_node
    )
    auth = ranks.select(
        F.col("id").alias("_node"), F.round("rank", 9).alias("authority")
    )
    fused = (
        cand.join(auth, "_node")
        .select(
            "doc_id",
            "bm25",
            "authority",
            F.round(F.col("bm25") * F.col("authority"), 12).alias("fused"),
        )
    )
    return fused.orderBy(F.desc("fused"), F.asc("doc_id")).limit(int(k))


def search_with_authority_sql(
    bm25_sql: str,
    ranks_sql: str,
    doc_node_expr: str,
    k: int = 10,
) -> str:
    """ANSI twin: compose a doc_bm25_sql chain with a rank-vector chain."""
    return (
        f"WITH b AS ({bm25_sql}), r AS ({ranks_sql}) "
        f"SELECT b.doc_id, b.bm25, round(r.rank, 9) AS authority, "
        "round(b.bm25 * round(r.rank, 9), 12) AS fused "
        f"FROM b JOIN r ON r.id = {doc_node_expr} "
        f"ORDER BY fused DESC, b.doc_id ASC LIMIT {int(k)}"
    )
