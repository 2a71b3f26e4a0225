"""BM25 × PageRank fusion serving (plans/serving.py)."""

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.plans.serving import search_with_authority

DOCS = [
    # 'apple' stays at df 2 of 5 docs: idf = floor(log2(5 div 2)) = 1;
    # at df 3+ the integer-log2 idf floors to 0 and zeroes every score
    (1, "apple apple apple banana"),  # strongest bm25 for 'apple'
    (2, "apple banana cherry"),
    (3, "date egg zebra"),  # no term hit — never a candidate
    (4, "fig grape"),  # no term hit, high authority — still absent
    (5, "kiwi lime"),
]
RANKS = [
    (1, 0.01),  # best relevance, weak authority
    (2, 0.50),  # weaker relevance, strong authority -> wins fused
    (4, 0.99),
]


def test_fusion_reranks_and_drops_unranked(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    ranks = spark.createDataFrame(RANKS, "id LONG, rank DOUBLE")
    rows = search_with_authority(
        docs, ranks, ["apple"], doc_node=F.col("doc_id"), k_candidates=10, k=10
    ).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [2, 1]  # authority flips the bm25 order; 3/4/5 absent
    assert rows[0]["fused"] > rows[1]["fused"] > 0
    assert rows[0]["authority"] == 0.5


def test_candidate_without_rank_row_drops(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    # doc 1 is a candidate but has no rank row -> no authority evidence
    ranks = spark.createDataFrame([(2, 0.5)], "id LONG, rank DOUBLE")
    rows = search_with_authority(
        docs, ranks, ["apple"], doc_node=F.col("doc_id"), k_candidates=10, k=10
    ).collect()
    assert [r["doc_id"] for r in rows] == [2]
