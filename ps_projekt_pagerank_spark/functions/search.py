"""Full-document BM25 retrieval — the corpus-side sibling of the
anchor-text index (sources/extraction.py::anchor_bm25, which ranks by
text pointing AT a page; this ranks by the page's own body).

Same engine-exact scoring contract as the anchor ranker: idf is the
integer bin-length chain floor(log2(n_docs/df)) — no floating log — and
the Okapi tf-saturation factor is ONE fixed IEEE expression over exact
BIGINT inputs, so Spark and any ANSI engine produce bit-identical
doubles; per-doc sums round 6 dp (the repo-wide float-agg contract).

Scale: the inverted index is two hash aggs over the token explode
(map-side combinable, shards by term); serving filters postings to the
|query| terms FIRST (IN-list pushed into the scan) and ranks with a
TakeOrderedAndProject top-k — the index is never globally sorted or
materialized per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_postings(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, df_term) — whole-document inverted index:
    whitespace tokens, lowercased, with per-doc term frequency and the
    term's document frequency."""
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df_term"))
    return tf.join(df_, "term").select("term", "doc_id", "tf", "df_term")


def doc_bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, bm25, n_terms_hit) — Okapi BM25 top-k over the document
    bodies; ties break by doc_id asc. Terms in more than half the corpus
    get idf 0 (the same built-in stopword suppression as tfidf)."""
    if not query_terms:
        raise ValueError("doc_bm25_search needs >= 1 query term")
    qt = sorted({t.lower() for t in query_terms})
    postings = doc_postings(docs)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = postings.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("total_terms"),
    )
    hits = (
        postings.where(F.col("term").isin(qt))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = (F.length(F.bin(F.expr("n_docs div df_term"))) - 1).cast("double")
    avgdl = F.col("total_terms") / F.col("n_docs")
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    scored = hits.groupBy("doc_id").agg(
        F.round(F.sum(idf * sat), 6).alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(int(k))


def doc_bm25_sql(
    docs_sql: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """ANSI twin of doc_bm25_search over the same docs relation."""
    # terms are interpolated into SQL literals — double embedded quotes
    # so a term like "it's" can't break (or inject into) the oracle SQL
    qt = ", ".join(
        "'" + t.replace("'", "''") + "'"
        for t in sorted({t.lower() for t in query_terms})
    )
    return (
        f"WITH d AS ({docs_sql}), "
        "t0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) "
        "AS term FROM d), "
        "t1 AS (SELECT doc_id, term FROM t0 WHERE term <> ''), "
        "tf AS (SELECT term, doc_id, count(*) AS tf FROM t1 "
        "GROUP BY term, doc_id), "
        "dfq AS (SELECT term, count(*) AS df_term FROM tf GROUP BY term), "
        "dlt AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf "
        "GROUP BY doc_id), "
        "st AS (SELECT count(DISTINCT doc_id) AS n_docs, "
        "CAST(sum(tf) AS BIGINT) AS total_terms FROM tf), "
        "hits AS (SELECT t.doc_id, t.tf, q.df_term, l.dl, s.n_docs, "
        "s.total_terms FROM tf t JOIN dfq q ON q.term = t.term "
        "JOIN dlt l ON l.doc_id = t.doc_id CROSS JOIN st s "
        f"WHERE t.term IN ({qt})), "
        "sc AS (SELECT doc_id, round(sum("
        "CAST(length(bin(n_docs // df_term)) - 1 AS DOUBLE) * "
        f"((tf * CAST({k1 + 1.0!r} AS DOUBLE)) / "
        f"(tf + CAST({k1!r} AS DOUBLE) * (CAST(1.0 AS DOUBLE) - "
        f"CAST({b!r} AS DOUBLE) + CAST({b!r} AS DOUBLE) * "
        "(dl / (total_terms / n_docs)))))), 6) AS bm25, "
        "count(*) AS n_terms_hit FROM hits GROUP BY doc_id) "
        "SELECT doc_id, bm25, n_terms_hit FROM sc "
        f"ORDER BY bm25 DESC, doc_id ASC LIMIT {int(k)}"
    )
