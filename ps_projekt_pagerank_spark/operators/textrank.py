"""TextRank keyword extraction — per-document PageRank over the
adjacent-token co-occurrence graph (Mihalcea & Tarau, EMNLP 2004), the
unsupervised keyword stage of a corpus pipeline. This composes the
repo's two halves: the PageRank gather-scatter (operators/pagerank.py)
re-keyed per document, and the text tokenization (functions/text.py).

Graph: distinct UNDIRECTED pairs of adjacent tokens (window 1,
self-pairs from repeated tokens dropped) — the paper's co-occurrence
window with w=2, unweighted. Undirected means every node has in-edges,
so there is no sink-mass path here; single-token and empty documents
have no edges and emit no keywords.

Engine determinism: ranks are BIGINT nano-units with floor division
(the betweenness/simrank idiom) — r_{k+1}(w) = ((1−d)·10⁹) div n_doc +
(d_num · Σ_{u~w} r_k(u) div deg(u)) div d_den — every intermediate is
exact int64 (terms ≤ 10⁹, per-doc degrees bound the sum), so the twin
is hash-exact with no rounding anywhere. Quantization error vs real
arithmetic is < 1e-9 per term — irrelevant to a top-k ranking.

Scale: everything is keyed by (doc_id, word) — token explode, hash agg
for degrees, one equi-join + hash agg per iteration. Documents never
interact, so the shuffle key is as fine as the data; the only window is
the final top-k, partitioned by doc_id. Fixed iteration count (the
paper converges in ~20; 4 suffices for top-3 stability on short docs)
keeps the unrolled SQL twin bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.text import tokens

NANO = 1_000_000_000


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    iterations: int = 4,
    top_k: int = 3,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """(doc_id, keyword, rank_nano BIGINT, kw_rank) — the ``top_k``
    TextRank keywords per document after ``iterations`` exact nano-int
    PageRank sweeps (damping d_num/d_den, default the canonical 0.85);
    ties break lexicographically."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0 < d_num < d_den):
        raise ValueError(f"need 0 < d_num < d_den, got {d_num}/{d_den}")
    # tokenize in its own projection — inlined into the element_at
    # lambda the split would re-run per adjacent pair (the winnowing
    # O(n^2) lesson, operators/winnow.py)
    toked = docs.select(
        "doc_id", tokens(F.col(text_col)).alias("_tok")
    )
    t = F.col("_tok")
    adj = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(t) > 1,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.struct(
                        F.element_at(t, i + 1).alias("a"),
                        F.element_at(t, i + 2).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b").where(F.col("a") != F.col("b"))
    und = adj.select(
        "doc_id", F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    edges = und.select(
        "doc_id", F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(und.select("doc_id", F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = edges.groupBy("doc_id", F.col("src").alias("w")).agg(
        F.count("*").alias("d")
    )
    nd = deg.groupBy("doc_id").agg(F.count("*").alias("n"))
    state = deg.join(nd, "doc_id").select(
        "doc_id", "w", "d", "n", F.expr(f"{NANO} div n").alias("r")
    )
    state = state.localCheckpoint(eager=True)
    teleport = (d_den - d_num) * NANO // d_den  # (1-d)·10⁹, exact: d rational
    for _ in range(iterations):
        gathered = (
            state.select("doc_id", F.col("w").alias("src"), F.expr("r div d").alias("c"))
            .join(edges, ["doc_id", "src"])
            .groupBy("doc_id", F.col("dst").alias("w"))
            .agg(F.sum("c").alias("s"))
        )
        state = (
            state.drop("r")
            .join(gathered, ["doc_id", "w"], "left")
            .select(
                "doc_id",
                "w",
                "d",
                "n",
                (
                    F.expr(f"{teleport} div n")
                    + F.expr(f"({d_num} * coalesce(s, 0)) div {d_den}")
                ).alias("r"),
            )
        )
    win = Window.partitionBy("doc_id").orderBy(F.desc("r"), "w")
    return (
        state.withColumn("kw_rank", F.row_number().over(win))
        .where(F.col("kw_rank") <= top_k)
        .select(
            "doc_id",
            F.col("w").alias("keyword"),
            F.col("r").alias("rank_nano"),
            F.col("kw_rank").cast("long").alias("kw_rank"),
        )
    )


def textrank_keywords_sql(
    docs_sql: str,
    iterations: int = 4,
    top_k: int = 3,
    d_num: int = 85,
    d_den: int = 100,
) -> str:
    """DuckDB twin — identical adjacency construction and unrolled
    nano-int sweeps (MATERIALIZED: each round reads the previous one
    twice)."""
    teleport = (d_den - d_num) * NANO // d_den
    ctes = [
        f"t0 AS (SELECT doc_id, string_split(text, ' ') AS t "
        f"FROM ({docs_sql}))",
        "ad AS (SELECT doc_id, t[i + 1] AS a, t[i + 2] AS b FROM ("
        "SELECT doc_id, t, unnest(range(0, greatest(len(t) - 1, 0))) AS i "
        "FROM t0)) ",
        "ep AS (SELECT DISTINCT doc_id, least(a, b) AS u, "
        "greatest(a, b) AS v FROM ad WHERE a <> b)",
        "ed AS MATERIALIZED (SELECT doc_id, u AS src, v AS dst FROM ep "
        "UNION ALL SELECT doc_id, v AS src, u AS dst FROM ep)",
        "dg AS MATERIALIZED (SELECT doc_id, src AS w, count(*) AS d "
        "FROM ed GROUP BY 1, 2)",
        "nd AS (SELECT doc_id, count(*) AS n FROM dg GROUP BY 1)",
        f"r0 AS MATERIALIZED (SELECT dg.doc_id, w, d, n, "
        f"{NANO} // n AS r FROM dg JOIN nd USING (doc_id))",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT p.doc_id, p.w, p.d, p.n, "
            f"({teleport} // p.n) + ({d_num} * coalesce(g.s, 0)) "
            f"// {d_den} AS r "
            f"FROM r{k - 1} p LEFT JOIN ("
            f"SELECT e.doc_id, e.dst AS w, sum(r.r // r.d) AS s "
            f"FROM ed e JOIN r{k - 1} r ON r.doc_id = e.doc_id "
            "AND r.w = e.src GROUP BY 1, 2) g "
            "ON g.doc_id = p.doc_id AND g.w = p.w)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f", ranked AS (SELECT doc_id, w AS keyword, CAST(r AS BIGINT) AS "
        "rank_nano, row_number() OVER (PARTITION BY doc_id "
        f"ORDER BY r DESC, w) AS kw_rank FROM r{iterations}) "
        f"SELECT doc_id, keyword, rank_nano, CAST(kw_rank AS BIGINT) AS "
        f"kw_rank FROM ranked WHERE kw_rank <= {top_k}"
    )
