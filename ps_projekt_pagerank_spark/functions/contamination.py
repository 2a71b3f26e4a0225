"""Benchmark-contamination screening — the n-gram-overlap check every
serious LLM training pipeline runs before a corpus ships (GPT-3 appendix C
13-gram dedup; PaLM/Llama use the same shape): mark training documents
whose word n-grams overlap an evaluation/benchmark set.

Per corpus document:

    shingles(d)       = distinct word n-grams of d (n = 8 default)
    n_contaminated(d) = |shingles(d) ∩ shingles(benchmark)|
    frac(d)           = n_contaminated / n_shingles   (0.0 when no shingles)
    contaminated(d)   = frac ≥ threshold

Scale shape: both sides explode to (doc, shingle) rows — distinct-per-doc
keeps the row count ≤ token count — and meet in ONE equi-join on the
shingle string. The benchmark side is tiny relative to a 100 TB corpus
(eval suites are MBs), so AQE broadcasts it; per-doc hash agg with
map-side combine closes. No windows, no Python, no cartesian anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _ngrams, tokens

DEFAULT_N = 8
DEFAULT_THRESHOLD = 0.5


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles BIGINT, n_contaminated BIGINT, frac DOUBLE,
    contaminated BOOLEAN) — one row per corpus document."""
    tok = F.filter(tokens(text_col), lambda t: t != "")
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(_ngrams(tok, n))).alias("sh")
        )
        .distinct()
        .select("sh", F.lit(True).alias("_hit"))
    )
    doc_sh = corpus.select(
        "doc_id", F.explode(F.array_distinct(_ngrams(tok, n))).alias("sh")
    )
    counts = (
        doc_sh.join(bench_sh, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(False)).cast("long")).alias(
                "n_contaminated"
            ),
        )
    )
    return (
        corpus.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("n_contaminated")
                    / F.col("n_shingles").cast("double"),
                    9,
                )
            )
            .alias("frac"),
        )
        .withColumn(
            "contaminated", F.col("frac") >= F.lit(float(threshold))
        )
    )


def _shingles_sql(docs_expr: str, n: int, text_col: str = "text") -> str:
    """(doc_id, sh) — distinct word n-grams per doc, DuckDB idiom (the
    unnest(range)+list_slice pattern the repeated-ngram twin uses)."""
    tok = f"list_filter(string_split({text_col}, ' '), t -> t <> '')"
    return (
        f"SELECT DISTINCT doc_id, "
        f"array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS sh "
        f"FROM (SELECT doc_id, {tok} AS toks FROM ({docs_expr})), "
        f"LATERAL (SELECT unnest(generate_series(1, len(toks) - {n - 1})) "
        "AS i) WHERE len(toks) >= " + str(n)
    )


def contamination_sql(
    corpus_expr: str,
    benchmark_expr: str,
    n: int = DEFAULT_N,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
) -> str:
    """DuckDB twin of ngram_contamination."""
    return (
        f"WITH bsh AS (SELECT DISTINCT sh FROM "
        f"({_shingles_sql(benchmark_expr, n, text_col)})), "
        f"dsh AS ({_shingles_sql(corpus_expr, n, text_col)}), "
        "cnt AS (SELECT dsh.doc_id, count(*) AS n_shingles, "
        "CAST(sum(CASE WHEN bsh.sh IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_contaminated "
        "FROM dsh LEFT JOIN bsh ON bsh.sh = dsh.sh GROUP BY dsh.doc_id) "
        f"SELECT c.doc_id, coalesce(cnt.n_shingles, 0) AS n_shingles, "
        "coalesce(cnt.n_contaminated, 0) AS n_contaminated, "
        "CASE WHEN coalesce(cnt.n_shingles, 0) = 0 THEN 0.0 "
        "ELSE round(cnt.n_contaminated / CAST(cnt.n_shingles AS DOUBLE), 9) "
        "END AS frac, "
        "(CASE WHEN coalesce(cnt.n_shingles, 0) = 0 THEN 0.0 "
        "ELSE round(cnt.n_contaminated / CAST(cnt.n_shingles AS DOUBLE), 9) "
        f"END) >= {float(threshold)} AS contaminated "
        f"FROM (SELECT doc_id FROM ({corpus_expr})) c "
        "LEFT JOIN cnt ON cnt.doc_id = c.doc_id"
    )
