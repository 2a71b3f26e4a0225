"""Composed training-mix pipeline (north-rule extension) — the last mile
of an LLM data pipeline, composing three already-gated operators into ONE
Catalyst plan: benchmark-contamination screening → sqrt-temperature
language rebalancing → deterministic md5-Bernoulli sampling, reported as
a per-language mix summary.

    clean      = corpus − {docs with benchmark 8-gram overlap ≥ τ}
    weight(g)  = sqrt(n_clean_g) / Σ sqrt(n_clean_h)
    target(g)  = weight(g) · budget
    keep_p(g)  = min(1, target(g) / n_clean_g)
    sampled    = clean docs whose md5-uniform draw < keep_p(lang)

Scale shape: contamination is one shingle equi-join (benchmark side is
tiny → broadcast), the mix table is a |langs|-row agg, and the sampler is
a pure per-row filter after a broadcast join on lang — the whole plan has
exactly one corpus-wide shuffle (the per-doc shingle agg). Deterministic
end-to-end: re-runs, backfills, and the DuckDB twin reproduce the same
sample bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.contamination import (
    DEFAULT_THRESHOLD,
    ngram_contamination,
)
from ps_projekt_pagerank_spark.operators.sampling import (
    mixture_weights,
    weighted_bernoulli_sample,
)


def training_mix(
    corpus: DataFrame,
    benchmark: DataFrame,
    budget: int = 120,
    n: int = 8,
    threshold: float = DEFAULT_THRESHOLD,
    salt: str = "trainmix",
) -> DataFrame:
    """(lang, n_clean BIGINT, weight DOUBLE, target_docs DOUBLE,
    n_sampled BIGINT) — per-language mix summary of the sampled corpus.

    ``corpus`` needs (doc_id, text, lang); ``benchmark`` needs text.
    """
    cont = ngram_contamination(
        corpus, benchmark, n=n, threshold=threshold
    )
    clean = corpus.join(
        cont.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    mix = mixture_weights(clean, group_col="lang", budget=budget)
    rates = mix.select(
        "lang",
        "n_docs",
        "weight",
        "target_docs",
        F.least(
            F.lit(1.0), F.col("target_docs") / F.col("n_docs").cast("double")
        ).alias("keep_p"),
    )
    sampled = weighted_bernoulli_sample(
        clean.join(F.broadcast(rates.select("lang", "keep_p")), "lang"),
        "keep_p",
        key_cols=["doc_id"],
        salt=salt,
    )
    n_sampled = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return (
        rates.join(n_sampled, "lang", "left")
        .select(
            "lang",
            F.col("n_docs").alias("n_clean"),
            "weight",
            "target_docs",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )


def training_mix_sql(
    corpus_expr: str,
    benchmark_expr: str,
    budget: int = 120,
    n: int = 8,
    threshold: float = DEFAULT_THRESHOLD,
    salt: str = "trainmix",
) -> str:
    """DuckDB twin of training_mix — composes the stage twins (shingle
    overlap, sqrt mixture, md5-uniform draw) with identical arithmetic."""
    from ps_projekt_pagerank_spark.functions.contamination import (
        _shingles_sql,
    )

    u = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || "
        f"'{salt}'), 1, 8) AS BIGINT) / 4294967296.0"
    )
    return (
        f"WITH corpus AS ({corpus_expr}), "
        f"bsh AS (SELECT DISTINCT sh FROM "
        f"({_shingles_sql(benchmark_expr, n)})), "
        f"dsh AS ({_shingles_sql('SELECT * FROM corpus', n)}), "
        "cnt AS (SELECT dsh.doc_id, count(*) AS n_shingles, "
        "CAST(sum(CASE WHEN bsh.sh IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_contaminated "
        "FROM dsh LEFT JOIN bsh ON bsh.sh = dsh.sh GROUP BY dsh.doc_id), "
        "clean AS (SELECT c.* FROM corpus c LEFT JOIN cnt "
        "ON cnt.doc_id = c.doc_id "
        "WHERE (CASE WHEN coalesce(cnt.n_shingles, 0) = 0 THEN 0.0 "
        "ELSE round(cnt.n_contaminated / CAST(cnt.n_shingles AS DOUBLE), 9) "
        f"END) < {float(threshold)}), "
        "counts AS (SELECT lang, count(*) AS n_docs FROM clean "
        "GROUP BY lang), "
        "tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z "
        "FROM counts), "
        "rates AS (SELECT lang, n_docs, "
        "round(sqrt(CAST(n_docs AS DOUBLE)) / tot.z, 9) AS weight, "
        f"round({float(budget)} * sqrt(CAST(n_docs AS DOUBLE)) / tot.z, 6) "
        "AS target_docs, "
        f"least(1.0, round({float(budget)} * sqrt(CAST(n_docs AS DOUBLE)) "
        "/ tot.z, 6) / CAST(n_docs AS DOUBLE)) AS keep_p "
        "FROM counts, tot), "
        "sampled AS (SELECT clean.lang, count(*) AS n_sampled FROM clean "
        "JOIN rates ON rates.lang = clean.lang "
        f"WHERE {u} < rates.keep_p GROUP BY clean.lang) "
        "SELECT rates.lang, rates.n_docs AS n_clean, rates.weight, "
        "rates.target_docs, coalesce(sampled.n_sampled, 0) AS n_sampled "
        "FROM rates LEFT JOIN sampled ON sampled.lang = rates.lang"
    )
