"""Readability scoring — Flesch reading-ease / Flesch-Kincaid grade as a
document-quality signal for corpus filtering (alongside the Gopher-style
quality_features): training-mix designers bucket documents by reading
level, and boilerplate/gibberish lands at the extremes.

The classical formulas need words, sentences, and syllables. Exact
syllabification needs a dictionary; the standard corpus-scale proxy is
vowel-group counting (a maximal run of [aeiouy] ≈ one syllable), which
is a pure regexp count — deterministic, JVM-side, and identical in RE2
and Java regex. Sentences are terminal-punctuation runs ([.!?]+),
clamped to ≥1 so punctuation-free docs don't divide by zero (they read
as one long sentence, which is exactly the quality signal wanted).

All three counts are integers; the scores are a handful of IEEE double
ops on them, so both engines agree to the 1e-6 rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VOWEL_RUNS = "[aeiouy]+"
_SENT_RUNS = "[.!?]+"


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch, fk_grade) —
    Flesch reading ease 206.835 − 1.015·(W/S) − 84.6·(Y/W) and
    Flesch-Kincaid grade 0.39·(W/S) + 11.8·(Y/W) − 15.59, with the
    vowel-group syllable proxy. Zero-word docs get NULL scores."""
    t = F.col(text_col)
    words = F.size(F.filter(F.split(t, " "), lambda w: w != "")).cast("long")
    sents = F.greatest(
        F.regexp_count(t, F.lit(_SENT_RUNS)), F.lit(1)
    ).cast("long")
    sylls = F.regexp_count(F.lower(t), F.lit(_VOWEL_RUNS)).cast("long")
    out = docs.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    score = F.when(
        F.col("n_words") > 0,
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6),
    )
    grade = F.when(
        F.col("n_words") > 0,
        F.round(0.39 * wps + 11.8 * spw - 15.59, 6),
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        score.alias("flesch"),
        grade.alias("fk_grade"),
    )


def readability_sql(docs_sql: str) -> str:
    """DuckDB twin — len(regexp_extract_all) for the counts, identical
    clamps and IEEE expressions."""
    return (
        "WITH base AS (SELECT doc_id, "
        "CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) "
        "AS BIGINT) AS n_words, "
        "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) "
        "AS BIGINT) AS n_sentences, "
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) "
        "AS BIGINT) AS n_syllables "
        f"FROM ({docs_sql})) "
        "SELECT doc_id, n_words, n_sentences, n_syllables, "
        "CASE WHEN n_words > 0 THEN round(206.835 "
        "- 1.015 * (n_words / CAST(n_sentences AS DOUBLE)) "
        "- 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 6) END "
        "AS flesch, "
        "CASE WHEN n_words > 0 THEN round(0.39 "
        "* (n_words / CAST(n_sentences AS DOUBLE)) "
        "+ 11.8 * (n_syllables / CAST(n_words AS DOUBLE)) - 15.59, 6) END "
        "AS fk_grade FROM base"
    )
