"""Text-analysis column functions for training-data pipelines.

All pure `pyspark.sql.functions` compositions (whole-stage codegen'd,
zero Python): token counting, quality scoring, language-ID heuristic,
document fingerprinting. Each has an exactly-equivalent ANSI/DuckDB SQL
form used by the correctness oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny function-word lists for the language-ID heuristic (shared with the
# SQL oracle; deliberately short + lowercase-only so both engines agree)
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]
SL_STOPWORDS = ["in", "je", "na", "se", "za", "da", "ki", "so", "ne", "pri"]
PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    """whitespace tokens (single-space split; empty tokens preserved so the
    SQL oracle's string_split agrees exactly)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column | str) -> Column:
    return F.length(text).cast("long")


def punct_count(text: Column | str) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    ).cast("long")


def stopword_count(text: Column | str, words: list[str]) -> Column:
    tok = tokens(F.lower(text))
    return F.size(F.filter(tok, lambda t: t.isin(*words))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length / punctuation / stopword-ratio quality signals, rounded to a
    cross-engine-stable precision."""
    n_tok = token_count(text_col)
    return df.select(
        "doc_id",
        char_count(text_col).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        punct_count(text_col).alias("n_punct"),
        F.round(
            stopword_count(text_col, EN_STOPWORDS) / n_tok.cast("double"), 6
        ).alias("stopword_ratio"),
        F.round(char_count(text_col) / n_tok.cast("double"), 6).alias(
            "avg_token_len"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: argmax of function-word hits
    between English and Slovene lists (ties → 'en')."""
    en = stopword_count(text_col, EN_STOPWORDS)
    sl = stopword_count(text_col, SL_STOPWORDS)
    return df.select(
        "doc_id",
        en.alias("en_hits"),
        sl.alias("sl_hits"),
        F.when(sl > en, F.lit("sl")).otherwise(F.lit("en")).alias("lang_pred"),
    )


def fingerprint(text: Column | str) -> Column:
    """deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (the rolling-hash analogue, portable across engines)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )
