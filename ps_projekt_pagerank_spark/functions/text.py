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


def _ngrams(tok: Column, n: int) -> Column:
    """array of space-joined word n-grams (empty when fewer than n
    tokens)."""
    if n == 1:
        return tok
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.array_join(F.slice(tok, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repeated_ngram_stats(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Per-document duplicate-n-gram ratios — the Gopher/MassiveText
    repetition signals (Rae et al. 2021 §A1.1): dup_ratio_{n} =
    1 - distinct/total over the document's word n-grams. High ratios mark
    boilerplate, keyword stuffing, and template spam — the documents an
    LLM-data pipeline drops before dedup even runs.

    Pure built-ins (split/sequence/slice/array_distinct — JVM-side,
    whole-stage codegen); one row pass, no shuffle, no Python.
    """
    tok = F.filter(tokens(text_col), lambda t: t != "")
    cols = [F.col("doc_id"), F.size(tok).cast("long").alias("n_tokens")]
    for n in ns:
        g = _ngrams(tok, n)
        total = F.size(g)
        dup = F.when(
            total > 0,
            F.round(
                (total - F.size(F.array_distinct(g))) / total.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))
        cols += [
            total.cast("long").alias(f"total_{n}gr"),
            dup.alias(f"dup_ratio_{n}gr"),
        ]
    return df.select(*cols)


def repeated_ngram_sql(
    docs_expr: str, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> str:
    """DuckDB twin of ``repeated_ngram_stats`` — same tokenization, same
    n-gram windows, same rounding."""
    tok = f"list_filter(string_split({text_col}, ' '), t -> t <> '')"
    parts = [f"SELECT doc_id, CAST(len({tok}) AS BIGINT) AS n_tokens"]
    for n in ns:
        if n == 1:
            g = tok
        else:
            g = (
                f"(CASE WHEN len({tok}) >= {n} THEN "
                f"list_transform(generate_series(1, len({tok}) - {n - 1}), "
                f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) "
                f"ELSE [] END)"
            )
        parts.append(
            f"CAST(len({g}) AS BIGINT) AS total_{n}gr, "
            f"CASE WHEN len({g}) > 0 THEN "
            f"round((len({g}) - len(list_distinct({g}))) "
            f"/ CAST(len({g}) AS DOUBLE), 6) ELSE 0.0 END "
            f"AS dup_ratio_{n}gr"
        )
    return ", ".join(parts) + f" FROM ({docs_expr})"


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100000,
    max_dup_2gr: float = 0.6,
    max_dup_3gr: float = 0.4,
) -> DataFrame:
    """(doc_id, keep BOOLEAN, n_tokens, dup_ratio_2gr, dup_ratio_3gr) —
    the composed Gopher-style keep/drop rule: length window + repetition
    caps. The thresholds are knobs; the defaults mirror the published
    MassiveText cuts loosely (the synthetic corpus has no real boilerplate
    to calibrate on)."""
    s = repeated_ngram_stats(df, text_col, ns=(2, 3))
    return s.select(
        "doc_id",
        "n_tokens",
        "dup_ratio_2gr",
        "dup_ratio_3gr",
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("dup_ratio_2gr") <= max_dup_2gr)
            & (F.col("dup_ratio_3gr") <= max_dup_3gr)
        ).alias("keep"),
    )


def fingerprint(text: Column | str) -> Column:
    """deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (the rolling-hash analogue, portable across engines)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )
