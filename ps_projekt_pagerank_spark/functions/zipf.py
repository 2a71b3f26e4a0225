"""Zipf-law fit over the corpus token-frequency spectrum — the standard
sanity check on a web-text corpus (natural language follows freq ∝
rank^(-s) with s ≈ 1; template/boilerplate-dominated or synthetic
corpora bend the curve, so the fitted slope is a cheap corpus-health
signal alongside the Gopher stats).

Engine-exact construction (the no-floating-log + exact-moment tricks the
surprisal and assortativity operators use):

    freq(t)  — corpus frequency per token (hash agg)
    rank(t)  — 1-based by (freq DESC, token ASC), numbered with the
               DISTRIBUTED global_positions (never a partitionless window)
    x = floor(log2(rank)) = length(bin(rank)) - 1   (pure int64)
    y = floor(log2(freq))

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)       (OLS on the log-log
    cloud; every moment an exact BIGINT, ONE final IEEE expression)

The integer-log2 quantization is part of the operator contract: both
engines aggregate identical integers, so the moments match bit-for-bit
and only the final division is floating (then rounded 9 dp).

Scale shape: one token explode + hash agg (map-side combine), one
range-partitioned numbering pass, one 5-moment agg. int64 bound: Σxy ≤
n·63² — overflow-safe for any real corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.positions import global_positions
from .text import tokens


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE row (n_types BIGINT, n_tokens BIGINT, slope DOUBLE,
    intercept DOUBLE) — OLS fit of floor-log2 freq against floor-log2
    rank. slope ≈ −1 on healthy natural-language corpora."""
    tok = F.filter(tokens(text_col), lambda t: t != "")
    freq = (
        docs.select(F.explode(tok).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_positions(
        freq, [F.desc("freq"), F.asc("t")], pos_col="rank"
    ).select(
        (F.length(F.bin("rank")) - 1).cast("long").alias("x"),
        (F.length(F.bin("freq")) - 1).cast("long").alias("y"),
        F.col("freq"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("freq").alias("n_tokens"),
    )
    den = m["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den == 0, F.lit(0.0)).otherwise(
        (m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / den.cast("double")
    )
    intercept = (
        F.col("sy").cast("double")
        - slope * F.col("sx").cast("double")
    ) / m["n"].cast("double")
    return m.select(
        F.col("n").alias("n_types"),
        F.col("n_tokens"),
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 9).alias("intercept"),
    )


def zipf_fit_sql(docs_expr: str, text_col: str = "text") -> str:
    """DuckDB twin of zipf_fit — identical integer moments; the oracle's
    row_number is the sequential stand-in for global_positions."""
    tok = f"list_filter(string_split({text_col}, ' '), t -> t <> '')"
    return (
        f"WITH freq AS (SELECT t, count(*) AS freq FROM "
        f"(SELECT unnest({tok}) AS t FROM ({docs_expr})) GROUP BY t), "
        "ranked AS (SELECT CAST(length(bin(row_number() OVER "
        "(ORDER BY freq DESC, t ASC))) - 1 AS BIGINT) AS x, "
        "CAST(length(bin(freq)) - 1 AS BIGINT) AS y, freq FROM freq), "
        "m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * y) AS sxy, sum(x * x) AS sxx, sum(freq) AS n_tokens "
        "FROM ranked) "
        "SELECT n AS n_types, n_tokens, "
        "CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE "
        "round(CAST(n * sxy - sx * sy AS DOUBLE) / "
        "CAST(n * sxx - sx * sx AS DOUBLE), 9) END AS slope, "
        "round((CAST(sy AS DOUBLE) - (CASE WHEN n * sxx - sx * sx = 0 "
        "THEN 0.0 ELSE CAST(n * sxy - sx * sy AS DOUBLE) / "
        "CAST(n * sxx - sx * sx AS DOUBLE) END) * CAST(sx AS DOUBLE)) "
        "/ CAST(n AS DOUBLE), 9) AS intercept FROM m"
    )
