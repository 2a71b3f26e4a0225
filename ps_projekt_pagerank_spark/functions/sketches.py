"""Column-cardinality estimation with engine-portable Flajolet-Martin
sketches (north-rule extension) — the "how big is this vocabulary /
url-space / host-set" one-pass estimate a 100 TB pipeline runs before
sizing dictionaries and shuffle partitions.

Spark's built-in ``approx_count_distinct`` is HLL++ and NOT reproducible
outside Spark; this estimator reuses the md5-seeded FM machinery from
``operators/anf.py`` so DuckDB (and the pytest oracle) replay the exact
integer sketch trajectory, and reads the final estimate from the same
literal table both engines index (computing 2^(p/R) natively differs by
1 ulp across libm implementations).

Scale: one map-side-combinable ``bit_or`` aggregation over the column —
no shuffle beyond the single-row combine, state = R longs total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.anf import (
    PHI,
    _lowest_zero_pos,
    _seed_bit,
)


def fm_est_table(num_sketches: int, nibbles: int) -> list[float]:
    """FM estimate per integer bit-position sum: TABLE[p] =
    round(2^(p / R) / PHI, 6) — shared literal doubles (see module doc)."""
    cap = num_sketches * (nibbles * 4 + 1)
    return [round(2.0 ** (p / num_sketches) / PHI, 6) for p in range(cap + 1)]


def fm_count_distinct(
    df: DataFrame,
    col: str | Column,
    num_sketches: int = 8,
    nibbles: int = 10,
) -> DataFrame:
    """One row (sum_positions BIGINT, est_distinct DOUBLE) — the FM
    cardinality estimate of ``col`` (NULLs ignored, as COUNT(DISTINCT)
    does). ``sum_positions`` is the integer invariant any engine
    reproduces bit-for-bit; ``est_distinct`` = TABLE[sum_positions].

    Empty (or all-NULL) input is special-cased to est_distinct = 0.0:
    sum_positions = 0 alone cannot distinguish "no rows" from "rows whose
    sketches all miss bit 0", so the emptiness flag is s0 IS NULL (bit_or
    over zero rows), checked identically in both engines (ADVICE r3)."""
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.alias("v")).where(F.col("v").isNotNull())
    sketches = vals.agg(
        *[
            F.bit_or(_seed_bit(F.col("v"), r, nibbles)).alias(f"s{r}")
            for r in range(num_sketches)
        ]
    )
    pos_sum = None
    for r in range(num_sketches):
        p = _lowest_zero_pos(F.coalesce(F.col(f"s{r}"), F.lit(0)))
        pos_sum = p if pos_sum is None else pos_sum + p
    table = fm_est_table(num_sketches, nibbles)
    est = F.when(F.col("s0").isNull(), F.lit(0.0)).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in table]), pos_sum.cast("int") + 1
        )
    )
    return sketches.select(
        pos_sum.cast("long").alias("sum_positions"),
        est.alias("est_distinct"),
    )


def fm_count_distinct_sql(
    values_sql: str, num_sketches: int = 8, nibbles: int = 10
) -> str:
    """DuckDB twin — identical md5 seed bits, bit_or, lowest-zero-bit
    positions, and literal estimate table. ``values_sql`` must yield one
    column ``v``."""
    seed_terms = []
    for r in range(num_sketches):
        x = (
            f"CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#{r}'), 1, "
            f"{nibbles}) AS BIGINT)"
        )
        tz = (
            f"(CASE WHEN {x} = 0 THEN {nibbles * 4} "
            f"ELSE bit_count((({x}) & (-({x}))) - 1) END)"
        )
        seed_terms.append(f"bit_or(CAST(1 AS BIGINT) << {tz}) AS s{r}")
    pos = " + ".join(
        f"bit_count((((~coalesce(s{r}, 0)) & (coalesce(s{r}, 0) + 1)) - 1))"
        for r in range(num_sketches)
    )
    table = fm_est_table(num_sketches, nibbles)
    lits = ", ".join(repr(x) for x in table)
    return (
        f"WITH vals AS (SELECT v FROM ({values_sql}) WHERE v IS NOT NULL), "
        f"sk AS (SELECT {', '.join(seed_terms)} FROM vals), "
        f"ps AS (SELECT CAST({pos} AS BIGINT) AS sum_positions, "
        "(s0 IS NULL) AS _empty FROM sk) "
        "SELECT sum_positions, CASE WHEN _empty THEN CAST(0.0 AS DOUBLE) "
        f"ELSE CAST(([{lits}])[CAST(sum_positions AS INT) "
        "+ 1] AS DOUBLE) END AS est_distinct FROM ps"
    )


def fm_count_distinct_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    num_sketches: int = 8,
    nibbles: int = 10,
) -> DataFrame:
    """(key, sum_positions BIGINT, est_distinct DOUBLE) — per-group FM
    cardinality: distinct urls per host, vocabulary per language, unique
    users per session — the GROUP BY form of ``fm_count_distinct`` (one
    map-side-combinable bit_or agg; group state = R longs, so a billion
    groups cost |groups|·R·8 bytes, not |values| memory)."""
    vals = df.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull())
    sketches = vals.groupBy("key").agg(
        *[
            F.bit_or(_seed_bit(F.col("v"), r, nibbles)).alias(f"s{r}")
            for r in range(num_sketches)
        ]
    )
    pos_sum = None
    for r in range(num_sketches):
        p = _lowest_zero_pos(F.coalesce(F.col(f"s{r}"), F.lit(0)))
        pos_sum = p if pos_sum is None else pos_sum + p
    table = fm_est_table(num_sketches, nibbles)
    est = F.element_at(
        F.array(*[F.lit(x) for x in table]), pos_sum.cast("int") + 1
    )
    return sketches.select(
        "key",
        pos_sum.cast("long").alias("sum_positions"),
        est.alias("est_distinct"),
    )


def fm_count_distinct_by_key_sql(
    pairs_sql: str, num_sketches: int = 8, nibbles: int = 10
) -> str:
    """DuckDB twin — ``pairs_sql`` must yield columns (key, v)."""
    seed_terms = []
    for r in range(num_sketches):
        x = (
            f"CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#{r}'), 1, "
            f"{nibbles}) AS BIGINT)"
        )
        tz = (
            f"(CASE WHEN {x} = 0 THEN {nibbles * 4} "
            f"ELSE bit_count((({x}) & (-({x}))) - 1) END)"
        )
        seed_terms.append(f"bit_or(CAST(1 AS BIGINT) << {tz}) AS s{r}")
    pos = " + ".join(
        f"bit_count((((~coalesce(s{r}, 0)) & (coalesce(s{r}, 0) + 1)) - 1))"
        for r in range(num_sketches)
    )
    table = fm_est_table(num_sketches, nibbles)
    lits = ", ".join(repr(x) for x in table)
    return (
        f"WITH vals AS (SELECT key, v FROM ({pairs_sql}) "
        "WHERE v IS NOT NULL), "
        f"sk AS (SELECT key, {', '.join(seed_terms)} FROM vals "
        "GROUP BY key), "
        f"ps AS (SELECT key, CAST({pos} AS BIGINT) AS sum_positions "
        "FROM sk) "
        f"SELECT key, sum_positions, CAST(([{lits}])"
        "[CAST(sum_positions AS INT) + 1] AS DOUBLE) AS est_distinct "
        "FROM ps"
    )
