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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet/Fusy/Gandouet/Meunier 2007) — the register-based
# refinement of FM the big engines actually ship (Spark's own
# approx_count_distinct is HLL++, but its sketch is not reproducible
# outside Spark). This one is engine-portable by the same discipline as
# the FM sketch above: every cross-engine quantity is an exact INTEGER
# (md5-derived 60-bit hash, max-rho registers, and the register sum
# Σ 2^(Rmax−M_j) scaled so it stays integral), and every transcendental
# (α·m², m·ln(m/V)) is a Python-side literal, so the only floating-point
# op either engine performs is ONE correctly-rounded IEEE division.
#
# Parameters are fixed small: b=6 → m=64 registers (σ ≈ 1.04/√64 ≈ 13%),
# hash = first 15 md5 nibbles (60 bits: 6 bucket + 54 pattern, Rmax=55).
# The standard small-range correction (est ≤ 2.5m with empty registers →
# linear counting) is applied from a 65-entry literal table indexed by
# the zero-register count; the 2^32 large-range correction is moot at a
# 60-bit hash. Scale: groupBy(bucket)+max is map-side combinable; grouped
# state = 64 small ints per key.
# ---------------------------------------------------------------------------

HLL_B = 6
HLL_M = 1 << HLL_B
HLL_NIBBLES = 15
HLL_W = HLL_NIBBLES * 4 - HLL_B  # pattern bits
HLL_RMAX = HLL_W + 1
# α_64 · m² · 2^Rmax as ONE literal so both engines do a single division
HLL_SCALE = 0.709 * float(HLL_M) * float(HLL_M) * 2.0 ** HLL_RMAX
HLL_LC_THRESHOLD = 2.5 * HLL_M


def hll_lc_table() -> list[float]:
    """Linear-counting estimates indexed by zero-register count V:
    TABLE[V] = round(m·ln(m/V), 6); V=0 slot unused (raw estimate used
    then); V=m → 0.0 (empty input)."""
    import math

    return [0.0] + [
        round(HLL_M * math.log(HLL_M / v), 6) for v in range(1, HLL_M + 1)
    ]


def _hll_rho(v: Column) -> tuple[Column, Column]:
    """(bucket, rho) of one value: md5-derived 60-bit hash split into a
    6-bit register index and the leading-zero rank of the remaining 54
    pattern bits (rho = 55 when the pattern is all zeros)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(v.cast("string"), F.lit("#hll"))), 1, HLL_NIBBLES
        ),
        16,
        10,
    ).cast("long")
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.call_function("shiftright", h, F.lit(HLL_B))
    rho = F.when(w == 0, F.lit(HLL_RMAX)).otherwise(
        F.lit(HLL_RMAX) - F.length(F.bin(w))
    )
    return bucket, rho


def _hll_estimate(s_col: Column, v_col: Column) -> Column:
    """est_distinct from the exact register sum S = Σ 2^(Rmax−M_j) and the
    zero-register count V — raw = SCALE/S unless the small-range rule
    fires (raw ≤ 2.5m and V > 0 → literal linear-counting table)."""
    raw = F.lit(HLL_SCALE) / s_col.cast("double")
    lc = F.element_at(
        F.array(*[F.lit(x) for x in hll_lc_table()]), v_col.cast("int") + 1
    )
    return F.when(
        (raw <= F.lit(HLL_LC_THRESHOLD)) & (v_col > 0), lc
    ).otherwise(raw)


def hll_count_distinct(df: DataFrame, col: str | Column) -> DataFrame:
    """One row (n_zero_registers BIGINT, register_sum BIGINT,
    est_distinct DOUBLE) — the HLL cardinality estimate of ``col``
    (NULLs ignored). ``register_sum`` = Σ_j 2^(Rmax−M_j) over all m
    registers (empty register ⇒ 2^Rmax) is the exact integer invariant;
    empty input lands in the V=m linear-counting slot → 0.0."""
    c = F.col(col) if isinstance(col, str) else col
    bucket, rho = _hll_rho(F.col("_v"))
    vals = (
        df.select(c.alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
    )
    regs = vals.groupBy("bucket").agg(F.max("rho").alias("m"))
    agg = regs.agg(
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.lit(HLL_RMAX) - F.col("m")
            )
        ).alias("_sp"),
        F.count("*").alias("_np"),
    )
    s = F.coalesce(F.col("_sp"), F.lit(0)) + (
        F.lit(HLL_M) - F.col("_np")
    ) * F.lit(1 << HLL_RMAX)
    v = F.lit(HLL_M) - F.col("_np")
    return agg.select(
        v.cast("long").alias("n_zero_registers"),
        s.cast("long").alias("register_sum"),
        _hll_estimate(s, v).alias("est_distinct"),
    )


def hll_count_distinct_by_key(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """(key, n_zero_registers BIGINT, register_sum BIGINT, est_distinct
    DOUBLE) — per-group HLL: the GROUP BY form of
    :func:`hll_count_distinct` (two map-side-combinable aggs; per-group
    state = m max-registers)."""
    bucket, rho = _hll_rho(F.col("_v"))
    vals = (
        df.select(F.col(key_col).alias("key"), F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .select("key", bucket.alias("bucket"), rho.alias("rho"))
    )
    regs = vals.groupBy("key", "bucket").agg(F.max("rho").alias("m"))
    agg = regs.groupBy("key").agg(
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.lit(HLL_RMAX) - F.col("m")
            )
        ).alias("_sp"),
        F.count("*").alias("_np"),
    )
    s = F.col("_sp") + (F.lit(HLL_M) - F.col("_np")) * F.lit(1 << HLL_RMAX)
    v = F.lit(HLL_M) - F.col("_np")
    return agg.select(
        "key",
        v.cast("long").alias("n_zero_registers"),
        s.cast("long").alias("register_sum"),
        _hll_estimate(s, v).alias("est_distinct"),
    )


def _hll_sql_core(grouped: bool) -> tuple[str, str, str]:
    """Shared twin fragments: (rho expr over column v, register CTEs tail,
    final select list) — key-aware when ``grouped``."""
    x = (
        f"CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#hll'), 1, "
        f"{HLL_NIBBLES}) AS BIGINT)"
    )
    w = f"({x} >> {HLL_B})"
    rho = (
        f"(CASE WHEN {w} = 0 THEN {HLL_RMAX} "
        f"ELSE {HLL_RMAX} - length(bin({w})) END)"
    )
    bucket = f"({x} & {HLL_M - 1})"
    return x, bucket, rho


def _hll_est_sql(s: str, v: str) -> str:
    lits = ", ".join(repr(x) for x in hll_lc_table())
    raw = f"({HLL_SCALE!r} / CAST({s} AS DOUBLE))"
    lc = f"CAST(([{lits}])[CAST({v} AS INT) + 1] AS DOUBLE)"
    return (
        f"CASE WHEN {raw} <= {HLL_LC_THRESHOLD!r} AND {v} > 0 "
        f"THEN {lc} ELSE {raw} END"
    )


def hll_count_distinct_sql(values_sql: str) -> str:
    """DuckDB twin of :func:`hll_count_distinct` — ``values_sql`` must
    yield one column ``v``; identical hash split, registers, integer
    register sum, and literal corrections."""
    _, bucket, rho = _hll_sql_core(False)
    s = (
        f"(coalesce(sp, 0) + ({HLL_M} - np) * "
        f"CAST({1 << HLL_RMAX} AS BIGINT))"
    )
    v = f"({HLL_M} - np)"
    return (
        f"WITH vals AS (SELECT {bucket} AS bucket, {rho} AS rho FROM "
        f"(SELECT v FROM ({values_sql}) WHERE v IS NOT NULL)), "
        "regs AS (SELECT bucket, max(rho) AS m FROM vals GROUP BY bucket), "
        f"agg AS (SELECT sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - m)) AS sp, "
        "count(*) AS np FROM regs) "
        f"SELECT CAST({v} AS BIGINT) AS n_zero_registers, "
        f"CAST({s} AS BIGINT) AS register_sum, "
        f"{_hll_est_sql(s, v)} AS est_distinct FROM agg"
    )


def hll_count_distinct_by_key_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`hll_count_distinct_by_key` — ``pairs_sql``
    must yield columns (key, v)."""
    _, bucket, rho = _hll_sql_core(True)
    s = f"(sp + ({HLL_M} - np) * CAST({1 << HLL_RMAX} AS BIGINT))"
    v = f"({HLL_M} - np)"
    return (
        f"WITH vals AS (SELECT key, {bucket} AS bucket, {rho} AS rho FROM "
        f"(SELECT key, v FROM ({pairs_sql}) WHERE v IS NOT NULL)), "
        "regs AS (SELECT key, bucket, max(rho) AS m FROM vals "
        "GROUP BY key, bucket), "
        f"agg AS (SELECT key, sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - m)) "
        "AS sp, count(*) AS np FROM regs GROUP BY key) "
        f"SELECT key, CAST({v} AS BIGINT) AS n_zero_registers, "
        f"CAST({s} AS BIGINT) AS register_sum, "
        f"{_hll_est_sql(s, v)} AS est_distinct FROM agg"
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
