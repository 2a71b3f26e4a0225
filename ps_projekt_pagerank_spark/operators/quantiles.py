"""Exact distributed quantiles — rank-statistic selection over the
range-partitioned global numbering (plans/positions.py), NOT an
approximation. Spark's own ``approxQuantile`` trades exactness for one
pass; a data pipeline's contract checks ("p99 document length under the
context window", "median tokens per doc") want the exact order statistic,
and the distributed numbering makes it one extra tiny join:

    rank(q) = max(1, ceil(q · n))        (the lower exact quantile)
    value(q) = the row with that rank under (value ASC, key ASC)

Scale shape: global_positions is a range partition + per-partition local
numbering + one |partitions|-row offset pass; the quantile probe is then
a broadcast semi-join on |qs| ranks. No partitionless window anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.positions import global_positions

DEFAULT_QS = (0.5, 0.9, 0.99)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float] = DEFAULT_QS,
    key_col: str | None = None,
) -> DataFrame:
    """(q DOUBLE, rank BIGINT, value) — the exact lower quantile of
    ``value_col`` for each q in ``qs``. ``key_col`` breaks value ties so
    the selected row (hence the result) is engine-deterministic; it
    defaults to the first column."""
    if not qs:
        raise ValueError("exact_quantiles needs at least one q")
    if any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must lie in (0, 1], got {list(qs)}")
    key_col = key_col or df.columns[0]
    spark = df.sparkSession
    n = df.count()
    # IEEE ceil(q·n) — the identical double product both engines compute,
    # so the selected ranks agree bit-for-bit
    import math

    ranks = [(float(q), max(1, math.ceil(float(q) * n))) for q in qs]
    probe = spark.createDataFrame(ranks, "q double, rank long")
    pos = global_positions(
        df.select(F.col(value_col).alias("value"), F.col(key_col)),
        [F.asc("value"), F.asc(key_col)],
        pos_col="rank",
    )
    return (
        pos.join(F.broadcast(probe), "rank")
        .select("q", "rank", "value")
        .orderBy("q")
    )


def exact_quantiles_sql(
    rel_expr: str,
    value_col: str,
    qs: Sequence[float] = DEFAULT_QS,
    key_col: str | None = None,
) -> str:
    """DuckDB twin — row_number under the same (value, key) order is the
    sequential stand-in for global_positions; the rank arithmetic is
    computed identically (ceil on exact integers)."""
    key_col = key_col or "1"
    # CAST each literal: a bare float list parses as DECIMAL in DuckDB,
    # which would hash-mismatch Spark's DOUBLE q column
    q_rows = ", ".join(f"(CAST({float(q)} AS DOUBLE))" for q in qs)
    return (
        f"WITH src AS (SELECT {value_col} AS value, {key_col} AS k "
        f"FROM ({rel_expr})), "
        "n AS (SELECT count(*) AS n FROM src), "
        f"qs(q) AS (VALUES {q_rows}), "
        "probe AS (SELECT q, greatest(1, CAST(ceil(q * n.n) AS BIGINT)) "
        "AS rank FROM qs, n), "
        "pos AS (SELECT value, row_number() OVER "
        "(ORDER BY value ASC, k ASC) AS rank FROM src) "
        "SELECT probe.q, probe.rank, pos.value FROM probe "
        "JOIN pos ON pos.rank = probe.rank ORDER BY probe.q"
    )
