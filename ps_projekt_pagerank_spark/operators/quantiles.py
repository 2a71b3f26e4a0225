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


def grouped_positions(
    df: DataFrame,
    group_col: str,
    sort_cols: list,
    pos_col: str = "rank",
) -> DataFrame:
    """df + ``pos_col`` = 1-based rank of the row WITHIN its group under
    ``sort_cols`` — distributed: a plain ``Window.partitionBy(group)``
    funnels each group through ONE task (fatal when a group is a whole
    language of the corpus), so this range-partitions on
    (group, *sort_cols), numbers locally per (partition, group), and
    adds per-(partition, group) offsets computed by a cumsum over the
    TINY (|partitions| × |groups present per partition|)-row count frame
    — that window partitions by group over ≤|partitions| rows each."""
    from pyspark.sql import Window

    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    local = (
        df.repartitionByRange(p, group_col, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number()
            .over(Window.partitionBy("_pid", group_col).orderBy(*sort_cols))
            .cast("long"),
        )
        .localCheckpoint(eager=True)  # pin range boundaries across jobs
    )
    cnts = local.groupBy("_pid", group_col).agg(F.count("*").alias("_c"))
    off = cnts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_c").over(
                Window.partitionBy(group_col)
                .orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    ).select("_pid", group_col, "_off")
    return (
        local.join(off, ["_pid", group_col])
        .withColumn(pos_col, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = DEFAULT_QS,
    key_col: str | None = None,
) -> DataFrame:
    """(group, q, rank, value) — the exact lower quantile of
    ``value_col`` per ``group_col`` value: rank_g(q) = max(1,
    ceil(q·n_g)) under (value ASC, key ASC) within the group. The mix
    designer's per-language contract check ("median/p99 doc length per
    lang") without ever sorting a whole group in one task."""
    if not qs:
        raise ValueError("grouped_quantiles needs at least one q")
    if any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must lie in (0, 1], got {list(qs)}")
    key_col = key_col or df.columns[0]
    spark = df.sparkSession
    src = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"),
        F.col(key_col).alias("_k"),
    )
    pos = grouped_positions(
        src, "grp", [F.asc("value"), F.asc("_k")], pos_col="rank"
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    targets = (
        src.groupBy("grp")
        .agg(F.count("*").alias("_n"))
        .crossJoin(F.broadcast(qdf))
        .select(
            "grp",
            "q",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("q") * F.col("_n")).cast("long"),
            ).alias("rank"),
        )
    )
    return (
        pos.join(targets, ["grp", "rank"])
        .select(F.col("grp").alias(group_col), "q", "rank", "value")
    )


def grouped_quantiles_sql(
    rel_expr: str,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = DEFAULT_QS,
    key_col: str | None = None,
) -> str:
    """DuckDB twin — per-group window numbering (single-node oracle),
    identical IEEE ceil(q·n) rank arithmetic."""
    key_col = key_col or "1"
    q_rows = ", ".join(f"(CAST({float(q)} AS DOUBLE))" for q in qs)
    return (
        f"WITH src AS (SELECT {group_col} AS grp, {value_col} AS value, "
        f"{key_col} AS k FROM ({rel_expr})), "
        "n AS (SELECT grp, count(*) AS n FROM src GROUP BY grp), "
        f"qs(q) AS (VALUES {q_rows}), "
        "probe AS (SELECT grp, q, greatest(1, CAST(ceil(q * n.n) AS "
        "BIGINT)) AS rank FROM qs, n), "
        "pos AS (SELECT grp, value, CAST(row_number() OVER "
        "(PARTITION BY grp ORDER BY value ASC, k ASC) AS BIGINT) AS rank "
        "FROM src) "
        f"SELECT probe.grp AS {group_col}, probe.q, probe.rank, pos.value "
        "FROM probe JOIN pos ON pos.grp = probe.grp "
        "AND pos.rank = probe.rank"
    )
