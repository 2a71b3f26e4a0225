"""Distributed global position numbering (parallel zipWithIndex).

``row_number`` over a partitionless Window funnels the whole frame through
one task — correct at test scale, a scale-killer at 10^9 rows. The
distributed equivalent: range-partition on the sort keys (partition i holds
keys ordered before partition i+1's), number rows locally per partition,
then add per-partition offsets computed from one tiny count pass. Every
stage is parallel; the only driver traffic is the |partitions|-row count.

The range partitioning is pinned with an eager localCheckpoint so the
offset job and the final projection see identical partition boundaries
(range boundaries come from sampling and must not be re-derived between
the two jobs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_positions(
    df: DataFrame,
    sort_cols: list[Column | str],
    partitions: int | None = None,
    pos_col: str = "pos",
) -> DataFrame:
    """``df`` + ``pos_col`` = 1-based global rank under ``sort_cols``.

    ``sort_cols`` may include ``F.desc(...)`` expressions; the range
    partitioner honors their direction, so partition ids follow the global
    order and offsets are a prefix sum over partition counts.
    """
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    local = (
        df.repartitionByRange(p, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local_idx",
            F.row_number()
            .over(Window.partitionBy("_pid").orderBy(*sort_cols))
            .cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    counts = (
        local.groupBy("_pid").agg(F.count("*").alias("c")).orderBy("_pid").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((int(r["_pid"]), acc))
        acc += int(r["c"])
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid INT, _off LONG")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(pos_col, F.col("_local_idx") + F.col("_off"))
        .drop("_pid", "_local_idx", "_off")
    )
