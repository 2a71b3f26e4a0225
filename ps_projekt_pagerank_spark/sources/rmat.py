"""R-MAT / Kronecker synthetic graph generator (Chakrabarti/Zhan/Faloutsos,
SDM 2004) — the standard web-shaped scale-up source beside the
reference's tripler (prepleti.cpp:44-74, our sources/tripler.py).

The tripler replicates a FIXED topology 3^k×; R-MAT generates a FRESH
heavy-tailed graph at any size from four quadrant probabilities
(a, b, c, d), which is what Graph500 and every shuffle-skew study uses —
the right fixture when the question is "does the salted gather survive a
power-law hub that ISN'T in the sf0.1 data".

Deterministic + engine-exact by construction: edge i draws its `scale`
quadrant decisions from md5(i # level) reduced to an integer in
[0, 10000), compared against INTEGER per-mille-of-ten-thousand
thresholds — no RNG object, no floats, so Spark, DuckDB, and the pytest
replay produce the identical edge list, and the generator is pure column
algebra over ``spark.range(n_edges)`` (embarrassingly parallel: no
shuffle, no state, each partition emits its id range independently).

Self-loops and duplicate edges are kept — exactly the multigraph
semantics of the SNAP reader (Graph.cpp:94-97) that every downstream
operator already handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# default Graph500-ish skew: a=0.57, b=0.19, c=0.19, d=0.05
DEFAULT_QUADS = (5700, 1900, 1900)  # integer thresholds out of 10000


def _draw(i, level: int):
    """md5-derived integer in [0, 10000) for (edge i, recursion level)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(i.cast("string"), F.lit(f"#{level}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )


def rmat_edges(
    spark: SparkSession,
    n_edges: int,
    scale: int,
    quads: tuple[int, int, int] = DEFAULT_QUADS,
    partitions: int | None = None,
) -> DataFrame:
    """(edge_id LONG, src LONG, dst LONG) — ``n_edges`` R-MAT edges over
    2^scale vertices. ``quads`` = integer thresholds (ta, ta+tb, ta+tb+tc)
    out of 10000 for quadrants a / b / c (d is the remainder)."""
    ta, tb, tc = quads
    t1, t2, t3 = ta, ta + tb, ta + tb + tc
    if not (0 < t1 <= t2 <= t3 <= 10000):
        raise ValueError(f"rmat_edges: bad quadrant thresholds {quads}")
    df = spark.range(n_edges, numPartitions=partitions).select(
        F.col("id").alias("edge_id")
    )
    i = F.col("edge_id")
    src, dst = F.lit(0).cast("long"), F.lit(0).cast("long")
    for level in range(scale):
        r = _draw(i, level)
        # quadrant -> (src bit, dst bit): a=(0,0) b=(0,1) c=(1,0) d=(1,1)
        sbit = F.when(r < t2, F.lit(0)).otherwise(F.lit(1)).cast("long")
        dbit = (
            F.when((r >= t1) & (r < t2), F.lit(1))
            .when(r >= t3, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    return df.select("edge_id", src.alias("src"), dst.alias("dst"))


def rmat_edges_sql(
    n_edges: int, scale: int, quads: tuple[int, int, int] = DEFAULT_QUADS
) -> str:
    """DuckDB twin — identical md5 draws, thresholds, and bit recursion.
    Yields (edge_id, src, dst)."""
    ta, tb, tc = quads
    t1, t2, t3 = ta, ta + tb, ta + tb + tc
    src_terms, dst_terms = [], []
    for level in range(scale):
        r = (
            f"(CAST('0x' || substr(md5(CAST(edge_id AS VARCHAR) || "
            f"'#{level}'), 1, 8) AS BIGINT) % 10000)"
        )
        shift = 1 << (scale - 1 - level)
        src_terms.append(f"(CASE WHEN {r} < {t2} THEN 0 ELSE 1 END) * {shift}")
        dst_terms.append(
            f"(CASE WHEN ({r} >= {t1} AND {r} < {t2}) OR {r} >= {t3} "
            f"THEN 1 ELSE 0 END) * {shift}"
        )
    return (
        f"SELECT edge_id, CAST({' + '.join(src_terms)} AS BIGINT) AS src, "
        f"CAST({' + '.join(dst_terms)} AS BIGINT) AS dst FROM "
        f"(SELECT CAST(range AS BIGINT) AS edge_id FROM range({n_edges}))"
    )
