"""Count-Min sketch — fixed-memory heavy-hitter frequency estimation
(north-rule extension).

Exact token/URL/host frequency tables over a 100 TB corpus are
vocabulary-sized; a Count-Min sketch (Cormode & Muthukrishnan 2005)
answers "how often does key x occur" with a d×w counter grid: each of d
hash rows increments one of w counters, the estimate is the MINIMUM of
x's d counters. Estimates never undercount (every counter holds the true
count plus non-negative collision mass), overcount by ≤ εN with
probability 1−δ for w = e/ε, d = ln(1/δ) — the sketch the trending /
hot-host / stopword-discovery stages run before anything exact.

Engine parity: rows are the md5-hex-prefix hash (the FM/Bloom idiom),
counters are exact BIGINT counts — both engines reproduce the grid
bit-for-bit; the min-readout is integer. Scale: the build is ONE
map-side-combinable count agg into ≤ d·w rows (broadcast downstream);
the probe joins candidates against that fixed-size grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_col(key: Column, i: int, width: int) -> Column:
    """Row-i column index of ``key`` in [0, width) — first 8 md5 hex
    chars of key||'#c{i}' as a 32-bit int, mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f"#c{i}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    col: str | Column = "v",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """(r INT, c LONG, cnt LONG) — the d×w Count-Min counter grid over
    the occurrences of ``col`` (NULLs ignored). ≤ depth·width rows."""
    k = F.col(col) if isinstance(col, str) else col
    vals = df.select(k.alias("v")).where(F.col("v").isNotNull())
    cells = vals.select(
        F.posexplode(
            F.array(*[_cms_col(F.col("v"), i, width) for i in range(depth)])
        ).alias("r", "c")
    )
    return cells.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    col: str | Column = "v",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """(v, est LONG) — the Count-Min frequency estimate (min over the d
    counters; a missing counter row reads 0) for each distinct non-NULL
    key. ``depth``/``width`` must match the build."""
    k = F.col(col) if isinstance(col, str) else col
    kk = keys.select(k.alias("v")).where(F.col("v").isNotNull()).distinct()
    probe = kk.select(
        "v",
        F.posexplode(
            F.array(*[_cms_col(F.col("v"), i, width) for i in range(depth)])
        ).alias("r", "c"),
    )
    return (
        probe.join(F.broadcast(cms), ["r", "c"], "left")
        .select("v", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"))
        .groupBy("v")
        .agg(F.min("cnt").alias("est"))
    )


def _cms_cols_sql(key_sql: str, depth: int, width: int) -> str:
    """DuckDB (r, c) pairs of ``key_sql`` as a list-of-structs literal."""
    return (
        "["
        + ", ".join(
            f"{{'r': {i}, 'c': CAST('0x' || substr(md5(CAST({key_sql} AS "
            f"VARCHAR) || '#c{i}'), 1, 8) AS BIGINT) % {width}}}"
            for i in range(depth)
        )
        + "]"
    )


def cms_heavy_hitters_sql(
    values_sql: str,
    top_k: int = 20,
    depth: int = 3,
    width: int = 256,
) -> str:
    """DuckDB twin of cms_build ∘ cms_estimate joined with exact counts:
    (v, exact_cnt, cms_est) for the ``top_k`` keys by exact count
    (ties → key ascending). ``values_sql`` must yield one column ``v``."""
    return (
        f"WITH cmsv AS (SELECT v FROM ({values_sql}) WHERE v IS NOT NULL), "
        "cmscells AS (SELECT unnest("
        + _cms_cols_sql("v", depth, width)
        + ", recursive := true) FROM cmsv), "
        "cmsgrid AS (SELECT r, c, count(*) AS cnt FROM cmscells GROUP BY r, c), "
        "cmsexact AS (SELECT v, count(*) AS exact_cnt FROM cmsv GROUP BY v), "
        f"cmstop AS (SELECT v, exact_cnt FROM cmsexact "
        f"ORDER BY exact_cnt DESC, v LIMIT {top_k}), "
        "cmsprobe AS (SELECT t.v, t.exact_cnt, p.u.r AS r, p.u.c AS c "
        "FROM cmstop t, unnest("
        + _cms_cols_sql("t.v", depth, width)
        + ") AS p(u)), "
        "cmsest AS (SELECT p.v, p.exact_cnt, "
        "min(coalesce(g.cnt, 0)) AS cms_est FROM cmsprobe p "
        "LEFT JOIN cmsgrid g ON g.r = p.r AND g.c = p.c "
        "GROUP BY p.v, p.exact_cnt) "
        "SELECT v, CAST(exact_cnt AS BIGINT) AS exact_cnt, "
        "CAST(cms_est AS BIGINT) AS cms_est FROM cmsest"
    )
