"""Attack-robustness curve (Albert, Jeong & Barabási 2000) — how much of
the graph's giant component survives when the top-k highest-degree hubs
are removed? Scale-free graphs (the web) are famously robust to random
failure and fragile to targeted hub attack; the curve quantifies it and,
for a crawler, says how much frontier connectivity rides on how few
hosts. Reference computes only PageRank (Graph.cpp:118-173); north-rule
structural extension.

For each k in ``ks``:

    hubs_k   = top-k nodes by (undirected simple degree DESC, id ASC)
    giant_k  = largest connected component of the graph minus hubs_k
    frac_k   = |giant_k| / (|V| − |hubs_k|)   (isolated survivors count
               in the denominator as singletons)

Scale shape: degree = one hash agg; top-k = Spark's distributed TopK
(k is a small constant — never a global sort); per k, one anti-join pair
and the min-label CC loop (O(diameter) rounds, each ONE shuffle). The
driver loop is over the constant ``ks`` list, not data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components

DEFAULT_KS = (0, 5, 25)


def attack_robustness(
    edges: DataFrame, ks: Sequence[int] = DEFAULT_KS
) -> DataFrame:
    """(k INT, n_nodes BIGINT, giant_size BIGINT, giant_frac DOUBLE) —
    one row per hub-removal budget k."""
    if any(k < 0 for k in ks):
        raise ValueError(f"ks must be non-negative, got {list(ks)}")
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        simple.select(F.col("a").alias("id"))
        .unionAll(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    out = []
    for k in ks:
        hubs = (
            deg.orderBy(F.desc("deg"), F.asc("id")).limit(int(k)).select("id")
        ).localCheckpoint(eager=True)
        n_hubs = hubs.count()
        kept = (
            simple.join(hubs.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(hubs.withColumnRenamed("id", "b"), "b", "left_anti")
        )
        n_nodes = nodes.join(hubs, "id", "left_anti").count()
        if n_nodes == 0:
            row = spark.createDataFrame(
                [(int(k), 0, 0, 0.0)],
                "k int, n_nodes long, giant_size long, giant_frac double",
            )
            out.append(row)
            continue
        cc = connected_components(
            kept.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        giant = (
            cc.groupBy("component")
            .agg(F.count(F.lit(1)).alias("size"))
            .agg(F.coalesce(F.max("size"), F.lit(1)).alias("giant_size"))
        )
        row = giant.select(
            F.lit(int(k)).alias("k"),
            F.lit(n_nodes).cast("long").alias("n_nodes"),
            # a survivor set with no edges at all is max(size)=NULL -> a
            # singleton giant of size 1 (n_nodes >= 1 here)
            F.col("giant_size").cast("long"),
            (
                F.col("giant_size").cast("double") / F.lit(float(n_nodes))
            ).alias("giant_frac"),
        )
        out.append(row)
        _ = n_hubs  # hub count folded into n_nodes via the anti-join
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res


def attack_robustness_sql(
    edges_sql: str, ks: Sequence[int] = DEFAULT_KS
) -> str:
    """DuckDB twin — per k, the same hub cut then the recursive
    undirected closure the cc_components twin uses."""
    parts = [
        f"WITH RECURSIVE raw AS ({edges_sql})",
        "simple AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM raw WHERE src <> dst)",
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM raw "
        "UNION ALL SELECT dst AS id FROM raw))",
        "deg AS (SELECT id, count(*) AS deg FROM "
        "(SELECT a AS id FROM simple UNION ALL SELECT b AS id FROM simple) "
        "GROUP BY id)",
        "ranked AS (SELECT id, row_number() OVER "
        "(ORDER BY deg DESC, id ASC) AS rn FROM deg)",
    ]
    selects = []
    for k in ks:
        k = int(k)
        parts += [
            f"hubs{k} AS (SELECT id FROM ranked WHERE rn <= {k})",
            f"kept{k} AS (SELECT a, b FROM simple WHERE "
            f"a NOT IN (SELECT id FROM hubs{k}) "
            f"AND b NOT IN (SELECT id FROM hubs{k}))",
            f"sym{k}(a, b) AS (SELECT a, b FROM kept{k} "
            f"UNION SELECT b, a FROM kept{k})",
            f"reach{k}(a, b) AS (SELECT a, b FROM sym{k} "
            f"UNION SELECT r.a, s.b FROM reach{k} r "
            f"JOIN sym{k} s ON r.b = s.a)",
            f"surv{k} AS (SELECT id FROM nodes WHERE "
            f"id NOT IN (SELECT id FROM hubs{k}))",
            f"comp{k} AS (SELECT n.id, least(n.id, coalesce(min(r.b), "
            f"n.id)) AS component FROM surv{k} n "
            f"LEFT JOIN reach{k} r ON r.a = n.id GROUP BY n.id)",
            f"sz{k} AS (SELECT component, count(*) AS size FROM comp{k} "
            "GROUP BY component)",
        ]
        selects.append(
            f"SELECT {k} AS k, (SELECT count(*) FROM surv{k}) AS n_nodes, "
            f"coalesce((SELECT max(size) FROM sz{k}), 0) AS giant_size, "
            f"CASE WHEN (SELECT count(*) FROM surv{k}) = 0 THEN 0.0 ELSE "
            f"CAST(coalesce((SELECT max(size) FROM sz{k}), 0) AS DOUBLE) "
            f"/ (SELECT count(*) FROM surv{k}) END AS giant_frac"
        )
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)


DEFAULT_FRACS = (0.0, 0.3, 0.6)


def random_failure_robustness(
    edges: DataFrame, fracs: Sequence[float] = DEFAULT_FRACS, salt: str = "rf"
) -> DataFrame:
    """(p DOUBLE, n_nodes BIGINT, giant_size BIGINT, giant_frac DOUBLE) —
    the RANDOM-failure half of Albert/Jeong/Barabási: remove each node
    independently with probability p and measure the surviving giant
    component. Scale-free graphs barely notice random failure while the
    targeted curve (``attack_robustness``) collapses — reporting both is
    the standard resilience contrast.

    Determinism: "random" removal is the repo's md5-uniform draw per node
    (same contract as weighted_bernoulli_sample) — identical removals at
    any parallelism, on re-runs, and in any engine with md5; ``salt``
    gives independent failure scenarios.

    Scale shape: per p, one per-node filter (no shuffle), one anti-join
    pair, and the min-label CC loop — same as the attack curve.
    """
    if any(p < 0 or p > 1 for p in fracs):
        raise ValueError(f"fracs must be in [0, 1], got {list(fracs)}")
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col("id").cast("string"), F.lit(salt)
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double") / F.lit(float(2**32))
    spark = edges.sparkSession
    out = []
    for p in fracs:
        p = float(p)
        failed = nodes.where(u < F.lit(p)).localCheckpoint(eager=True)
        kept = (
            simple.join(failed.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(failed.withColumnRenamed("id", "b"), "b", "left_anti")
        )
        n_nodes = nodes.join(failed, "id", "left_anti").count()
        if n_nodes == 0:
            out.append(
                spark.createDataFrame(
                    [(p, 0, 0, 0.0)],
                    "p double, n_nodes long, giant_size long, "
                    "giant_frac double",
                )
            )
            continue
        cc = connected_components(
            kept.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        giant = (
            cc.groupBy("component")
            .agg(F.count(F.lit(1)).alias("size"))
            .agg(F.coalesce(F.max("size"), F.lit(1)).alias("giant_size"))
        )
        out.append(
            giant.select(
                F.lit(p).alias("p"),
                F.lit(n_nodes).cast("long").alias("n_nodes"),
                F.col("giant_size").cast("long"),
                F.round(
                    F.col("giant_size").cast("double")
                    / F.lit(float(n_nodes)),
                    6,
                ).alias("giant_frac"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res


def random_failure_robustness_sql(
    edges_sql: str, fracs: Sequence[float] = DEFAULT_FRACS, salt: str = "rf"
) -> str:
    """DuckDB twin — same md5-Bernoulli removal and recursive closure."""
    parts = [
        f"WITH RECURSIVE raw AS ({edges_sql})",
        "simple AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM raw WHERE src <> dst)",
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM raw "
        "UNION ALL SELECT dst AS id FROM raw))",
        "draw AS (SELECT id, CAST(CAST('0x' || substr(md5("
        f"CAST(id AS VARCHAR) || '#{salt}'), 1, 8) AS BIGINT) AS DOUBLE) "
        "/ 4294967296.0 AS u FROM nodes)",
    ]
    selects = []
    for i, p in enumerate(fracs):
        p = float(p)
        parts += [
            f"fail{i} AS (SELECT id FROM draw WHERE u < {p!r})",
            f"kept{i} AS (SELECT a, b FROM simple WHERE "
            f"a NOT IN (SELECT id FROM fail{i}) "
            f"AND b NOT IN (SELECT id FROM fail{i}))",
            f"sym{i}(a, b) AS (SELECT a, b FROM kept{i} "
            f"UNION SELECT b, a FROM kept{i})",
            f"reach{i}(a, b) AS (SELECT a, b FROM sym{i} "
            f"UNION SELECT r.a, s.b FROM reach{i} r "
            f"JOIN sym{i} s ON r.b = s.a)",
            f"surv{i} AS (SELECT id FROM nodes WHERE "
            f"id NOT IN (SELECT id FROM fail{i}))",
            f"comp{i} AS (SELECT n.id, least(n.id, coalesce(min(r.b), "
            f"n.id)) AS component FROM surv{i} n "
            f"LEFT JOIN reach{i} r ON r.a = n.id GROUP BY n.id)",
            f"sz{i} AS (SELECT component, count(*) AS size FROM comp{i} "
            "GROUP BY component)",
        ]
        selects.append(
            # giant_size must agree with the Spark side's degenerate row
            # (p=1.0 → all nodes fail → literal 0, not coalesce-to-1);
            # with survivors but no kept edges both engines give 1.
            f"SELECT CAST({p!r} AS DOUBLE) AS p, "
            f"(SELECT count(*) FROM surv{i}) AS n_nodes, "
            f"CASE WHEN (SELECT count(*) FROM surv{i}) = 0 THEN 0 ELSE "
            f"coalesce((SELECT max(size) FROM sz{i}), 1) END AS giant_size, "
            f"CASE WHEN (SELECT count(*) FROM surv{i}) = 0 THEN 0.0 ELSE "
            f"round(CAST(coalesce((SELECT max(size) FROM sz{i}), 1) "
            f"AS DOUBLE) / (SELECT count(*) FROM surv{i}), 6) END "
            "AS giant_frac"
        )
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)
