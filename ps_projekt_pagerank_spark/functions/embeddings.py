"""Embedding-column transforms for the training-data pipeline (north-rule
extension; the reference has no vector columns).

Int8 symmetric quantization — the standard 4x memory/IO reduction applied
to embedding tables before ANN indexing at corpus scale (a 100 TB float32
embedding column becomes 25 TB int8 + one float scale per vector, and the
IVF/LSH bucket joins in ``operators/similarity.py`` read a quarter of the
bytes). Everything here is exact cross-engine: the scale is a max (order
independent), and q = floor(v/scale*127 + 0.5) is a fixed chain of
correctly-rounded IEEE ops, so the DuckDB twin hash-matches with no
rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, dim INT, q INT, scale DOUBLE) — symmetric per-vector int8
    quantization, exploded one row per dimension: scale = max |v_i|,
    q_i = floor(v_i/scale*127 + 0.5) in [-127, 127] (an all-zero vector
    quantizes to all-zero q with scale 0). Reconstruct with q*scale/127.

    Scale: one explode (|vectors|*dim rows, narrow), one map-side-
    combinable max agg back to |vectors| rows, one equi-join on the
    vector id; no windows, no Python.
    """
    ex = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    sc = ex.groupBy("vec_id").agg(F.max(F.abs("v")).alias("scale"))
    return ex.join(sc, "vec_id").select(
        "vec_id",
        "dim",
        F.when(
            F.col("scale") > 0,
            F.floor(F.col("v") / F.col("scale") * 127.0 + 0.5).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("q"),
        "scale",
    )


def quantize_embeddings_sql(embeddings_sql: str) -> str:
    """DuckDB twin — identical explode/max/floor chain (unnest(range())
    carries the list; CAST the FLOAT element to DOUBLE before any
    arithmetic, exactly like the Spark side)."""
    return (
        "WITH ex0 AS (SELECT vec_id, "
        "unnest(range(0, len(embedding))) AS dim, embedding AS emb "
        f"FROM ({embeddings_sql})), "
        "ex AS (SELECT vec_id, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM ex0), "
        "sc AS (SELECT vec_id, max(abs(v)) AS scale FROM ex GROUP BY vec_id) "
        "SELECT ex.vec_id, ex.dim, "
        "CASE WHEN scale > 0 THEN CAST(floor(v / scale * 127.0 + 0.5) AS INT) "
        "ELSE 0 END AS q, scale "
        "FROM ex JOIN sc ON ex.vec_id = sc.vec_id"
    )


def cluster_stats(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, n_vectors, dim, centroid_norm, mean_sq_norm) — per-cluster
    embedding diagnostics: cluster size, centroid L2 norm (collapsed
    clusters → ~0; healthy spread → larger), and the mean squared vector
    norm. The sanity report an embedding-table ingest runs before ANN
    index builds.

    Determinism: per-dimension centroid means are rounded to 6dp before
    the norm (the k-means replay trick — raw FP sums differ across
    engines in the last ulp under reordering; 6dp absorbs it), and the
    two norms are rounded to 6dp after the final fixed-length sums.

    Scale: one explode, one (label, dim) agg, one |labels|·dim → |labels|
    agg; all map-side combinable, no windows, no Python.

    Precondition: every vector within a label has the same length —
    n_vectors is derived from per-dim counts, which only works then. The
    plan guards it (min per-dim count == max per-dim count per label) and
    raises on ragged input instead of silently misreporting (ADVICE r3);
    the DuckDB twin omits the guard (identical output on valid input).
    """
    ex = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    per_dim = ex.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("m"),
        F.round(F.avg(F.col("v") * F.col("v")), 6).alias("m2"),
        F.count("*").alias("n"),
    )
    return per_dim.groupBy("label").agg(
        F.when(F.min("n") == F.max("n"), F.max("n"))
        .otherwise(
            F.raise_error(
                F.format_string(
                    "cluster_stats: ragged vector lengths within a label "
                    "(per-dim counts %d..%d) — equal-dim precondition",
                    F.min("n"),
                    F.max("n"),
                )
            )
        )
        .alias("n_vectors"),
        F.count("*").alias("dim"),
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias(
            "centroid_norm"
        ),
        F.round(F.sum("m2"), 6).alias("mean_sq_norm"),
    )


def cluster_stats_sql(embeddings_sql: str) -> str:
    """DuckDB twin — identical explode, per-dim rounding, and final
    fixed-length sums."""
    return (
        "WITH ex0 AS (SELECT label, "
        "unnest(range(0, len(embedding))) AS dim, embedding AS emb "
        f"FROM ({embeddings_sql})), "
        "ex AS (SELECT label, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM ex0), "
        "pd AS (SELECT label, dim, round(avg(v), 6) AS m, "
        "round(avg(v * v), 6) AS m2, count(*) AS n FROM ex "
        "GROUP BY label, dim) "
        "SELECT label, max(n) AS n_vectors, count(*) AS dim, "
        "round(sqrt(sum(m * m)), 6) AS centroid_norm, "
        "round(sum(m2), 6) AS mean_sq_norm "
        "FROM pd GROUP BY label"
    )


def embedding_outliers(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q: float = 0.9,
) -> DataFrame:
    """(vec_id, label, dist2 DOUBLE, is_outlier BOOLEAN) — squared L2
    distance to the vector's (6dp-rounded) label centroid, flagged when
    the distance exceeds the EXACT global q-quantile (rank statistic over
    the distributed numbering, quantiles.exact_quantiles' technique).
    The embedding-space quality filter an ingest runs before training:
    far-from-centroid vectors are mislabeled/garbled candidates.

    Determinism: centroid means rounded 6dp (cluster_stats' k-means
    replay trick), dist2 rounded 6dp after the fixed-length per-vector
    sum, threshold selected by rank (never by floating comparison of
    engine-accumulated sums).

    Scale: one explode + (label, dim) agg for centroids, one equi-join
    back on (label, dim) + per-vector agg for distances, one
    range-partitioned numbering for the threshold, one broadcast scalar
    compare. No windows without partitions, no Python.
    """
    import math

    from ..plans.positions import global_positions

    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must lie in (0, 1], got {q}")
    ex = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).select(
        "vec_id", "label", "dim", F.col("v").cast("double").alias("v")
    )
    cent = ex.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("m")
    )
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m"))),
                6,
            ).alias("dist2")
        )
    )
    n = dist.count()
    rank = max(1, math.ceil(float(q) * n))
    thr = (
        global_positions(
            dist.select("dist2", "vec_id"),
            [F.asc("dist2"), F.asc("vec_id")],
            pos_col="_rank",
        )
        .where(F.col("_rank") == rank)
        .select(F.col("dist2").alias("_thr"))
    )
    return dist.crossJoin(F.broadcast(thr)).select(
        "vec_id",
        "label",
        "dist2",
        (F.col("dist2") > F.col("_thr")).alias("is_outlier"),
    )


def embedding_outliers_sql(embeddings_sql: str, q: float = 0.9) -> str:
    """DuckDB twin — identical centroid rounding, distance rounding, and
    rank-selected threshold."""
    return (
        "WITH ex0 AS (SELECT vec_id, label, "
        "unnest(range(0, len(embedding))) AS dim, embedding AS emb "
        f"FROM ({embeddings_sql})), "
        "ex AS (SELECT vec_id, label, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM ex0), "
        "cent AS (SELECT label, dim, round(avg(v), 6) AS m FROM ex "
        "GROUP BY label, dim), "
        "dist AS (SELECT ex.vec_id, ex.label, "
        "round(sum((ex.v - cent.m) * (ex.v - cent.m)), 6) AS dist2 "
        "FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim "
        "GROUP BY ex.vec_id, ex.label), "
        "thr AS (SELECT dist2 AS t FROM (SELECT dist2, row_number() OVER "
        "(ORDER BY dist2 ASC, vec_id ASC) AS rn FROM dist) "
        "WHERE rn = greatest(1, CAST(ceil("
        f"CAST({float(q)} AS DOUBLE) * (SELECT count(*) FROM dist)) "
        "AS BIGINT))) "
        "SELECT vec_id, label, dist2, dist2 > thr.t AS is_outlier "
        "FROM dist, thr"
    )


def principal_component(
    vecs: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(dim, mean, component) — the corpus's dominant principal direction
    by deterministic power iteration on the centered data, plus the
    per-dimension mean (the centering vector). The embedding-pipeline
    diagnostic/whitening primitive: dominant-direction removal
    ("all-but-the-top", Mu & Viswanath ICLR 2018) and top-PC outlier
    scoring both consume exactly this pair.

    Determinism contract (the k-means recipe): means rounded 6 dp;
    v₀ = all-ones; each iteration computes per-row scores
    s_r = round(x'_r·v, 6), the new direction w_j = round(Σ_r s_r·x'_rj, 6),
    then max-normalizes v_j = round(w_j / max|w|, 6) — every step is a
    rounded agg both engines replay. A degenerate direction (max|w| = 0,
    e.g. constant embeddings) keeps the previous v, mirroring
    eigenvector_centrality's nilpotent guard.

    Scale: never materializes a covariance matrix — each iteration is one
    |n·d|-row join + two hash aggs (the classic matrix-free power step);
    the d-row direction broadcasts.
    """
    ex = vecs.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("dim", "raw")
    ).select("vid", "dim", F.col("raw").cast("double").alias("v"))
    mu = ex.groupBy("dim").agg(F.round(F.avg("v"), 6).alias("m"))
    cent = ex.join(F.broadcast(mu), "dim").select(
        "vid", "dim", (F.col("v") - F.col("m")).alias("x")
    )
    vdir = mu.select("dim", F.lit(1.0).alias("c"))
    for _ in range(iters):
        s = (
            cent.join(F.broadcast(vdir), "dim")
            .groupBy("vid")
            .agg(F.round(F.sum(F.col("x") * F.col("c")), 6).alias("s"))
        )
        w = (
            cent.join(F.broadcast(s), "vid")
            .groupBy("dim")
            .agg(F.round(F.sum(F.col("s") * F.col("x")), 6).alias("w"))
        )
        norm = w.agg(F.max(F.abs(F.col("w"))).alias("nrm"))
        vdir = (
            w.crossJoin(F.broadcast(norm))
            .select(
                "dim",
                F.when(
                    F.col("nrm") > 0.0,
                    F.round(F.col("w") / F.col("nrm"), 6),
                )
                .otherwise(F.lit(None))
                .alias("c"),
            )
            .join(vdir.select("dim", F.col("c").alias("prev")), "dim")
            .select("dim", F.coalesce("c", "prev").alias("c"))
        )
    return (
        mu.join(vdir, "dim")
        .select("dim", F.col("m").alias("mean"), F.col("c").alias("component"))
    )


def pc_projection(
    vecs: DataFrame,
    pc: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, pc1) — each vector's scalar coordinate along the
    ``principal_component`` direction (centered dot product, rounded
    6 dp): the score whitening subtracts and outlier screens threshold.
    """
    ex = vecs.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "raw")
    ).select(id_col, "dim", F.col("raw").cast("double").alias("v"))
    return (
        ex.join(F.broadcast(pc), "dim")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("mean")) * F.col("component")), 6
            ).alias("pc1")
        )
    )


def principal_component_sql(embeddings_sql: str, iters: int = 3) -> str:
    """DuckDB twin — identical explode, rounded means, and unrolled
    power steps (each a MATERIALIZED CTE pair)."""
    parts = [
        "pex0 AS (SELECT vec_id AS vid, "
        "unnest(range(0, len(embedding))) AS dim, embedding AS emb "
        f"FROM ({embeddings_sql}))",
        "pex AS MATERIALIZED (SELECT vid, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM pex0)",
        "pmu AS MATERIALIZED (SELECT dim, round(avg(v), 6) AS m FROM pex "
        "GROUP BY dim)",
        "pcent AS MATERIALIZED (SELECT vid, pex.dim, v - m AS x "
        "FROM pex JOIN pmu ON pmu.dim = pex.dim)",
        "v0 AS (SELECT dim, CAST(1.0 AS DOUBLE) AS c FROM pmu)",
    ]
    for i in range(1, iters + 1):
        parts += [
            f"ps{i} AS MATERIALIZED (SELECT vid, "
            f"round(sum(x * c), 6) AS s FROM pcent "
            f"JOIN v{i - 1} USING (dim) GROUP BY vid)",
            f"pw{i} AS MATERIALIZED (SELECT dim, round(sum(s * x), 6) AS w "
            f"FROM pcent JOIN ps{i} USING (vid) GROUP BY dim)",
            f"v{i} AS MATERIALIZED (SELECT pw{i}.dim, CASE WHEN "
            f"(SELECT max(abs(w)) FROM pw{i}) > 0.0 THEN "
            f"round(w / (SELECT max(abs(w)) FROM pw{i}), 6) "
            f"ELSE v{i - 1}.c END AS c "
            f"FROM pw{i} JOIN v{i - 1} ON v{i - 1}.dim = pw{i}.dim)",
        ]
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT pmu.dim, pmu.m AS mean, v{iters}.c AS component "
        f"FROM pmu JOIN v{iters} ON v{iters}.dim = pmu.dim"
    )


def pc_projection_sql(embeddings_sql: str, iters: int = 3) -> str:
    """DuckDB twin of pc_projection over principal_component_sql."""
    return (
        f"WITH pc AS MATERIALIZED ({principal_component_sql(embeddings_sql, iters)}), "
        "ex0 AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim, "
        f"embedding AS emb FROM ({embeddings_sql})), "
        "ex AS (SELECT vec_id, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM ex0) "
        "SELECT vec_id, round(sum((v - mean) * component), 6) AS pc1 "
        "FROM ex JOIN pc ON pc.dim = ex.dim GROUP BY vec_id"
    )
