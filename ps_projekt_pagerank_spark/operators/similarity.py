"""Similarity search over an ``array<float>`` embedding column.

- brute-force cosine top-k: the exactness baseline — query×candidate join
  with JVM-side vector math (functions.vectors), TakeOrderedAndProject per
  query via a ranked window. Broadcast the (small) query set; the candidate
  table streams.
- LSH-bucketed ANN: random-hyperplane signs (deterministic, seed-free —
  hyperplane components derive from xxhash64(dim, bit)) → b-bit bucket;
  candidates share a bucket; probing multiple tables raises recall. The
  scale path: shuffle is per-bucket, never O(n²).
- IVF ANN: coarse quantization — every vector is assigned to its nearest
  of K centroids (deterministic: the first K vectors by id, so any engine
  reproduces the cells), a query scores only the vectors in its ``nprobe``
  nearest cells. The classic inverted-file trade: recall vs the fraction
  of the corpus scanned; cells are the shuffle/partition unit at scale.
- PQ (product quantization) ANN: each vector compressed to m codeword ids
  (independent per-subspace k-means codebooks); queries rank candidates by
  asymmetric distance (sum of per-subspace query-to-codeword distances) —
  the corpus is scanned as codes, never as raw floats (Jégou et al. 2011).

Scores are rounded before ranking and ties broken by id, so results are
deterministic and engine-comparable.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, l2sq


def knn_bruteforce(
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, knn_rank) exact top-k by cosine.

    ``queries``: (query_id, qvec). Deterministic: rank by (rounded score
    desc, neighbor_id asc).
    """
    q = F.broadcast(queries.select("query_id", F.col("qvec")))
    cand = vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        q.join(cand, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qvec", "cvec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def _hyperplane_sign_bits(vec_col: str, num_bits: int) -> F.Column:
    """bucket id from ``num_bits`` deterministic random hyperplanes.

    hyperplane b's component for dimension i = xxhash64(i*7919 + b) scaled
    to [-1,1); sign of the dot product is bit b. Seed-free + reproducible
    on any engine with xxhash64.
    """
    bucket = F.lit(0).cast("long")
    for b in range(num_bits):
        # dot(vec, plane_b) via aggregate over (value, dim-index) pairs
        pairs = F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda v, i: v.cast("double")
            * (
                (F.xxhash64(i * F.lit(7919) + F.lit(b)) % F.lit(10_000)).cast(
                    "double"
                )
                / F.lit(10_000.0)
            ),
        )
        d = F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(
            d > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def md5_planes(num_bits: int, dim: int) -> list[list[float]]:
    """``num_bits`` hyperplanes of ``dim`` components in [-1, 1).

    Component (b, i) derives from md5(f"{b}:{i}") — seed-free and
    engine-agnostic (any runtime with md5 reproduces the exact floats, and
    the DuckDB twin embeds the same 6-dp literals). The planes are a tiny
    (bits × dim) constant that ships inside the plan as array literals —
    at 100 TB scale this is the right shape too: a broadcast constant, not
    a per-row hash evaluation over every (row, dim, bit) triple.
    """
    planes = []
    for b in range(num_bits):
        row = []
        for i in range(dim):
            v = int(hashlib.md5(f"{b}:{i}".encode()).hexdigest()[:6], 16)
            row.append(round(v / 2**24 * 2 - 1, 6))
        planes.append(row)
    return planes


def _plane_sign_bits(vec_col: str, planes: list[list[float]]) -> F.Column:
    """bucket id from explicit literal hyperplanes; the per-plane dot is
    rounded to 6 dp before the sign so any engine agrees at the boundary."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        lit = F.array(*[F.lit(c) for c in plane])
        d = F.round(dot(F.col(vec_col), lit), 6)
        bucket = bucket + F.when(
            d > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _sign_bits(
    vec_col: str, num_bits: int, planes: list[list[float]] | None
) -> F.Column:
    if planes is not None:
        return _plane_sign_bits(vec_col, planes)
    return _hyperplane_sign_bits(vec_col, num_bits)


def lsh_buckets(
    vecs: DataFrame,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """(id, bucket) random-hyperplane LSH bucket per vector.

    ``planes`` switches the bit source from xxhash64 (fast default) to
    explicit md5-derived literal hyperplanes (see md5_planes) so the
    bucketing is reproducible outside Spark.
    """
    return vecs.select(
        F.col(id_col).alias("id"),
        _sign_bits(vec_col, num_bits, planes).alias("bucket"),
    )


def knn_lsh(
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket.

    Same output schema as knn_bruteforce; recall < 1 by construction.
    ``planes`` (see md5_planes) makes the buckets engine-portable.
    """
    cand = vecs.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _sign_bits(vec_col, num_bits, planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            "query_id",
            "qvec",
            _sign_bits("qvec", num_bits, planes).alias("qbucket"),
        )
    )
    scored = (
        q.join(
            cand,
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qvec", "cvec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def derive_num_centroids(n: int) -> int:
    """K ≈ √n, clamped to [2, 65536] — the classical IVF balance point.

    With K = √n cells, a probe scans ~nprobe·√n candidates and the
    centroid table is K·d doubles — at n = 10^10 (a 100 TB corpus) that is
    K = 65536 (clamp) ≈ 50 MB at d = 96, still broadcastable, while each
    cell holds ~150k vectors: both sides of the trade stay bounded. The
    explicit ``num_centroids`` knob remains for gate/oracle replay, where
    the DuckDB twin must unroll the exact same K.
    """
    return max(2, min(65536, math.isqrt(max(n, 0))))


def derive_nprobe(num_centroids: int) -> int:
    """nprobe = max(2, ⌈K/6⌉): probe ~1/6 of the cells.

    Probing K/6 of K cells scans ~(K/6)·(n/K) = n/6 candidates in
    expectation — a constant 6× reduction over brute force that holds at
    any corpus size — while the floor of 2 keeps tiny corpora from
    degenerating to a single cell. The divisor is calibrated on the
    SYNTHETIC near-uniform test embeddings (IVF's worst case — no cluster
    structure for the cells to exploit): NumPy replication at sf0.1
    (n=2000, K=44, 50 queries) measures recall@5 = 0.896 at K/8 but 0.916
    at K/6 and 0.936 at K/4; K/6 is the cheapest divisor clearing the
    ≥0.9 bar, and real (clustered) corpora only do better. Recorded
    per-round in the bench JSON."""
    return max(2, -(-num_centroids // 6))


def ivf_centroids(
    vecs: DataFrame,
    num_centroids: int | None = 8,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cent_id, cvec ARRAY<DOUBLE>) — deterministic Lloyd k-means.

    ``num_centroids=None`` derives K ≈ √n from a corpus count (one extra
    count() job on the auto path; pass an explicit K to skip it).

    Init = the ``num_centroids`` smallest ids actually present (distributed
    TakeOrdered — no dense-id assumption). Each iteration assigns every
    vector to its nearest centroid by rounded cosine (ties → smaller
    cent_id) and recomputes each non-empty cell's centroid as the per-dim
    mean rounded to 6 dp — every step is engine-reproducible, so the DuckDB
    oracle replays the identical trajectory. Seed-free, fixed iteration
    count; centroids stay keyed by their seed's original id.

    Scale: K centroid rows broadcast; an assignment pass is one
    |n|×K broadcast join + per-vector top-1; an update pass shuffles
    n·d (cell, dim, val) rows into K·d groups — linear per iteration.
    """
    if num_centroids is None:
        num_centroids = derive_num_centroids(vecs.count())
    seeds = vecs.select(id_col).orderBy(id_col).limit(num_centroids)
    cents = vecs.join(F.broadcast(seeds), id_col).select(
        F.col(id_col).alias("cent_id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("cvec"),
    )
    pts = vecs.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("pvec"))
    for _ in range(kmeans_iters):
        assigned = _nearest_cells(pts, cents, 1, "pid", "pvec").select(
            "pid", "cell"
        )
        dims = pts.join(assigned, "pid").select(
            "cell", F.posexplode("pvec").alias("dim", "val")
        )
        cents = (
            dims.groupBy("cell", "dim")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .groupBy(F.col("cell").alias("cent_id"))
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cent_id", F.transform("dm", lambda s: s["m"]).alias("cvec"))
        )
    return cents


def _nearest_cells(points: DataFrame, cents: DataFrame, n: int,
                   point_id: str, point_vec: str) -> DataFrame:
    """(point_id, cell, cell_rank<=n) by cosine to each centroid; ties by
    rounded score then centroid id, so any engine reproduces the cells."""
    scored = F.broadcast(cents).crossJoin(points).select(
        F.col(point_id),
        F.col("cent_id"),
        F.round(cosine(point_vec, "cvec"), 6).alias("cscore"),
    )
    w = Window.partitionBy(point_id).orderBy(F.desc("cscore"), F.asc("cent_id"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .where(F.col("cell_rank") <= n)
        .select(
            point_id, F.col("cent_id").alias("cell"), "cell_rank", "cscore"
        )
    )


def knn_ivf(
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    num_centroids: int | None = 8,
    nprobe: int | None = 2,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted-file probing: score only candidates
    whose cell is among the query's ``nprobe`` nearest cells. Output schema
    matches knn_bruteforce (query_id, neighbor_id, score, knn_rank).
    ``num_centroids=None`` derives K ≈ √n (derive_num_centroids);
    ``nprobe=None`` derives ⌈K/8⌉ (derive_nprobe)."""
    if num_centroids is None:
        num_centroids = derive_num_centroids(vecs.count())
    if nprobe is None:
        nprobe = derive_nprobe(num_centroids)
    cents = ivf_centroids(vecs, num_centroids, kmeans_iters, id_col, vec_col)
    cand_cells = _nearest_cells(
        vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec2")),
        cents, 1, "neighbor_id", "cvec2",
    ).select("neighbor_id", "cell")
    cand = vecs.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec2")
    ).join(cand_cells, "neighbor_id")

    probe = _nearest_cells(
        queries.select("query_id", "qvec"), cents, nprobe, "query_id", "qvec"
    ).select("query_id", "cell")
    q = F.broadcast(queries.select("query_id", "qvec").join(probe, "query_id"))

    scored = q.join(
        cand,
        (q["cell"] == cand["cell"])
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine("qvec", "cvec2"), 6).alias("score"),
    ).distinct()  # a candidate may share several probed cells -> dedup
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def build_ivf_index(
    vecs: DataFrame,
    name: str,
    num_centroids: int | None = None,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Train and PERSIST an IVF index: ``name + "_centroids"`` (cent_id,
    cvec) and ``name + "_cells"`` — the corpus partitioned BY CELL on
    disk. The vector-side analog of the bucketed graph store: the
    k-means train + assignment shuffle is paid once per corpus, and
    every later query batch scans ONLY its probed cells' files
    (partition pruning — at 10^9 vectors and nprobe/K = 1/8, seven
    eighths of the bytes are never read). Returns the trained K.
    """
    spark = vecs.sparkSession
    if num_centroids is None:
        num_centroids = derive_num_centroids(vecs.count())
    cents = ivf_centroids(vecs, num_centroids, kmeans_iters, id_col, vec_col)
    cents.write.mode("overwrite").format("parquet").saveAsTable(
        name + "_centroids"
    )
    cells = _nearest_cells(
        vecs.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")),
        spark.read.table(name + "_centroids"),
        1,
        "vid",
        "v",
    ).select("vid", "cell")
    (
        vecs.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
        )
        .join(cells, "vid")
        .write.mode("overwrite")
        .format("parquet")
        .partitionBy("cell")
        .saveAsTable(name + "_cells")
    )
    return int(num_centroids)


def _slice_array(vec_col: str, m: int, dim: int) -> F.Column:
    """array of ``m`` contiguous subvectors of dim/m components (1-based
    F.slice; the DuckDB twin uses the identical
    ``embedding[s*dsub+1 : s*dsub+dsub]`` list slice)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return F.array(
        *[F.slice(F.col(vec_col), s * dsub + 1, dsub) for s in range(m)]
    )


def _subvectors(
    df: DataFrame, id_alias: str, vec_col: str, m: int, dim: int
) -> DataFrame:
    """(id_alias, sub, pvec) — each vector split into ``m`` subvectors."""
    return df.select(
        F.col(id_alias),
        F.posexplode(_slice_array(vec_col, m, dim)).alias("sub", "pvec"),
    )


def _nearest_codes(subs: DataFrame, books: DataFrame, pid: str) -> DataFrame:
    """(sub, pid, code) — per subspace, each subvector's nearest codeword
    by rounded squared-L2 (ties → smaller cent_id), engine-reproducible."""
    scored = subs.join(F.broadcast(books), "sub").select(
        "sub",
        F.col(pid),
        F.col("cent_id"),
        F.round(l2sq("pvec", "cvec"), 6).alias("d"),
    )
    w = Window.partitionBy("sub", pid).orderBy(F.asc("d"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("sub", pid, F.col("cent_id").alias("code"))
    )


def pq_codebooks(
    vecs: DataFrame,
    m: int = 4,
    ksub: int = 8,
    kmeans_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, cent_id, cvec ARRAY<DOUBLE>) — product-quantization codebooks:
    an independent ``ksub``-codeword Lloyd k-means per subspace, all ``m``
    subspaces trained in ONE DataFrame job (everything keyed by ``sub``).

    Same determinism contract as ivf_centroids so the DuckDB oracle
    replays the trajectory exactly: seeds = the ``ksub`` smallest ids
    present (their subvectors seed every subspace), assignment by rounded
    squared-L2 ascending (ties → smaller cent_id), update = per-dim mean
    rounded 6 dp. PQ uses L2 — the textbook objective (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
    where IVF here uses cosine.

    Scale: the codebook is m·ksub·(dim/m) = ksub·dim doubles — a broadcast
    constant; training shuffles n·dim (sub, cell, dim, val) rows per
    iteration — linear, identical shape to one IVF update pass.
    """
    # the subvector explode feeds every training iteration (2x each) plus
    # the final assignment — cache it for the loop, drop it after the
    # (tiny: m*ksub rows) trained book is eagerly checkpointed, which also
    # truncates the iters-deep lineage for downstream consumers
    subs = _subvectors(
        vecs.select(F.col(id_col).alias("pid"), vec_col), "pid", vec_col, m, dim
    ).persist()
    seeds = vecs.select(F.col(id_col).alias("pid")).orderBy("pid").limit(ksub)
    books = subs.join(F.broadcast(seeds), "pid").select(
        "sub",
        F.col("pid").alias("cent_id"),
        F.transform(F.col("pvec"), lambda v: v.cast("double")).alias("cvec"),
    )
    for _ in range(kmeans_iters):
        assigned = _nearest_codes(subs, books, "pid")
        dims = subs.join(assigned, ["sub", "pid"]).select(
            "sub", F.col("code").alias("cell"), F.posexplode("pvec").alias("dim", "val")
        )
        books = (
            dims.groupBy("sub", "cell", "dim")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mval"))
            .groupBy("sub", F.col("cell").alias("cent_id"))
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mval"))).alias("dm"))
            .select(
                "sub", "cent_id", F.transform("dm", lambda s: s["mval"]).alias("cvec")
            )
        )
    books = books.localCheckpoint()
    subs.unpersist()
    return books


def pq_encode(
    vecs: DataFrame,
    books: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub, code) — each vector compressed to ``m`` codeword ids.

    This is the 100 TB point of PQ: a dim-float vector becomes m small
    ints (64 floats → 4 bytes here), so the code table for 10^10 vectors
    fits in ~40 GB — scannable wholesale where raw vectors are not.
    """
    subs = _subvectors(
        vecs.select(F.col(id_col).alias("pid"), vec_col), "pid", vec_col, m, dim
    )
    return _nearest_codes(subs, books, "pid").select(
        F.col("pid").alias(id_col), "sub", "code"
    )


def knn_pq(
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    m: int = 4,
    ksub: int = 8,
    kmeans_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC):
    dist(q, v) ≈ Σ_sub l2sq(q_sub, codeword(code_v[sub])). The query side
    stays exact (uncompressed); only the corpus is quantized.

    Output: (query_id, neighbor_id, dist, knn_rank) — rank ascending by
    rounded distance, ties by neighbor_id, so both engines agree.

    Scale shape: the per-query work is a |queries|·m·ksub distance TABLE
    (broadcast-joined to the code list) + one groupBy over candidate
    codes — never a join against raw corpus vectors. Per-sub distances
    are rounded 6 dp before the sum, so the total is a sum of exact
    6-dp terms — deterministic across engines.
    """
    books = pq_codebooks(vecs, m, ksub, kmeans_iters, dim, id_col, vec_col)
    codes = pq_encode(vecs, books, m, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "sub", "code"
    )
    qsubs = _subvectors(
        queries.select(F.col("query_id"), F.col("qvec").alias(vec_col)),
        "query_id", vec_col, m, dim,
    )
    dtab = qsubs.join(F.broadcast(books), "sub").select(
        "query_id",
        "sub",
        F.col("cent_id").alias("code"),
        F.round(l2sq("pvec", "cvec"), 6).alias("d"),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 6).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def knn_ivfpq(
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    num_cells: int = 4,
    m: int = 4,
    ksub: int = 8,
    kmeans_iters: int = 2,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC — the canonical billion-scale ANN layout (Jégou et al. 2011,
    §IV; what FAISS calls IVFx,PQy): a coarse L2 k-means splits the corpus
    into ``num_cells`` inverted lists, every vector stores only the PQ
    codes of its RESIDUAL (v − cell centroid), and a query scans just its
    ``nprobe`` nearest cells, ranking by asymmetric distance between ITS
    residual per probed cell and the candidates' codewords.

    Composition of existing pieces, all engine-deterministic:
    - coarse quantizer = ``pq_codebooks(m=1, ksub=num_cells)`` — a whole-
      vector L2 Lloyd k-means (seeds = smallest ids, rounded-L2 ties →
      smaller cent_id, 6-dp means);
    - residuals = exact IEEE double subtraction v − centroid (no rounding
      needed: both engines subtract identical doubles);
    - one shared PQ codebook set trained on the residuals.

    The probe restriction AND the ADC table lookup are ONE equi-join on
    (cell, sub, code): a candidate appears iff its cell is probed, and
    then contributes exactly its m codeword distances. No cartesian
    product, no raw-vector scan at query time — at 10^10 vectors the
    per-query work is |probed cells| × m × ksub table entries plus a
    hash join against the (int, int, int) code list.

    Output: (query_id, neighbor_id, dist, knn_rank), rank ascending by
    rounded distance, ties by neighbor_id.
    """
    coarse = pq_codebooks(
        vecs, 1, num_cells, kmeans_iters, dim, id_col, vec_col
    )
    # train-once artifacts, each consumed by 2+ downstream branches of the
    # final query plan — eager checkpoints compute them exactly once and
    # keep the double-k-means lineage out of the serving join
    cells = pq_encode(vecs, coarse, 1, dim, id_col, vec_col).select(
        F.col(id_col), F.col("code").alias("cell")
    ).localCheckpoint()
    cc = coarse.select(F.col("cent_id").alias("cell"), F.col("cvec").alias("ccvec"))
    resid = (
        vecs.join(cells, id_col)
        .join(F.broadcast(cc), "cell")
        .select(
            F.col(id_col),
            "cell",
            F.zip_with(
                F.col(vec_col), F.col("ccvec"), lambda x, y: x.cast("double") - y
            ).alias("rvec"),
        )
    ).localCheckpoint()
    books = pq_codebooks(resid, m, ksub, kmeans_iters, dim, id_col, "rvec")
    codes = pq_encode(resid, books, m, dim, id_col, "rvec")

    # query probes its nprobe nearest coarse cells by rounded L2
    qscore = queries.select("query_id", "qvec").join(F.broadcast(coarse)).select(
        "query_id",
        "cent_id",
        F.round(l2sq("qvec", "cvec"), 6).alias("d"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cent_id"))
    probe = (
        qscore.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"))
    )
    qres = (
        queries.select("query_id", "qvec")
        .join(probe, "query_id")
        .join(F.broadcast(cc), "cell")
        .select(
            "query_id",
            "cell",
            F.zip_with(
                F.col("qvec"), F.col("ccvec"), lambda x, y: x.cast("double") - y
            ).alias("rqvec"),
        )
    )
    qrsubs = qres.select(
        "query_id", "cell", F.posexplode(_slice_array("rqvec", m, dim)).alias("sub", "pvec")
    )
    dtab = qrsubs.join(F.broadcast(books), "sub").select(
        "query_id",
        "cell",
        "sub",
        F.col("cent_id").alias("code"),
        F.round(l2sq("pvec", "cvec"), 6).alias("d"),
    )
    cand = codes.select(
        F.col(id_col).alias("neighbor_id"), "sub", "code"
    ).join(
        cells.select(F.col(id_col).alias("neighbor_id"), "cell"), "neighbor_id"
    )
    scored = (
        cand.join(F.broadcast(dtab), ["cell", "sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 6).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def knn_ivf_stored(
    spark,
    name: str,
    queries: DataFrame,
    k: int,
    nprobe: int | None = None,
) -> DataFrame:
    """Query a ``build_ivf_index`` index: same output contract as
    ``knn_ivf`` (query_id, neighbor_id, score, knn_rank), but the
    centroids and cell assignments come from the stored tables — no
    re-clustering — and the candidate scan is restricted to the probed
    cells with an IN-list the planner turns into PARTITION PRUNING
    (the probed cell ids are collected to the driver first: |queries| x
    nprobe distinct ids, the standard serving pattern).
    """
    cents = spark.read.table(name + "_centroids")
    if nprobe is None:
        nprobe = derive_nprobe(cents.count())
    probe = _nearest_cells(
        queries.select("query_id", "qvec"), cents, nprobe,
        "query_id", "qvec",
    ).select("query_id", "cell")
    probed = sorted(
        r["cell"] for r in probe.select("cell").distinct().collect()
    )
    cand = (
        spark.read.table(name + "_cells")
        .where(F.col("cell").isin(probed))
        .select(F.col("vid").alias("neighbor_id"),
                F.col("v").alias("cvec2"), "cell")
    )
    q = F.broadcast(queries.select("query_id", "qvec").join(probe, "query_id"))
    scored = q.join(
        cand,
        (q["cell"] == cand["cell"])
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine("qvec", "cvec2"), 6).alias("score"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )
