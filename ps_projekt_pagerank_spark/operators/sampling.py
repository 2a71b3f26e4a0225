"""Graph sampling for training-data pipelines: deterministic random-walk
corpus generation (the DeepWalk/node2vec input stage — Perozzi et al.
KDD'14) and k-hop ego-network extraction.

Walks use md5-derived choices — next hop from ``cur`` is the out-neighbor
minimizing md5(walk_id # step # dst) — so any engine with md5 reproduces
the corpus exactly (same trick as the minhash/simhash/LSH families), while
the choice is still uniform over neighbors per (walk, step).

Scale: one walk step is an |active-walks|-row equi-join against the edge
table on cur = src plus a per-walk argmin agg — linear in the frontier,
map-side combinable, never materializing more than walks × out-degree
candidate rows per step. Walk state carries only (walk_id, step, cur);
the corpus assembles once at the end with a single collect_list agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def random_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_node: int = 1,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(walk_id LONG, start LONG, walk ARRAY<LONG>) — one row per walk.

    Walks start at every node (or at ``starts`` (id LONG) if given), take
    up to ``walk_length`` deterministic-uniform steps along out-edges, and
    truncate early at sinks — exactly DeepWalk's corpus semantics with the
    RNG replaced by md5 so runs (and SQL twins) are reproducible.
    """
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if starts is None:
        starts = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    # (walk_id, start, cur) for w = 0..walks_per_node-1 per start node
    walks = starts.crossJoin(
        F.broadcast(
            starts.sparkSession.range(walks_per_node).select(
                F.col("id").alias("w")
            )
        )
    ).select(
        (F.col("id") * walks_per_node + F.col("w")).alias("walk_id"),
        F.col("id").alias("start"),
        F.col("id").alias("cur"),
    )

    steps = [
        walks.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    ]
    frontier = walks.select("walk_id", "cur").localCheckpoint(eager=True)
    for step in range(1, walk_length + 1):
        nxt = (
            frontier.join(e, frontier["cur"] == e["src"])
            .groupBy("walk_id")
            .agg(
                F.min(
                    F.struct(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("walk_id"),
                                F.lit(step),
                                F.col("dst"),
                            )
                        ).alias("h"),
                        F.col("dst").alias("d"),
                    )
                )["d"].alias("cur")
            )
            .localCheckpoint(eager=True)  # sinks drop out: walk truncates
        )
        steps.append(
            nxt.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("node"))
        )
        frontier = nxt
    allsteps = steps[0]
    for s in steps[1:]:
        allsteps = allsteps.unionAll(s)
    out = (
        allsteps.groupBy("walk_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "node"))),
                lambda s: s["node"],
            ).alias("walk")
        )
        .select("walk_id", F.element_at("walk", 1).alias("start"), "walk")
    )
    e.unpersist(blocking=False)
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs) — the word2vec-style training artifact
    over a ``random_walks`` corpus: co-occurrence counts of nodes within
    ``window`` positions on the same walk (the input SGNS / GloVe-style
    embedding training consumes; DeepWalk = random_walks ∘ skip-gram,
    Perozzi et al. KDD 2014 §4). Symmetric window (center earlier or later
    both emit, as in word2vec), self-positions excluded.

    Scale: posexplode the walk arrays, self-equi-join on walk_id (walks
    are short — fan-out ≤ walk_length·2·window per walk), one hash agg.
    """
    if window < 1:
        raise ValueError("window >= 1")
    steps = walks.select(
        "walk_id", F.posexplode("walk").alias("step", "node")
    )
    a = steps.select(
        "walk_id", F.col("step").alias("s1"), F.col("node").alias("center")
    )
    b = steps.select(
        "walk_id", F.col("step").alias("s2"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("s1") != F.col("s2"))
            & (F.abs(F.col("s1") - F.col("s2")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
    )


def ego_network(
    edges: DataFrame,
    seeds: list[int],
    hops: int,
    undirected: bool = False,
) -> DataFrame:
    """(src, dst) — the subgraph induced on nodes within ``hops`` edge
    traversals of any seed (seeds broadcast; frontier expansion is one
    semi-join per hop, then one induced-edge filter join at the end)."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    walkable = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        if undirected
        else e
    ).persist(StorageLevel.MEMORY_AND_DISK)
    visited = spark.createDataFrame([(int(s),) for s in seeds], "id LONG")
    frontier = visited
    for _ in range(hops):
        frontier = (
            walkable.join(
                F.broadcast(frontier), walkable["src"] == frontier["id"]
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(F.broadcast(visited), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(frontier).localCheckpoint(eager=True)
    ids = F.broadcast(visited)
    out = (
        e.join(ids.withColumnRenamed("id", "src"), "src")
        .join(ids.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
    )
    walkable.unpersist(blocking=False)
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff the
    first 8 md5 nibbles of its key (a uniform 32-bit value) fall below its
    stratum's fraction. Rows whose stratum is absent from ``fractions``
    are dropped.

    No RNG and no seed plumbing: the same row samples the same way at any
    parallelism, on re-runs, and in any engine with md5 — exactly what a
    resumable 100 TB corpus-mixing pipeline needs (language/source
    rebalancing that backfills and incremental runs reproduce bit-for-bit;
    ``salt`` gives independent draws for disjoint sampling passes).

    Scale: a pure per-row filter — no shuffle, no state; Catalyst pushes
    the stratum IN-list into the scan.
    """
    key_cols = key_cols or [df.columns[0]]
    key = F.concat_ws(
        "#", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )
    # 32-bit integers are exact in doubles and /2^32 is a pure exponent
    # shift, so the uniform — and the < comparison — is engine-exact
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )
    frac = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    return df.where(u < frac[F.col(strata_col)])


def weighted_bernoulli_sample(
    df: DataFrame,
    prob_col: str,
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its md5-uniform
    draw falls below the row's OWN keep probability (a double in [0,1] —
    e.g. a quality score). The continuous-weight sibling of
    ``stratified_sample``'s fixed per-stratum fractions: this is how a
    corpus-mixing pipeline upsamples high-quality documents (keep p=1)
    while thinning boilerplate (keep p=0.1) in one pass.

    Same determinism contract as stratified_sample: no RNG, the same row
    samples identically at any parallelism, on re-runs, and in any engine
    with md5; ``salt`` gives independent draws per pass. Scale: a pure
    per-row filter — no shuffle, no state.
    """
    key_cols = key_cols or [df.columns[0]]
    key = F.concat_ws(
        "#", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )
    return df.where(u < F.col(prob_col).cast("double"))


def corpus_splits(
    df: DataFrame,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """``df`` plus a ``split`` column — deterministic train/val/test
    assignment: the row's md5-uniform draw is binned by cumulative
    ``fractions`` (insertion order; must sum to <= 1, any remainder maps
    to the LAST split). The split a row lands in never changes across
    re-runs, backfills, engines, or parallelism — the leakage-proof
    property an eval holdout actually requires (a new training run must
    never see yesterday's val docs).

    Scale: a pure per-row projection — no shuffle, no state.
    """
    if not fractions:
        raise ValueError("corpus_splits needs >= 1 named fraction")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    key_cols = key_cols or [df.columns[0]]
    key = F.concat_ws(
        "#", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )
    names = list(fractions)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for name, frac in fractions.items():
        cum += float(frac)
        bounds.append((name, cum))
    for name, bound in reversed(bounds[:-1]):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    # rows above the last bound also land in the last split (remainder)
    return df.select("*", expr.alias("split"))


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
) -> DataFrame:
    """``df`` filtered to each group's top-``k`` rows by ``order_col``
    descending (ties broken by ``tiebreak_col`` ascending), plus a
    ``rank_in_group`` column — best pages per host, best docs per
    language, canonical URL per duplicate cluster.

    Scale: ONE window partitioned by the group key — each partition is
    one group, so this is the safe windowed shape (never a global sort);
    a skewed giant group degrades to that group's sort only. Exact
    cross-engine ordering requires ``order_col``/``tiebreak_col`` to be
    integer-valued or pre-rounded.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return df.select(
        "*", F.row_number().over(w).alias("rank_in_group")
    ).where(F.col("rank_in_group") <= int(k))


def mixture_weights(
    docs: DataFrame, group_col: str = "lang", budget: int = 100_000
) -> DataFrame:
    """(group, n_docs BIGINT, weight DOUBLE, target_docs DOUBLE) —
    temperature-scaled corpus mixing weights (alpha = 0.5, i.e. the
    sqrt-rebalancing mT5/XLM-R use to keep head languages from drowning
    the tail):

        weight(g)      = sqrt(n_g) / Σ_h sqrt(n_h)
        target_docs(g) = weight(g) · budget

    The exponent is fixed at 1/2 on purpose: sqrt is correctly-rounded
    IEEE in both Spark and DuckDB, so the weights are engine-exact before
    the final 9-dp rounding (general pow() makes no such promise).

    Scale shape: ONE hash agg over the corpus (map-side combine) to a
    |groups|-row table, then a broadcast scalar join. The downstream
    sampler is weighted_bernoulli_sample with keep_p = target/n.
    """
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("_z")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.round(
                F.sqrt(F.col("n_docs").cast("double")) / F.col("_z"), 9
            ).alias("weight"),
            F.round(
                F.lit(float(budget))
                * F.sqrt(F.col("n_docs").cast("double"))
                / F.col("_z"),
                6,
            ).alias("target_docs"),
        )
    )


def mixture_weights_sql(
    docs_expr: str, group_col: str = "lang", budget: int = 100_000
) -> str:
    """DuckDB twin of mixture_weights."""
    return (
        f"WITH counts AS (SELECT {group_col} AS grp, count(*) AS n_docs "
        f"FROM ({docs_expr}) GROUP BY {group_col}), "
        "tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z FROM counts) "
        f"SELECT grp AS {group_col}, n_docs, "
        "round(sqrt(CAST(n_docs AS DOUBLE)) / tot.z, 9) AS weight, "
        f"round({float(budget)} * sqrt(CAST(n_docs AS DOUBLE)) / tot.z, 6) "
        "AS target_docs FROM counts, tot"
    )
