"""Deduplication family for training-data pipelines (north-rule /
training-pipeline extension; graded as first-class components).

Five strategies over a ``documents(doc_id LONG, text STRING, ...)`` table,
each shuffle-aware and expressed in built-in DataFrame ops (the only hash
primitives used — md5/xxhash64 — are JVM built-ins):

- exact:          hash-groupBy on md5(text); survivors = min doc_id
- minhash + LSH:  token shingles → k md5-min signatures → banded bucket
                  join → candidate pairs (never the O(n²) cross join)
- simhash:        per-token 64-bit hash, bitwise majority → hamming buckets
- n-gram jaccard: exact token-set jaccard, but only WITHIN LSH candidate
                  pairs (or a bounded id range) — the verification stage
- embedding near-dup: cosine over an embedding column via functions.vectors

Scale notes: every strategy reduces to groupBy/join on a bounded key
(hash, band, bucket), so partial aggregation + AQE skew handling apply;
nothing materializes the quadratic pair space except inside a bucket —
bucket width (bands/rows) is the knob that trades recall for shuffle size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash, n_docs, keep_id) one row per distinct text; n_docs>1 rows
    are duplicate groups, keep_id the survivor (min doc_id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, tok) distinct lowercase whitespace tokens."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "").distinct()


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 4
) -> DataFrame:
    """(doc_id, s0..s{k-1}) — signature i = min over tokens of
    md5(token || '#i'). String-min of md5 hex is a valid uniform minhash
    and is reproducible in any engine with md5 (the SQL oracle runs the
    identical expression)."""
    toks = _doc_tokens(docs, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")).cast("binary"))).alias(
            f"s{i}"
        )
        for i in range(num_hashes)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id_a, id_b) candidate near-duplicate pairs: docs sharing at least
    one LSH band (band = concatenation of ``rows_per_band`` signatures).
    The join is per-band on the band value — buckets, never cross join."""
    sigs = minhash_signatures(docs, text_col, num_hashes)
    n_bands = num_hashes // rows_per_band
    bands = None
    for b in range(n_bands):
        cols = [f"s{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        one = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("|", *cols).alias("band_val"),
        )
        bands = one if bands is None else bands.unionAll(one)
    a = bands.select(
        F.col("band"), F.col("band_val"), F.col("doc_id").alias("id_a")
    )
    b_ = bands.select(
        F.col("band").alias("band2"),
        F.col("band_val").alias("band_val2"),
        F.col("doc_id").alias("id_b"),
    )
    return (
        a.join(
            b_,
            (F.col("band") == F.col("band2"))
            & (F.col("band_val") == F.col("band_val2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def _pair_intersections(
    toks: DataFrame,
    candidates: DataFrame | None,
    max_token_df: int | None,
) -> DataFrame:
    """(id_a, id_b, inter) — shared-token counts per pair, candidate-driven
    when ``candidates`` is given, else via the df-capped token-bucket
    self-join (see token_jaccard_pairs for the cap contract)."""
    if candidates is not None:
        ta = toks.select(F.col("doc_id").alias("id_a"), "tok")
        tb = toks.select(F.col("doc_id").alias("id_b"), "tok")
        return (
            candidates.select("id_a", "id_b")
            .join(ta, "id_a")
            .join(tb, ["id_b", "tok"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    if max_token_df is not None:
        df_ok = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_token_df)
            .select("tok")
        )
        toks_j = toks.join(df_ok, "tok", "left_semi")
    else:
        toks_j = toks
    ta = toks_j.select(F.col("doc_id").alias("id_a"), "tok")
    tb = toks_j.select(
        F.col("doc_id").alias("id_b"), F.col("tok").alias("tok2")
    )
    return (
        ta.join(
            tb,
            (F.col("tok") == F.col("tok2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )


def token_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_token_df: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) exact token-set jaccard ≥ threshold.

    With ``candidates`` (e.g. minhash_lsh_pairs output) intersections are
    computed candidate-driven — explode each pair by its a-side tokens and
    probe the b-side with an equi-join on (id_b, tok) — so the pair space
    is |candidates|, never the token-bucket blowup. Without candidates,
    all pairs sharing ≥1 token are scored via a token-bucket self-join;
    ``max_token_df`` caps the document frequency of join tokens there so
    no stopword becomes a quadratic bucket — the default is FINITE (1000)
    on purpose: the uncapped self-join is O(Σ df²) and must be opted into
    with ``max_token_df=None``. Tokens above the cap are skipped for
    intersection but still count toward the union, so jaccard is a
    documented underestimate on runs where the cap engages (a pair whose
    every shared token is capped can be missed entirely)."""
    toks = _doc_tokens(docs, text_col)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = _pair_intersections(toks, candidates, max_token_df)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def token_overlap_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_token_df: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, overlap) — overlap coefficient |A∩B| / min(|A|,|B|)
    over distinct token sets, ≥ threshold. Catches CONTAINMENT dups —
    a short page quoted wholesale inside a longer one scores ~1.0 here
    while its jaccard stays low (the long side inflates the union) — the
    asymmetric-duplication case jaccard-only dedup misses. Same
    candidate-driven scale shape as token_jaccard_pairs (feed it
    minhash_lsh_pairs output); the bucket-join fallback inherits the
    max_token_df cap contract documented there."""
    toks = _doc_tokens(docs, text_col)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = _pair_intersections(toks, candidates, max_token_df)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / F.least("sz_a", "sz_b").cast("double"), 6
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= threshold)
    )


def token_overlap_pairs_sql(
    docs_sql: str, threshold: float, max_token_df: int = 1000
) -> str:
    """DuckDB twin of token_overlap_pairs' bucket-join fallback — same
    distinct-lowercase-token derivation, df cap, least-size denominator,
    1e-6 rounding."""
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
        "unnest(string_split(lower(text), ' ')) AS tok "
        f"FROM ({docs_sql})) WHERE tok <> ''), "
        "dfok AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM toks "
        f"GROUP BY tok) WHERE df <= {int(max_token_df)}), "
        "tj AS (SELECT t.doc_id, t.tok FROM toks t JOIN dfok USING (tok)), "
        "sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "count(*) AS i FROM tj a JOIN tj b ON a.tok = b.tok "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT id_a, id_b, overlap FROM (SELECT id_a, id_b, "
        "round(i / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS overlap "
        "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
        "JOIN sizes sb ON sb.doc_id = id_b) "
        f"WHERE overlap >= {threshold}"
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) 64-bit SimHash: per distinct token xxhash64, each
    bit votes +1/-1, sign of the vote is the fingerprint bit. Built from
    shiftright/bitwise built-ins — no UDF."""
    toks = _doc_tokens(docs, text_col).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, text_col: str = "text"
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within ``max_hamming`` bits, bucketed by
    16-bit simhash quadrants (a pair ≤3 bits apart shares ≥1 of 4 quadrants
    by pigeonhole when max_hamming ≤ 3; wider radii trade recall)."""
    sh = simhash64(docs, text_col)
    quads = None
    for q in range(4):
        one = sh.select(
            "doc_id",
            "simhash",
            F.lit(q).alias("quad"),
            F.shiftright("simhash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qval"),
        )
        quads = one if quads is None else quads.unionAll(one)
    a = quads.select(
        "quad", "qval", F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha")
    )
    b = quads.select(
        F.col("quad").alias("quad2"),
        F.col("qval").alias("qval2"),
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("hb"),
    )
    pairs = a.join(
        b,
        (F.col("quad") == F.col("quad2"))
        & (F.col("qval") == F.col("qval2"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")).distinct()
    return pairs.where(F.col("hamming") <= max_hamming)


def _md5_nibble(hex_col, j: int) -> Column:
    """Nibble j (0-based, 0..15) of a hex string column as INT 0..15."""
    return F.conv(F.substring(hex_col, j + 1, 1), 16, 10).cast("int")


def simhash_hex(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash CHAR(16) hex) — SimHash with an md5 bit source.

    Engine-portable twin of ``simhash64``: per-token bits come from the
    first 16 nibbles of md5(token) instead of xxhash64 (Spark-only), and
    the fingerprint is emitted as a 16-char hex STRING (a 64-bit LONG would
    need ``1 << 63``, which overflows ANSI BIGINT). Same vote/majority
    semantics; the DuckDB oracle replays it bit-for-bit. xxhash64 stays the
    fast default for production paths — this variant exists so the
    correctness gate can hash-compare the operator across engines."""
    toks = _doc_tokens(docs, text_col).select(
        "doc_id", F.md5(F.col("tok").cast("binary")).alias("h")
    )
    nibs = toks.select(
        "doc_id", *[_md5_nibble("h", j).alias(f"n{j}") for j in range(16)]
    )
    bit_votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"n{i // 4}"), i % 4).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = nibs.groupBy("doc_id").agg(*bit_votes)
    chars = []
    for j in range(16):
        val = sum(
            (
                F.when(F.col(f"b{4 * j + k}") > 0, F.lit(1 << k)).otherwise(
                    F.lit(0)
                )
            )
            for k in range(4)
        )
        # 0..15 -> hex char; conv(10->16) yields uppercase A-F, lower() it
        chars.append(F.lower(F.conv(val.cast("string"), 10, 16)))
    return votes.select("doc_id", F.concat(*chars).alias("simhash"))


def simhash_near_pairs_hex(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """(id_a, id_b, hamming) — quadrant-bucketed near pairs over the
    md5-variant hex fingerprints (same pigeonhole guarantee as
    simhash_near_pairs: a pair ≤3 bits apart shares ≥1 of 4 quadrants).
    Hamming is summed nibble-wise (bit_count of per-nibble xor), identical
    arithmetic in any ANSI engine."""
    sh = simhash_hex(docs, text_col)
    quads = None
    for q in range(4):
        one = sh.select(
            "doc_id",
            "simhash",
            F.lit(q).alias("quad"),
            F.substring("simhash", q * 4 + 1, 4).alias("qval"),
        )
        quads = one if quads is None else quads.unionAll(one)
    a = quads.select(
        "quad", "qval", F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("fa"),
    )
    b = quads.select(
        F.col("quad").alias("quad2"),
        F.col("qval").alias("qval2"),
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("fb"),
    )
    ham = sum(
        F.bit_count(
            _md5_nibble("fa", j).bitwiseXOR(_md5_nibble("fb", j))
        )
        for j in range(16)
    )
    pairs = (
        a.join(
            b,
            (F.col("quad") == F.col("quad2"))
            & (F.col("qval") == F.col("qval2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 2,
) -> DataFrame:
    """(id_a, id_b) embedding-cosine near-duplicates above threshold.

    Bucketed, never all-pairs: every vector is assigned to its ``nprobe``
    nearest IVF cells (deterministic k-means centroids, so the DuckDB
    oracle replays the identical cells — unlike the xxhash64 LSH path),
    candidate pairs share ≥1 cell, and cosine is scored only within
    buckets. The pair space is O(Σ cell²/num_centroids), not O(n²); recall
    is governed by nprobe (near-identical vectors share their nearest
    cells). ``embedding_neardup_pairs_bruteforce`` is the exactness oracle
    for recall tests at small scale."""
    from .similarity import _nearest_cells, ivf_centroids

    cents = ivf_centroids(vecs, num_centroids, kmeans_iters, id_col, vec_col)
    cells = _nearest_cells(
        vecs.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("pvec")),
        cents, nprobe, "pid", "pvec",
    ).select("pid", "cell")
    return _cell_cosine_pairs(cells, vecs, threshold, id_col, vec_col)


def _cell_cosine_pairs(
    cells: DataFrame,
    vecs: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    max_cell_rows: int = 4096,
) -> DataFrame:
    """(id_a, id_b) above-threshold cosine pairs sharing >=1 cell.

    Cell-partitioned SHUFFLE join — neither side is ever broadcast, so
    the plan survives corpora where the vector table is O(10⁹) rows
    (a broadcast of the corpus side would hit Spark's 8 GB table limit
    and the driver's memory long before that). Both sides repartition
    by the composite bucket key with an EXPLICIT partition count
    (REPARTITION_BY_NUM), which (a) lets the join reuse the exchange
    (EnsureRequirements sees the required hash distribution already
    satisfied) and (b) pins AQE so it cannot coalesce the byte-small
    probe shuffle into one task that would score the whole pair space.

    Oversized cells sub-bucket (triangle self-join partitioning): a
    cell with n > ``max_cell_rows`` members splits into s = ⌈n/max⌉
    hash sub-buckets; side A in bucket g covers keys (g, j) for j ≥ g,
    side B in bucket g covers keys (i, g) for i ≤ g, so every unordered
    member pair is scored under exactly ONE (cell, i, j) key — total
    comparisons stay n²/2 while the largest single task shrinks from n²
    to (n/s)². Same pattern as the gather salting in
    ``graph.build_graph``; for cells ≤ max the key degenerates to
    (cell, g, g) with zero replication. The output pair SET is a pure
    re-partitioning of the same candidate space, so the DuckDB twin
    (cell-share + cosine, no buckets) is unchanged.

    Cost controls kept from the previous revision: norms precompute per
    VECTOR, not per pair — cosine(a,b) = dot/(‖a‖·‖b‖) is one zip_with
    traversal per pair instead of three (higher-order array lambdas are
    interpreted, not codegen'd), bit-identical doubles so the gate is
    unaffected.
    """
    vn = vecs.select(
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("pvec"),
        norm(vec_col).alias("pnorm"),
    )
    cv = cells.join(vn, "pid")
    # K·nprobe rows — the only broadcast left in this plan, and it is
    # size-bounded by the centroid count, not the corpus. Counted over
    # `cells` alone (one vn row per pid makes cv counts identical) so
    # deriving nsub never replays the corpus-wide vector join.
    sizes = cells.groupBy("cell").agg(
        F.greatest(F.lit(1), F.ceil(F.count("*") / max_cell_rows))
        .cast("int")
        .alias("nsub")
    )
    cvb = cv.join(F.broadcast(sizes), "cell").withColumn(
        "g", F.pmod(F.xxhash64("pid"), F.col("nsub")).cast("int")
    )
    p = int(cv.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = (
        cvb.select(
            "cell",
            F.col("g").alias("bi"),
            "nsub",
            F.col("pid").alias("id_a"),
            F.col("pvec").alias("va"),
            F.col("pnorm").alias("na"),
        )
        .withColumn("bj", F.explode(F.sequence("bi", F.col("nsub") - 1)))
        .repartition(p, "cell", "bi", "bj")
    )
    b = (
        cvb.select(
            F.col("cell").alias("cell2"),
            F.col("g").alias("bj2"),
            F.col("pid").alias("id_b"),
            F.col("pvec").alias("vb"),
            F.col("pnorm").alias("nb"),
        )
        .withColumn("bi2", F.explode(F.sequence(F.lit(0), F.col("bj2"))))
        .repartition(p, "cell2", "bi2", "bj2")
    )
    return (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("cell") == F.col("cell2"))
            & (F.col("bi") == F.col("bi2"))
            & (F.col("bj") == F.col("bj2")),
        )
        # off-diagonal keys see each unordered pair once (orientation is
        # bucket-determined, not id-determined); the diagonal sees both
        # orientations, so only there the id order dedups.
        .where((F.col("bi") < F.col("bj")) | (F.col("id_a") < F.col("id_b")))
        .where(dot("va", "vb") / (F.col("na") * F.col("nb")) > threshold)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )


def embedding_neardup_pairs_bruteforce(
    vecs: DataFrame, threshold: float, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact twin of embedding_neardup_pairs — O(n²), test-scale
    recall oracle only; never wire into a gate/bench path."""
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(cosine("va", "vb") > threshold)
        .select("id_a", "id_b")
    )


def semdedup(
    vecs: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 2,
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id, survivor_id, centroid_sim, is_duplicate) —
    SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    groups from embedding cosine, ONE survivor per group = the member
    FARTHEST from its k-means cell centroid (the paper keeps each
    group's low-similarity outlier to preserve corpus diversity); ties
    break to the smaller id. Documented simplification vs the paper:
    dup groups are the transitive closure of above-threshold pairs
    (cluster-bucketed, like ``dedup_survivors``) rather than per-cell
    ε-ball stars — closure is order-independent, hence deterministic.

    Built from this module's existing stages sharing ONE k-means build:
    deterministic IVF cells (``ivf_centroids``) bucket the candidate
    pairs (never all-pairs — the ``embedding_neardup_pairs`` plan), the
    pair graph closes with min-label components, and the survivor
    arg-min rides a printf key on the nano-int home-cell cosine (the
    ``dedup_survivors`` trick — no window, groups are dup-sized).

    Scale: one k-means train (K rows broadcast), one cell-bucketed
    self-join for candidates, a tiny-pair-graph closure, and two hash
    aggs — every stage linear in |vecs| + |candidate pairs|.
    """
    from .components import connected_components
    from .similarity import _nearest_cells, ivf_centroids

    cents = ivf_centroids(vecs, num_centroids, kmeans_iters, id_col, vec_col)
    pts = vecs.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("pvec"))
    cells = _nearest_cells(pts, cents, nprobe, "pid", "pvec")
    pairs = _cell_cosine_pairs(
        cells.select("pid", "cell"), vecs, threshold, id_col, vec_col
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        max_rounds=max_rounds,
    ).select(F.col("id").alias("doc_id"), "component")
    home = cells.where(F.col("cell_rank") == 1).select(
        F.col("pid").alias("doc_id"), F.col("cscore").alias("centroid_sim")
    )
    assign = (
        vecs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .join(home, "doc_id")
    )
    # nano-int key: cscore is already rounded 6 dp, so ×1e6 is integral
    # up to FP noise; round() lands both engines on the same BIGINT.
    simkey = F.round(F.col("centroid_sim") * 1e6).cast("long") + F.lit(
        1_000_000
    )
    key = F.concat(
        F.format_string("%07d", simkey),
        F.lit("#"),
        F.format_string("%020d", F.col("doc_id")),
    )
    surv = assign.groupBy("cluster_id").agg(
        F.substring(F.min(key), 9, 20).cast("long").alias("survivor_id")
    )
    return assign.join(surv, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "survivor_id",
        "centroid_sim",
        (F.col("doc_id") != F.col("survivor_id")).alias("is_duplicate"),
    )


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    pairs: DataFrame | None = None,
    num_hashes: int = 4,
    rows_per_band: int = 2,
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id, is_duplicate) — the end product of a training-
    data dedup stage: near-duplicate pairs grouped into clusters, one
    survivor per cluster (the min doc_id, which min-label components makes
    the cluster id), everything else flagged for dropping.

    ``pairs`` defaults to ``minhash_lsh_pairs``; pass your own (e.g. the
    jaccard-verified subset, or simhash/embedding pairs) to change the
    similarity notion without changing the clustering.

    Scale: the pair graph is tiny relative to the corpus (only candidate
    pairs), and near-dup clusters have hop-diameter ~1-3, so min-label
    propagation converges in a handful of |pairs|-row rounds; docs outside
    every pair never enter the iteration — they join back as singleton
    clusters at the end (one broadcast-friendly left join).
    """
    from .components import connected_components

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, text_col, num_hashes, rows_per_band)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        max_rounds=max_rounds,
    ).select(F.col("id").alias("doc_id"), "component")
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_duplicate", F.col("doc_id") != F.col("cluster_id"))
    )


def leakage_safe_split(
    docs: DataFrame,
    test_frac: float = 0.1,
    text_col: str = "text",
    pairs: DataFrame | None = None,
    salt: str = "split",
) -> DataFrame:
    """(doc_id, cluster_id, is_duplicate, split) — train/test split BY
    DEDUP CLUSTER: every member of a near-duplicate cluster lands on the
    same side, so a near-copy of a test document can never leak into
    training. This is the remediation op to what benchmark_contamination
    DETECTS — splitting by raw doc_id (the naive approach) puts ~half of
    each duplicate cluster's members across the boundary.

    The draw is the md5-uniform of the CLUSTER id (the stratified_sample
    trick: first 8 md5 hex chars → a 32-bit int, exact in doubles), so
    the split is deterministic, engine-replayable, and independent of
    corpus order or partitioning.

    Scale: dedup_clusters' candidate-pair closure plus one narrow
    projection — no extra shuffle beyond the clustering itself.
    """
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac in [0, 1]")
    clusters = dedup_clusters(docs, text_col, pairs)
    key = F.concat_ws("#", F.col("cluster_id").cast("string"), F.lit(salt))
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        "is_duplicate",
        F.when(u < F.lit(float(test_frac)), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def dedup_survivors(
    docs: DataFrame,
    quality_col: str,
    text_col: str = "text",
    pairs: DataFrame | None = None,
    num_hashes: int = 4,
    rows_per_band: int = 2,
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id, survivor_id, is_duplicate) — dedup_clusters
    with the production survivor rule: keep the highest-QUALITY member of
    each near-dup cluster (tie → smallest doc_id) instead of the smallest
    id. ``quality_col`` must be integer-valued (e.g. n_chars, a token
    count, or a pre-bucketed score) so the arg-max is engine-exact.

    The per-cluster arg-max rides a printf sort key (inverted zero-padded
    quality + zero-padded doc_id) resolved by ONE min() hash agg — no
    window; clusters are near-dup-sized (tiny), so the agg never skews.
    """
    q = F.col(quality_col).cast("long")
    clustered = dedup_clusters(
        docs, text_col, pairs, num_hashes, rows_per_band, max_rounds
    ).join(docs.select("doc_id", q.alias("_q")), "doc_id")
    key = F.concat(
        F.format_string("%019d", F.lit(10**18) - F.col("_q")),
        F.lit("#"),
        F.format_string("%020d", F.col("doc_id")),
    )
    surv = clustered.groupBy("cluster_id").agg(
        F.substring(F.min(key), 21, 20).cast("long").alias("survivor_id")
    )
    return clustered.join(surv, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "survivor_id",
        (F.col("doc_id") != F.col("survivor_id")).alias("is_duplicate"),
    )


def chunk_dup_stats(
    docs: DataFrame, text_col: str = "text", chunk_tokens: int = 16
) -> DataFrame:
    """(doc_id, n_chunks, dup_chunks, dup_fraction) — CCNet-style
    chunk-level duplication: split each document into non-overlapping
    ``chunk_tokens``-token chunks, hash each chunk, and report per
    document how many of its chunks also occur elsewhere in the corpus
    (corpus frequency > 1). The paragraph/line-dedup signal an LLM
    training pipeline filters boilerplate with (CCNet, Wenzek et al.
    2020) — the corpus here has no newlines, so fixed-token chunks stand
    in for lines.

    Docs shorter than one chunk get n_chunks = 0 and a NULL fraction.
    dup_fraction is one IEEE int64/int64 division — engine-exact.

    Scale: one explode to ~|tokens|/chunk_tokens rows, a map-side-
    combinable hash agg for corpus chunk frequencies, one equi-join on
    the chunk hash (AQE handles the hot boilerplate chunks), and a
    per-doc agg. Nothing quadratic; no windows.
    """
    w = int(chunk_tokens)
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("toks")
    )
    n = F.floor(F.size("toks") / w).cast("int")
    chunks = toks.select(
        "doc_id",
        F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.concat_ws(
                    " ", F.slice("toks", i * w + 1, F.lit(w))
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("chunks"),
    )
    ch = chunks.select(
        "doc_id", F.explode("chunks").alias("chunk")
    ).select("doc_id", F.md5(F.col("chunk").cast("binary")).alias("h"))
    freq = ch.groupBy("h").agg(F.count("*").alias("c"))
    per = (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("c") > 1).cast("long")).alias("dup_chunks"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0).cast("long")).alias("n_chunks"),
        F.coalesce("dup_chunks", F.lit(0).cast("long")).alias("dup_chunks"),
        F.when(
            F.coalesce("n_chunks", F.lit(0).cast("long")) > 0,
            F.col("dup_chunks").cast("double")
            / F.col("n_chunks").cast("double"),
        ).alias("dup_fraction"),
    )


def chunk_dup_stats_sql(docs_sql: str, chunk_tokens: int = 16) -> str:
    """DuckDB twin of chunk_dup_stats — identical chunking (list_slice ==
    Spark slice on the verified single-spaced corpus), identical BIGINT
    moments, identical IEEE division."""
    w = int(chunk_tokens)
    return (
        f"WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks "
        f"FROM ({docs_sql})), "
        f"base AS (SELECT doc_id, CAST(floor(len(toks) / {w}) AS INT) "
        "AS nc, toks FROM d), "
        "ch AS (SELECT doc_id, md5(array_to_string("
        f"list_slice(toks, i * {w} + 1, i * {w} + {w}), ' ')) AS h "
        "FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM base)), "
        "freq AS (SELECT h, count(*) AS c FROM ch GROUP BY h), "
        "per AS (SELECT doc_id, count(*) AS n_chunks, "
        "CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS "
        "dup_chunks FROM ch JOIN freq USING (h) GROUP BY doc_id) "
        "SELECT b.doc_id, coalesce(p.n_chunks, 0) AS n_chunks, "
        "coalesce(p.dup_chunks, 0) AS dup_chunks, "
        "CASE WHEN coalesce(p.n_chunks, 0) > 0 THEN "
        "CAST(p.dup_chunks AS DOUBLE) / CAST(p.n_chunks AS DOUBLE) END "
        "AS dup_fraction "
        "FROM base b LEFT JOIN per p USING (doc_id)"
    )


def _dup_span_islands(
    docs: DataFrame, text_col: str, k: int, min_count: int
) -> DataFrame:
    """(doc_id, start, end) maximal duplicated spans — shared helper for
    duplicated_span_stats / remove_duplicated_spans.

    Every overlapping k-token shingle (stride 1) is hashed; a shingle is
    "duplicated" when its corpus-wide occurrence count (all positions in
    all docs, within-doc repeats included — the ExactSubstr counting rule
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") reaches ``min_count``. Hit positions per doc are
    merged gaps-and-islands style into maximal covered spans: because
    every hit covers exactly k tokens, coverage stays contiguous while
    consecutive sorted hits are <= k apart, so a lag-window over pos is
    sufficient (no max-end running state needed).

    Scale: |tokens| shingle rows → map-side-combinable hash agg for the
    corpus frequencies → one equi-join on the shingle hash (AQE splits
    the hot boilerplate shingles) → per-doc windows only (partitionBy
    doc_id). Nothing quadratic, no global windows.
    """
    from pyspark.sql.window import Window

    kk = int(k)
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("toks")
    )
    n_pos = (F.size("toks") - kk + 1).cast("int")
    sh = toks.select(
        "doc_id",
        F.when(
            n_pos > 0,
            F.transform(
                F.sequence(F.lit(0), n_pos - 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.slice("toks", i + 1, F.lit(kk))
                    ).cast("binary")
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("hs"),
    ).select("doc_id", F.posexplode("hs").alias("pos", "h"))
    freq = sh.groupBy("h").agg(F.count("*").alias("c"))
    hits = (
        sh.join(freq.where(F.col("c") >= int(min_count)), "h")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "brk",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > kk),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + kk - 1).alias("end"),
    )


def duplicated_span_stats(
    docs: DataFrame, text_col: str = "text", k: int = 8, min_count: int = 2
) -> DataFrame:
    """(doc_id, n_tokens, dup_spans, dup_tokens, dup_fraction) —
    ExactSubstr-style duplicated-span detection (Lee et al. 2022),
    k-gram-shingle approximation of the suffix-array method: per doc,
    how many maximal spans are covered by k-grams that occur >=
    ``min_count`` times corpus-wide, and what token fraction they cover.
    The reference's pipeline has no dedup stage; this extends the corpus
    toolbox the north rule asks for (web-scale training data).

    dup_fraction is one IEEE int64/int64 division — engine-exact against
    ``duplicated_span_stats_sql``.
    """
    spans = _dup_span_islands(docs, text_col, k, min_count)
    per = spans.groupBy("doc_id").agg(
        F.count("*").alias("dup_spans"),
        F.sum(F.col("end") - F.col("start") + 1).alias("dup_tokens"),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.split(F.col(text_col), " ")).cast("long").alias(
                "n_tokens"
            ),
        )
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0).cast("long")).alias(
                "dup_spans"
            ),
            F.coalesce(F.col("dup_tokens").cast("long"), F.lit(0).cast("long")).alias(
                "dup_tokens"
            ),
            (
                F.coalesce(F.col("dup_tokens").cast("long"), F.lit(0).cast("long")).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_fraction"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame, text_col: str = "text", k: int = 8, min_count: int = 2
) -> DataFrame:
    """(doc_id, clean_text, removed_tokens) — drop every token covered by
    a duplicated span (ALL occurrences go, per the ExactSubstr rule; the
    canonical copy, if one is wanted, is a survivor-selection concern —
    dedup_survivors). Token order is preserved; docs with nothing
    removed round-trip byte-identically (single-spaced corpus contract,
    as chunk_dup_stats).

    Scale: covered positions are exploded per span (linear in removed
    tokens) and anti-joined against the posexploded token table; the
    rebuild is one per-doc sort-agg. All shuffles key on doc_id.
    """
    spans = _dup_span_islands(docs, text_col, k, min_count)
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence("start", "end")).alias("pos"),
    ).distinct()
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("_n"),
        )
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n") - F.coalesce("n_kept", F.lit(0).cast("long"))).alias(
                "removed_tokens"
            ),
        )
    )


def _dup_span_islands_sql(docs_sql: str, k: int, min_count: int) -> str:
    kk = int(k)
    return (
        f"WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks "
        f"FROM ({docs_sql})), "
        "sh AS (SELECT doc_id, i AS pos, md5(array_to_string("
        f"list_slice(toks, i + 1, i + {kk}), ' ')) AS h "
        "FROM (SELECT doc_id, toks, unnest(range(0, "
        f"greatest(len(toks) - {kk} + 1, 0))) AS i FROM d)), "
        "freq AS (SELECT h, count(*) AS c FROM sh GROUP BY h), "
        "hits AS (SELECT doc_id, pos FROM sh JOIN freq USING (h) "
        f"WHERE c >= {int(min_count)}), "
        "brks AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER "
        "(PARTITION BY doc_id ORDER BY pos) IS NULL OR "
        f"pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {kk} "
        "THEN 1 ELSE 0 END AS brk FROM hits), "
        "isl AS (SELECT doc_id, pos, sum(brk) OVER "
        "(PARTITION BY doc_id ORDER BY pos) AS isl_id FROM brks), "
        "spans AS (SELECT doc_id, isl_id, min(pos) AS s, "
        f"max(pos) + {kk} - 1 AS e FROM isl GROUP BY doc_id, isl_id)"
    )


def duplicated_span_stats_sql(
    docs_sql: str, k: int = 8, min_count: int = 2
) -> str:
    """DuckDB twin of duplicated_span_stats — identical shingling
    (list_slice == Spark slice on the single-spaced corpus), identical
    md5 keys, identical lag-window island merge, identical IEEE
    division."""
    base = _dup_span_islands_sql(docs_sql, k, min_count)
    return (
        base + ", "
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans, "
        "CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens "
        "FROM spans GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens, "
        "coalesce(p.dup_spans, 0) AS dup_spans, "
        "coalesce(p.dup_tokens, 0) AS dup_tokens, "
        "CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / "
        "CAST(len(d.toks) AS DOUBLE) AS dup_fraction "
        "FROM d LEFT JOIN per p USING (doc_id)"
    )


def remove_duplicated_spans_sql(
    docs_sql: str, k: int = 8, min_count: int = 2
) -> str:
    """DuckDB twin of remove_duplicated_spans — covered positions from
    the same spans CTE, string_agg ORDER BY pos rebuild."""
    base = _dup_span_islands_sql(docs_sql, k, min_count)
    return (
        base + ", "
        "covered AS (SELECT DISTINCT doc_id, s + j AS pos FROM "
        "(SELECT doc_id, s, unnest(range(0, e - s + 1)) AS j FROM spans)), "
        "tok AS (SELECT doc_id, i AS pos, toks[i + 1] AS tok FROM "
        "(SELECT doc_id, toks, unnest(range(0, len(toks))) AS i FROM d)), "
        "kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t "
        "LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos "
        "WHERE c.pos IS NULL), "
        "rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) "
        "AS clean_text, CAST(count(*) AS BIGINT) AS n_kept "
        "FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text, "
        "CAST(len(d.toks) AS BIGINT) - coalesce(r.n_kept, 0) "
        "AS removed_tokens "
        "FROM d LEFT JOIN rebuilt r USING (doc_id)"
    )
