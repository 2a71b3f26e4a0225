"""The composed LLM training-corpus filter pipeline (north-rule extension)
— the document-side flagship, mirroring the graph side's pages → extract →
rank end-to-end plan: raw corpus → exact dedup (content fingerprint,
quality-argmax survivor) → chunk-level boilerplate cap → Gopher-style
quality filter → deterministic quality-weighted sampling → final corpus.

Every stage is an already-gated operator; this plan is their composition
as ONE DataFrame (one Catalyst plan, no intermediate materialization), in
production order: exact dedup FIRST (content-hash groupBy — the cheapest
stage and the one every later stat must not double-count), then chunk
duplication measured on the DEDUPED corpus (CCNet measures boilerplate
after exact dedup, else every dup pair trivially saturates the stat),
then the per-doc quality filters and the sampler — pure filters over a
shrinking survivor set. Near-dup (minhash-LSH) removal stays its own
operator (``dedup_survivors``); on this synthetic small-vocabulary corpus
4-hash LSH chains unrelated docs, so the composed plan uses the exact
stage and leaves near-dup thresholds to the corpus owner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.text import (
    fingerprint,
    quality_filter,
)
from ps_projekt_pagerank_spark.operators.dedup import chunk_dup_stats
from ps_projekt_pagerank_spark.operators.sampling import (
    weighted_bernoulli_sample,
)


def exact_dedup_survivors(
    docs: DataFrame, quality_col: str = "n_chars", text_col: str = "text"
) -> DataFrame:
    """The rows of ``docs`` that win their exact-duplicate group: grouped
    by content fingerprint (md5 of normalized text), survivor = highest
    ``quality_col``, doc_id ascending on ties (the same printf-key argmax
    as ``dedup_survivors`` — no window, engine-portable).

    Scale: one |docs|-row hash agg on the fingerprint + one equi-join
    back; the groups are duplicate-sized, never skewed.
    """
    fp = docs.select(
        "doc_id",
        fingerprint(F.col(text_col)).alias("_fp"),
        F.col(quality_col).cast("long").alias("_q"),
    )
    key = F.concat(
        F.format_string("%019d", F.lit(10**18) - F.col("_q")),
        F.lit("#"),
        F.format_string("%020d", F.col("doc_id")),
    )
    winners = (
        fp.select("_fp", key.alias("_k"))
        .groupBy("_fp")
        .agg(F.substring(F.min("_k"), 21, 20).cast("long").alias("doc_id"))
    )
    return docs.join(winners.select("doc_id"), "doc_id")


def corpus_pipeline(
    docs: DataFrame,
    quality_col: str = "n_chars",
    max_chunk_dup: float = 0.8,
    keep_p_scale: float = 500.0,
    salt: str = "corpus",
    near_dup: bool = False,
    num_hashes: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, dup_fraction, keep_p) — the surviving training
    corpus. A doc survives iff it (1) wins its exact-duplicate group,
    (1b, when ``near_dup=True``) wins its minhash-LSH NEAR-duplicate
    cluster under the same quality rule (``dedup_survivors``),
    (2) is under the chunk-duplication cap measured on the deduped corpus
    (docs too short to have chunks pass), (3) is kept by the Gopher
    length/repetition rule, and (4) is drawn by the quality-weighted
    sampler (keep_p = min(1, quality/scale), md5-deterministic — re-runs
    and backfills reproduce bit-for-bit).

    ``near_dup`` defaults off: banded LSH needs a corpus whose UNRELATED
    documents have low token Jaccard; on a tiny shared vocabulary (the
    raw synthetic documents table) every band chains and the stage would
    collapse the corpus. ``sources.derived.near_dup_documents`` is the
    wide-vocabulary fixture (unrelated Jaccard ~ 0, planted pairs ~0.97)
    the gated variant runs on; a real crawl corpus behaves like it.
    """
    # small corpora arrive as one parquet split, which would serialize the
    # expensive token explodes into a single task; fan out to the session
    # parallelism ONLY when the scan is under-partitioned (at crawl scale
    # the input has >> cores partitions and this is a no-op — the shuffle
    # is never paid on a well-partitioned table)
    target = docs.sparkSession.sparkContext.defaultParallelism

    def _fanned(df: DataFrame) -> DataFrame:
        return df.repartition(target) if df.rdd.getNumPartitions() < target else df

    docs = _fanned(docs)
    # materialize the two frames every later stage re-reads (the corpus
    # and the survivor set): without the cut, each of the four consumers
    # re-runs the scan + dedup subtree — measured 4x wall on the bench
    # corpus. At warehouse scale this boundary is where a production run
    # writes the deduped corpus back to the table store instead. The
    # survivor frame is re-fanned because AQE correctly coalesces the
    # small join shuffle by BYTES — but the next stage explodes tokens,
    # whose cost AQE can't see from the input size.
    docs = docs.localCheckpoint(eager=True)
    surv = _fanned(
        exact_dedup_survivors(docs, quality_col)
    ).localCheckpoint(eager=True)
    if near_dup:
        from ps_projekt_pagerank_spark.operators.dedup import dedup_survivors

        nd = dedup_survivors(
            surv,
            quality_col,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        )
        surv = surv.join(
            nd.where(~F.col("is_duplicate")).select("doc_id"), "doc_id"
        ).localCheckpoint(eager=True)
    ch = chunk_dup_stats(surv)
    qf = quality_filter(surv).where(F.col("keep"))
    base = (
        qf.select("doc_id", "n_tokens")
        .join(ch.select("doc_id", "dup_fraction"), "doc_id")
        .where(
            F.col("dup_fraction").isNull()
            | (F.col("dup_fraction") <= F.lit(float(max_chunk_dup)))
        )
        .join(
            surv.select(
                "doc_id",
                F.least(
                    F.lit(1.0),
                    F.col(quality_col).cast("double")
                    / F.lit(float(keep_p_scale)),
                ).alias("keep_p"),
            ),
            "doc_id",
        )
    )
    return weighted_bernoulli_sample(
        base, "keep_p", key_cols=["doc_id"], salt=salt
    ).select("doc_id", "n_tokens", "dup_fraction", "keep_p")


def exact_dedup_survivors_sql(docs_sql: str) -> str:
    """DuckDB twin of exact_dedup_survivors (identical fingerprint and
    printf-key argmax)."""
    return (
        f"WITH edd AS (SELECT * FROM ({docs_sql})), "
        "efp AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), "
        "'\\s+', ' ', 'g'))) AS f, n_chars FROM edd), "
        "ewin AS (SELECT f, CAST(substr(min(printf('%019d#%020d', "
        "1000000000000000000 - n_chars, doc_id)), 21) AS BIGINT) AS doc_id "
        "FROM efp GROUP BY f) "
        "SELECT edd.* FROM edd JOIN ewin ON edd.doc_id = ewin.doc_id"
    )


def corpus_pipeline_sql(
    docs_sql: str,
    quality_sql_of,
    chunk_sql_of,
    max_chunk_dup: float = 0.8,
    keep_p_scale: float = 500.0,
    salt: str = "corpus",
    near_dup_sql_of=None,
) -> str:
    """DuckDB twin — composes the stage twins with the same order, joins,
    cap, and md5 draw. ``quality_sql_of`` / ``chunk_sql_of`` are callables
    (docs_sql -> stage twin SQL) so both stages run over the DEDUPED
    corpus exactly like the Spark plan. ``near_dup_sql_of`` (docs_sql ->
    dedup_survivors twin SQL yielding (doc_id, ..., is_duplicate)) adds
    the optional near-dup cut between exact dedup and the doc filters,
    mirroring ``corpus_pipeline(near_dup=True)``."""
    surv = exact_dedup_survivors_sql(docs_sql)
    if near_dup_sql_of is not None:
        nd = near_dup_sql_of("SELECT doc_id, text, n_chars FROM nds0")
        surv = (
            f"WITH nds0 AS ({surv}), "
            f"nd AS (SELECT doc_id FROM ({nd}) WHERE NOT is_duplicate) "
            "SELECT nds0.* FROM nds0 JOIN nd ON nds0.doc_id = nd.doc_id"
        )
    return (
        f"WITH surv AS ({surv}), "
        f"qf AS ({quality_sql_of('SELECT doc_id, text FROM surv')}), "
        f"ch AS ({chunk_sql_of('SELECT doc_id, text FROM surv')}), "
        f"base AS (SELECT q.doc_id, q.n_tokens, c.dup_fraction, "
        f"least(1.0, CAST(s.n_chars AS DOUBLE) / {float(keep_p_scale)}) "
        "AS keep_p "
        "FROM qf q "
        "JOIN ch c ON q.doc_id = c.doc_id "
        "JOIN surv s ON q.doc_id = s.doc_id "
        "WHERE q.keep AND "
        f"(c.dup_fraction IS NULL OR c.dup_fraction <= {float(max_chunk_dup)})) "
        "SELECT doc_id, n_tokens, dup_fraction, keep_p FROM base "
        "WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
        f"'#{salt}'), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 < keep_p"
    )
