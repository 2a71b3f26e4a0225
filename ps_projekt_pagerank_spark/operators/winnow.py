"""Winnowing document fingerprints — robust LOCAL near-dup detection
(Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003; the MOSS algorithm).

MinHash (operators/dedup.py) fingerprints whole documents: it finds
globally-similar pairs but says nothing about a 200-char passage copied
into an otherwise-unrelated page. Winnowing guarantees LOCALITY: hash
every character k-gram, slide a window of w consecutive hashes, keep
each window's minimum — any shared substring of length ≥ w + k − 1 is
GUARANTEED to contribute at least one common fingerprint, while the
density of kept hashes is ~2/(w+1) of all k-grams. This is the
boilerplate/quotation/mirror-passage detector a crawl corpus runs next
to whole-doc dedup.

Tie rule: a window's fingerprint is its minimum hash VALUE; since only
the value set per document is kept (positions dropped), the paper's
rightmost-tie refinement is irrelevant here — ties share the value.

Engine parity: k-gram hashes are the md5-hex-prefix 32-bit idiom;
window minima, dedup, and the pair join are integer-exact everywhere.

Scale: hashing + winnowing are PER-ROW array expressions (zero shuffle,
whole-stage codegen); matching is the mirror_hosts shape — explode the
selected fingerprints, drop corpus-hot ones (boilerplate that would
fan the join quadratically), equi-join on fingerprint, hash-agg the
pair counts. Never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _kgram_hashes(text: Column, k: int) -> Column:
    """Array of 32-bit md5-prefix hashes of the character k-grams."""
    n = F.length(text) - k + 1
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.substring(text, i + 1, F.lit(k)).cast("binary")),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(doc_id, fp) — the DISTINCT winnowing fingerprints of each
    document: minima of every ``w``-hash window over the character
    ``k``-gram hash sequence. Documents shorter than k + w − 1 chars
    emit no rows."""
    if k < 1 or w < 1:
        raise ValueError(f"need k >= 1 and w >= 1, got k={k} w={w}")
    # single-split scans serialize the md5 work into one task — fan out
    # (no-op on a well-partitioned crawl table, the corpus_pipeline rule)
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    # the k-gram hash array MUST land in its own projection: inlined into
    # the window-min lambda it would be re-evaluated per window (measured
    # 84 s -> 3.1 s on 500 short docs — O(n^2) md5 calls otherwise)
    withhs = docs.select(
        "doc_id", _kgram_hashes(F.col(text_col), k).alias("hs")
    )
    hs = F.col("hs")
    nwin = F.size(hs) - w + 1
    fps = F.when(
        nwin > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), nwin - 1),
                lambda j: F.array_min(F.slice(hs, j + 1, w)),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return withhs.select("doc_id", F.explode(fps).alias("fp"))


def winnow_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = 16,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps) — document pairs (doc_a < doc_b)
    sharing ≥ ``min_shared`` winnowing fingerprints, i.e. pairs with
    matching local passages. Fingerprints present in more than
    ``max_docs_per_fp`` documents are corpus boilerplate and are dropped
    before the join (the mirror_hosts hot-key cap — it bounds the
    per-fingerprint fan-out, which is what keeps this linear instead of
    quadratic at 100× the corpus)."""
    fps = winnow_fingerprints(docs, text_col, k, w).distinct()
    cold = fps.join(
        fps.groupBy("fp")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_docs_per_fp)
        .select("fp"),
        "fp",
    )
    a = cold.select("fp", F.col("doc_id").alias("doc_a"))
    b = cold.select(F.col("fp").alias("fp2"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(
            b,
            (F.col("fp") == F.col("fp2")) & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def _fp_ctes(docs_sql: str, k: int, w: int) -> str:
    """Shared CTE chain: wdoc → k-gram hashes → distinct fingerprints."""
    h = (
        f"CAST('0x' || substr(md5(substr(text, CAST(i + 1 AS INT), {k})), "
        "1, 8) AS BIGINT)"
    )
    return (
        f"wdoc AS (SELECT doc_id, text FROM ({docs_sql})), "
        f"wh AS (SELECT doc_id, list_transform(range(0, "
        f"greatest(len(text) - {k} + 1, 0)), i -> {h}) AS hs FROM wdoc), "
        f"wfp AS (SELECT doc_id, unnest(list_distinct(list_transform("
        f"range(0, greatest(len(hs) - {w} + 1, 0)), "
        f"j -> list_aggregate(hs[CAST(j + 1 AS INT):CAST(j + {w} AS INT)], "
        "'min')))) AS fp FROM wh)"
    )


def winnow_pairs_sql(
    docs_sql: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = 16,
) -> str:
    """DuckDB twin of winnow_pairs — identical hashes, window minima,
    hot-fingerprint cap, and pair aggregation."""
    return (
        "WITH "
        + _fp_ctes(docs_sql, k, w)
        + ", wcold AS (SELECT f.doc_id, f.fp FROM (SELECT DISTINCT doc_id, "
        "fp FROM wfp) f JOIN (SELECT fp FROM (SELECT DISTINCT doc_id, fp "
        f"FROM wfp) GROUP BY fp HAVING count(*) <= {max_docs_per_fp}) ok "
        "USING (fp)) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(*) AS BIGINT) AS shared_fps "
        "FROM wcold a JOIN wcold b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_shared}"
    )
