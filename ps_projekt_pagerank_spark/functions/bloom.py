"""Distributed Bloom filter — the crawl-frontier "have we seen this URL"
membership test (north-rule extension).

A 100 TB crawl cannot join every candidate link against the full list of
crawled pages each cycle: the seen-set is billions of rows, the frontier
arrives continuously, and an equi-join shuffles both sides. The standard
fix is a Bloom filter: fold the seen-set into m bits (k set bits per key),
broadcast the bits, and answer "definitely new" / "maybe seen" per
candidate with zero shuffle on the big side. False positives waste a
little re-crawl budget; false negatives are impossible, so nothing seen
is ever crawled twice by mistake (the direction that matters).

Engine parity: positions come from the md5-hex-prefix hash (the
``stratified_sample`` / FM-seed idiom), the filter word is a ``bit_or``
of ``1 << (pos % 63)`` — pure int64, bit-for-bit reproducible on any
engine, unlike Spark's built-in (Scala-murmur) ``bloom_filter_agg``.
Words pack 63 bits, not 64: ``1 << 63`` overflows a SIGNED int64, which
DuckDB rejects (OutOfRange) while Java silently wraps — 63 keeps the
shift representable everywhere at a 1.6% density cost.

Scale: the build is one map-side-combinable bit_or aggregation over
k·|seen| exploded positions into ≤ ⌈m/63⌉ rows; the probe joins the
candidate positions against that ≤ ⌈m/63⌉-row table — always broadcast.
Words that are all-zero are simply absent (a missing word == 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Hash i of ``key`` into [0, m_bits) — first 8 md5 hex chars of
    key||'#b{i}' as a 32-bit int, mod m_bits."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f"#b{i}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def bloom_build(
    df: DataFrame,
    col: str | Column = "id",
    m_bits: int = 4096,
    num_hashes: int = 3,
) -> DataFrame:
    """(word_idx LONG, word LONG) — the Bloom filter of ``col`` as ≤
    ⌈m_bits/63⌉ packed 63-bit words (NULL keys ignored; see module doc
    for why 63)."""
    if m_bits <= 0:
        raise ValueError("bloom_build: m_bits must be positive")
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.alias("v")).where(F.col("v").isNotNull())
    pos = vals.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("v"), i, m_bits) for i in range(num_hashes)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos div 63").alias("word_idx"),
            (F.col("pos") % 63).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit"))
            ).alias("word")
        )
    )


def bloom_probe(
    bloom: DataFrame,
    candidates: DataFrame,
    col: str | Column = "id",
    m_bits: int = 4096,
    num_hashes: int = 3,
) -> DataFrame:
    """(id, maybe_present BOOLEAN) — one row per distinct non-NULL
    candidate key; ``maybe_present`` is true iff all k filter bits are
    set (no false negatives by construction). ``m_bits``/``num_hashes``
    must match the build."""
    c = F.col(col) if isinstance(col, str) else col
    keys = candidates.select(c.alias("id")).where(F.col("id").isNotNull()).distinct()
    probe = keys.select(
        "id",
        F.explode(
            F.array(
                *[_bloom_pos(F.col("id"), i, m_bits) for i in range(num_hashes)]
            )
        ).alias("pos"),
    ).select(
        "id",
        F.expr("pos div 63").alias("word_idx"),
        (F.col("pos") % 63).cast("int").alias("bit"),
    )
    hit = (
        F.coalesce(F.col("word"), F.lit(0).cast("long")).bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit"))
        )
        != 0
    ).cast("long")
    return (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .select("id", hit.alias("hit"))
        .groupBy("id")
        .agg((F.sum("hit") == num_hashes).alias("maybe_present"))
    )


def _pos_exprs(key_sql: str, num_hashes: int, m_bits: int) -> str:
    """DuckDB list literal of the k hashed positions of ``key_sql``."""
    return (
        "["
        + ", ".join(
            f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || '#b{i}'), "
            f"1, 8) AS BIGINT) % {m_bits}"
            for i in range(num_hashes)
        )
        + "]"
    )


def bloom_seen_sql(
    seen_sql: str,
    candidates_sql: str,
    m_bits: int = 4096,
    num_hashes: int = 3,
) -> str:
    """DuckDB twin of bloom_build ∘ bloom_probe — identical md5
    positions, word packing, and all-bits-set test. ``seen_sql`` and
    ``candidates_sql`` must each yield one column ``id``; output is
    (id, maybe_present) per distinct candidate."""
    return (
        f"WITH seen AS (SELECT DISTINCT id FROM ({seen_sql}) "
        "WHERE id IS NOT NULL), "
        "spos AS (SELECT unnest("
        + _pos_exprs("id", num_hashes, m_bits)
        + ") AS pos FROM seen), "
        "words AS (SELECT pos // 63 AS word_idx, "
        "bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word "
        "FROM spos GROUP BY 1), "
        f"cand AS (SELECT DISTINCT id FROM ({candidates_sql}) "
        "WHERE id IS NOT NULL), "
        "cpos AS (SELECT id, unnest("
        + _pos_exprs("id", num_hashes, m_bits)
        + ") AS pos FROM cand), "
        "probe AS (SELECT c.id, CASE WHEN "
        "(coalesce(w.word, 0) & (CAST(1 AS BIGINT) << CAST(c.pos % 63 AS "
        "INT))) <> 0 THEN 1 ELSE 0 END AS hit "
        "FROM cpos c LEFT JOIN words w ON w.word_idx = c.pos // 63) "
        f"SELECT id, sum(hit) = {num_hashes} AS maybe_present "
        "FROM probe GROUP BY id"
    )
