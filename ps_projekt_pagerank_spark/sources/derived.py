"""Deterministic graphs derived from the driver's TPC-H-ish parquet tables.

The engine's real input is a pages/edge table; for the driver's DuckDB
cross-check we derive edge tables from ``lineitem`` with pure modular
arithmetic so Spark and ANSI SQL produce bit-identical edges:

- web_edges:    (l_orderkey % 997,  l_partkey % 1400)  — ~1.4k nodes, 60k
  multigraph edges at sf0.01, duplicate edges + ~400 sink nodes →
  PageRank-shaped (sink-mass path exercised)
- block_edges:  3 disconnected blocks keyed by l_linenumber % 3 — the
  connected-components / label-propagation fixture
- sparse_edges: (l_orderkey % 4999, l_partkey % 4999) — sparser, for
  triangle enumeration

The same definitions exist as SQL strings (``*_SQL``) consumed by the
oracle in __spark_entry__.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Opt-in derived-input cache (VERDICT r3 task 5): the 98-query gate calls
# these derivations once per query; with SPARK_GRAFT_CACHE_DERIVED=1 each
# (session, sf_dir, table) is derived once and persisted, cutting the full
# gate wall several-fold. Off by default — benchmarks must measure the
# cold derivation, and long-lived sessions should not pin tables they used
# once. tools/check_entry.py turns it on.
_CACHE: dict = {}


def _cacheable(fn):
    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        if not os.environ.get("SPARK_GRAFT_CACHE_DERIVED"):
            return fn(spark, sf_dir)
        key = (id(spark), sf_dir, fn.__name__)
        df = _CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
            _CACHE[key] = df
        return df

    return wrapper


WEB_SRC_MOD = 997
WEB_DST_MOD = 1400
SPARSE_MOD = 4999
BLOCK_MOD = 200

WEB_EDGES_SQL = (
    # dst range wider than src range -> residues in [997,1400) never appear
    # as src, so the graph has real sinks and PageRank's sink-mass path is
    # exercised by the driver's cross-check too
    "SELECT l_orderkey % 997 AS src, l_partkey % 1400 AS dst FROM lineitem"
)
BLOCK_EDGES_SQL = (
    "SELECT (l_orderkey % 200) + 1000 * (l_linenumber % 3) AS src, "
    "(l_partkey % 200) + 1000 * (l_linenumber % 3) AS dst FROM lineitem"
)
SPARSE_EDGES_SQL = (
    "SELECT l_orderkey % 4999 AS src, l_partkey % 4999 AS dst FROM lineitem"
)
SKEW_EDGES_SQL = (
    # ~45% of all edges land on dst 0 (l_linenumber is 1-7, skewed low)
    # from a WIDE src domain, so the hub keeps tens of thousands of
    # adjacency rows even after the weighted collapse (a narrow src domain
    # would cap rows-per-dst at |src domain| and absorb the hub for free) —
    # the fixture for the automatic skew-salt path
    "SELECT l_orderkey % 99991 AS src, CASE WHEN l_linenumber <= 2 THEN 0 "
    "ELSE l_partkey % 1400 END AS dst FROM lineitem"
)


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@_cacheable
def web_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return li.select(
        (F.col("l_orderkey") % WEB_SRC_MOD).alias("src"),
        (F.col("l_partkey") % WEB_DST_MOD).alias("dst"),
    )


@_cacheable
def block_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    blk = F.col("l_linenumber") % 3
    return li.select(
        ((F.col("l_orderkey") % BLOCK_MOD) + 1000 * blk).alias("src"),
        ((F.col("l_partkey") % BLOCK_MOD) + 1000 * blk).alias("dst"),
    )


@_cacheable
def sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return li.select(
        (F.col("l_orderkey") % SPARSE_MOD).alias("src"),
        (F.col("l_partkey") % SPARSE_MOD).alias("dst"),
    )


SKEW_SRC_MOD = 99991


@_cacheable
def skew_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return li.select(
        (F.col("l_orderkey") % SKEW_SRC_MOD).alias("src"),
        F.when(F.col("l_linenumber") <= 2, F.lit(0))
        .otherwise(F.col("l_partkey") % WEB_DST_MOD)
        .cast("long")
        .alias("dst"),
    )


@_cacheable
def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@_cacheable
def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@_cacheable
def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


URL_HOST_MOD = 97

URL_EDGES_SQL = (
    "SELECT 'http://h' || (l_orderkey % 97)::VARCHAR || '.test/p' || "
    "(l_orderkey % 4999)::VARCHAR AS src_url, "
    "'http://h' || (l_partkey % 97)::VARCHAR || '.test/p' || "
    "(l_partkey % 4999)::VARCHAR AS dst_url FROM lineitem"
)


@_cacheable
def url_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_url, dst_url) — absolute-URL page edges (host = key % 97, path
    = key % 4999): the host-graph-collapse fixture. Same modular derivation
    as the id graphs, rendered as URLs."""
    li = _lineitem(spark, sf_dir)

    def mk(key):
        return F.concat(
            F.lit("http://h"),
            (key % URL_HOST_MOD).cast("string"),
            F.lit(".test/p"),
            (key % SPARSE_MOD).cast("string"),
        )

    return li.select(
        mk(F.col("l_orderkey")).alias("src_url"),
        mk(F.col("l_partkey")).alias("dst_url"),
    )


FUNNEL_EDGES_SQL = (
    # deliberate Broder bow-tie: a dense 200-node core cycle mass (lines
    # ≡0 mod 5), IN nodes 1000+ pointing into it (≡1), core pointing at
    # OUT nodes 2000+ (≡2), IN pointing at TENDRIL nodes 3000+ (≡3), and
    # a disconnected bipartite block 4000+/4100+ (≡4)
    "SELECT CASE l_linenumber % 5 "
    "WHEN 0 THEN l_orderkey % 200 "
    "WHEN 1 THEN 1000 + (l_orderkey % 300) "
    "WHEN 2 THEN l_orderkey % 200 "
    "WHEN 3 THEN 1000 + (l_orderkey % 300) "
    "ELSE 4000 + (l_orderkey % 100) END AS src, "
    "CASE l_linenumber % 5 "
    "WHEN 0 THEN l_partkey % 200 "
    "WHEN 1 THEN l_partkey % 200 "
    "WHEN 2 THEN 2000 + (l_partkey % 300) "
    "WHEN 3 THEN 3000 + (l_partkey % 150) "
    "ELSE 4100 + (l_partkey % 100) END AS dst FROM lineitem"
)


@_cacheable
def funnel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) — the bow-tie fixture: dense core SCC + IN/OUT fringes,
    tendrils off IN, and a disconnected block (FUNNEL_EDGES_SQL twin)."""
    li = _lineitem(spark, sf_dir)
    ln = F.col("l_linenumber") % 5
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    src = (
        F.when(ln == 0, ok % 200)
        .when(ln == 1, 1000 + (ok % 300))
        .when(ln == 2, ok % 200)
        .when(ln == 3, 1000 + (ok % 300))
        .otherwise(4000 + (ok % 100))
    )
    dst = (
        F.when(ln == 0, pk % 200)
        .when(ln == 1, pk % 200)
        .when(ln == 2, 2000 + (pk % 300))
        .when(ln == 3, 3000 + (pk % 150))
        .otherwise(4100 + (pk % 100))
    )
    return li.select(src.alias("src"), dst.alias("dst"))


MESSY_URLS_SQL = (
    "SELECT DISTINCT CASE l_linenumber % 4 "
    "WHEN 0 THEN 'HTTP://H' || (l_orderkey % 97)::VARCHAR || '.Test:80/p' "
    "|| (l_partkey % 4999)::VARCHAR || '#frag' "
    "WHEN 1 THEN 'https://h' || (l_orderkey % 97)::VARCHAR || '.TEST:443/p' "
    "|| (l_partkey % 4999)::VARCHAR "
    "WHEN 2 THEN 'http://h' || (l_orderkey % 97)::VARCHAR || '.test' "
    "ELSE 'u' || (l_partkey % 4999)::VARCHAR || '#x' END AS url "
    "FROM lineitem"
)


@_cacheable
def messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url) — distinct URL spellings with casing/default-port/fragment/
    relative variants: the url-canonicalization fixture."""
    li = _lineitem(spark, sf_dir)
    ok = (F.col("l_orderkey") % URL_HOST_MOD).cast("string")
    pk = (F.col("l_partkey") % SPARSE_MOD).cast("string")
    url = (
        F.when(
            F.col("l_linenumber") % 4 == 0,
            F.concat(
                F.lit("HTTP://H"), ok, F.lit(".Test:80/p"), pk, F.lit("#frag")
            ),
        )
        .when(
            F.col("l_linenumber") % 4 == 1,
            F.concat(F.lit("https://h"), ok, F.lit(".TEST:443/p"), pk),
        )
        .when(
            F.col("l_linenumber") % 4 == 2,
            F.concat(F.lit("http://h"), ok, F.lit(".test")),
        )
        .otherwise(F.concat(F.lit("u"), pk, F.lit("#x")))
    )
    return li.select(url.alias("url")).distinct()


NEAR_DUP_TOKENS = 64
NEAR_DUP_PLANT_MOD = 10
NEAR_DUP_ID_OFFSET = 10_000_000

NEAR_DUP_DOCS_SQL = (
    # wide-vocabulary corpus + planted near-dups (VERDICT r3 task 7): each
    # base doc is 64 md5-derived 6-char tokens (essentially unique across
    # docs, so unrelated Jaccard ~ 0 and banded LSH discriminates — the
    # raw documents fixture's tiny vocabulary chains everything); every
    # 10th doc gets a planted copy (id + 10000000) identical except the
    # last token (same byte length, so the quality tie-break keeps the ORIGINAL as survivor), Jaccard 63/65 ~ 0.97
    "SELECT doc_id, text, CAST(octet_length(encode(text)) AS INT) AS n_chars "
    "FROM (SELECT doc_id, array_to_string(list_transform(range(0, 64), "
    "j -> substr(md5(doc_id::VARCHAR || '#' || j::VARCHAR), 1, 6)), ' ') "
    "AS text FROM documents WHERE doc_id < 200 "
    "UNION ALL "
    "SELECT d.doc_id + 10000000 AS doc_id, array_to_string(list_transform("
    "range(0, 63), j -> substr(md5(d.doc_id::VARCHAR || '#' || "
    "j::VARCHAR), 1, 6)), ' ') || ' ndupzz' AS text FROM documents d "
    "WHERE d.doc_id < 200 AND d.doc_id % 10 = 0)"
)


@_cacheable
def near_dup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, n_chars) — NEAR_DUP_DOCS_SQL's Spark twin: the
    minhash-discriminating corpus with planted near-duplicates."""
    base = documents(spark, sf_dir).where(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def mk_text(n_toks: int):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_toks - 1)),
                lambda j: F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            j.cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
            ),
        )

    originals = base.select("doc_id", mk_text(NEAR_DUP_TOKENS).alias("text"))
    plants = (
        base.where(F.col("doc_id") % NEAR_DUP_PLANT_MOD == 0)
        .select(
            (F.col("doc_id") + NEAR_DUP_ID_OFFSET).alias("new_id"),
            F.concat(
                mk_text(NEAR_DUP_TOKENS - 1), F.lit(" ndupzz")
            ).alias("text"),
        )
        .select(F.col("new_id").alias("doc_id"), "text")
    )
    return originals.unionAll(plants).select(
        "doc_id", "text", F.octet_length("text").cast("int").alias("n_chars")
    )


DIRTY_DOCS_SQL = (
    # deterministic PII injection: every 3rd doc gets an email, every 5th
    # a phone, every 7th a dotted-quad — same concat in both engines, so
    # the pii_scan twin compares counts AND md5(redacted) byte-identically
    "SELECT doc_id, text "
    "|| CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::VARCHAR "
    "|| '@example.com now' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' call 555-' "
    "|| lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END "
    "|| CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' "
    "|| (doc_id % 256)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR "
    "ELSE '' END AS text "
    "FROM documents"
)


@_cacheable
def dirty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) — DIRTY_DOCS_SQL's Spark twin: the documents table
    with deterministic synthetic PII appended (the pii_scan fixture)."""
    did = F.col("doc_id").cast("string")
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return documents(spark, sf_dir).select(
        "doc_id", F.concat("text", email, phone, ip).alias("text")
    )


RING_MOD = 3001

RING_EDGES_SQL = (
    # bounded-degree ring + chord graph (max undirected degree 4): the
    # graph-coloring fixture — Jones-Plassmann round counts track the
    # longest priority-monotone path, which stays O(log n) only on
    # bounded-degree graphs (dense cores degenerate toward |core| rounds)
    "SELECT DISTINCT l_orderkey % 3001 AS src, "
    "(l_orderkey % 3001 + 1) % 3001 AS dst FROM lineitem "
    "UNION "
    "SELECT DISTINCT l_orderkey % 3001 AS src, "
    "(l_orderkey % 3001 + 7) % 3001 AS dst FROM lineitem"
)


@_cacheable
def ring_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) — RING_EDGES_SQL's Spark twin."""
    li = _lineitem(spark, sf_dir)
    i = F.col("l_orderkey") % RING_MOD
    step = li.select(
        i.alias("src"), ((i + 1) % RING_MOD).alias("dst")
    ).distinct()
    chord = li.select(
        i.alias("src"), ((i + 7) % RING_MOD).alias("dst")
    ).distinct()
    return step.union(chord)


CRAWL_EPOCH = 1_704_067_200  # 2024-01-01T00:00:00Z
CRAWL_RECRAWL_GAP_S = 720_000  # re-crawl lands ~8.3 days after capture 1

CRAWL_PAGES_SQL = (
    # the north-rule input shape verbatim — (url, warc_ts, html BINARY,
    # text, lang) — with a second capture for every 3rd url so the
    # latest-capture dedup has real work to do
    "SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, "
    "make_timestamp((1704067200 + (doc_id % 97) * 3600) * 1000000) "
    "AS warc_ts, "
    "CAST('<html><body><p>' || text || '</p></body></html>' AS BLOB) "
    "AS html, text, lang FROM documents "
    "UNION ALL "
    "SELECT 'u' || CAST(doc_id AS VARCHAR), "
    "make_timestamp((1704067200 + (doc_id % 97) * 3600 + 720000) "
    "* 1000000), "
    "CAST('<html><body><p>' || text || ' updated</p></body></html>' "
    "AS BLOB), text || ' updated', lang FROM documents WHERE doc_id % 3 = 0"
)


@_cacheable
def crawl_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
    lang STRING) — CRAWL_PAGES_SQL's Spark twin: the Common-Crawl-style
    pages table in the exact north-rule input shape, with deterministic
    re-captures (every 3rd url gets a later, changed capture)."""
    docs = documents(spark, sf_dir)
    base_epoch = F.lit(CRAWL_EPOCH) + (F.col("doc_id") % 97) * 3600

    def capture(src, text_col, epoch):
        html = F.concat(
            F.lit("<html><body><p>"), text_col, F.lit("</p></body></html>")
        )
        return src.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias(
                "url"
            ),
            F.timestamp_seconds(epoch).alias("warc_ts"),
            html.cast("binary").alias("html"),
            text_col.alias("text"),
            F.col("lang"),
        )

    first = capture(docs, F.col("text"), base_epoch)
    recrawl = capture(
        docs.where(F.col("doc_id") % 3 == 0),
        F.concat(F.col("text"), F.lit(" updated")),
        base_epoch + CRAWL_RECRAWL_GAP_S,
    )
    return first.unionAll(recrawl)


PAGED_DOCS_SQL = (
    # multi-line web pages for the C4-style line-level cleaner: every doc
    # becomes a page with a nav line (no terminal punctuation), the real
    # content line, a per-source copyright line (boilerplate repeated
    # across the source's docs), and deterministic junk — a javascript
    # notice (every 4th doc), a too-short line (every 5th), a lorem-ipsum
    # page-killer (every 7th) — plus a near-unique section line. Line
    # separator is chr(10) in both engines; optional lines concatenate a
    # chr(10)-prefixed segment or '' so positions stay aligned with
    # Spark's split on '\n'.
    "SELECT doc_id, "
    "'Home | About | Contact' || chr(10) "
    "|| text || '.' || chr(10) "
    "|| 'Copyright 2024 ' || source || ' Inc. All rights reserved.' "
    "|| CASE WHEN doc_id % 4 = 1 THEN chr(10) "
    "|| 'Please enable JavaScript to continue.' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 2 THEN chr(10) || 'Read more.' ELSE '' END "
    "|| CASE WHEN doc_id % 7 = 3 THEN chr(10) "
    "|| 'lorem ipsum dolor sit amet.' ELSE '' END "
    "|| chr(10) || 'Section ' || (doc_id % 5)::VARCHAR || ' ' "
    "|| substr(md5('sec' || doc_id::VARCHAR), 1, 8) "
    "|| ' notes follow here.' AS text "
    "FROM documents"
)


@_cacheable
def paged_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) — PAGED_DOCS_SQL's Spark twin: multi-line pages with
    planted nav/copyright/javascript/short/lorem lines for the C4 cleaner
    and boilerplate detector (functions.lines)."""
    nl = F.lit("\n")
    did = F.col("doc_id").cast("string")
    opt = lambda cond, line: F.when(cond, F.concat(nl, F.lit(line))).otherwise(F.lit(""))  # noqa: E731
    page = F.concat(
        F.lit("Home | About | Contact"),
        nl,
        F.col("text"),
        F.lit("."),
        nl,
        F.lit("Copyright 2024 "),
        F.col("source"),
        F.lit(" Inc. All rights reserved."),
        opt(F.col("doc_id") % 4 == 1, "Please enable JavaScript to continue."),
        opt(F.col("doc_id") % 5 == 2, "Read more."),
        opt(F.col("doc_id") % 7 == 3, "lorem ipsum dolor sit amet."),
        nl,
        F.lit("Section "),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(" "),
        F.substring(F.md5(F.concat(F.lit("sec"), did).cast("binary")), 1, 8),
        F.lit(" notes follow here."),
    )
    return documents(spark, sf_dir).select("doc_id", page.alias("text"))


QUOTE_ID_OFFSET = 20_000_000
QUOTE_PLANT_MOD = 8
QUOTE_TOKENS = 16

QUOTE_DOCS_SQL = (
    # containment-dup fixture: the wide-vocabulary originals (same token
    # construction as NEAR_DUP_DOCS_SQL) plus, for every 8th doc, a
    # "quote" doc holding just its first 16 of 64 tokens — a wholesale
    # inclusion whose overlap coefficient is 1.0 while its jaccard is
    # only 16/64 (the case jaccard-threshold dedup misses)
    "SELECT doc_id, array_to_string(list_transform(range(0, 64), "
    "j -> substr(md5(doc_id::VARCHAR || '#' || j::VARCHAR), 1, 6)), ' ') "
    "AS text FROM documents WHERE doc_id < 200 "
    "UNION ALL "
    "SELECT doc_id + 20000000 AS doc_id, array_to_string("
    "list_transform(range(0, 16), "
    "j -> substr(md5(doc_id::VARCHAR || '#' || j::VARCHAR), 1, 6)), ' ') "
    "AS text FROM documents WHERE doc_id < 200 AND doc_id % 8 = 0"
)


@_cacheable
def quote_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) — QUOTE_DOCS_SQL's Spark twin: wide-vocabulary
    originals with planted subset-quote docs for the overlap-coefficient
    (containment) dedup path."""
    base = documents(spark, sf_dir).where(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def mk_text(n_toks: int):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_toks - 1)),
                lambda j: F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            j.cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
            ),
        )

    originals = base.select("doc_id", mk_text(NEAR_DUP_TOKENS).alias("text"))
    quotes = (
        base.where(F.col("doc_id") % QUOTE_PLANT_MOD == 0)
        .select(
            (F.col("doc_id") + QUOTE_ID_OFFSET).alias("new_id"),
            mk_text(QUOTE_TOKENS).alias("text"),
        )
        .select(F.col("new_id").alias("doc_id"), "text")
    )
    return originals.unionAll(quotes)


SIMRANK_EDGES_SQL = (
    # bounded in-degree digraph for the pruned-SimRank gate query: 97
    # sources x 53 targets, ~400 edges, in-degree ~7 — the candidate x
    # in-degree^2 join stays a few-10k-row frame in both engines
    "SELECT doc_id % 97 AS src, (doc_id * 7) % 53 AS dst "
    "FROM documents WHERE doc_id < 400"
)


@_cacheable
def simrank_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) — SIMRANK_EDGES_SQL's Spark twin."""
    return (
        documents(spark, sf_dir)
        .where(F.col("doc_id") < 400)
        .select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 7) % 53).alias("dst"),
        )
    )


MIRROR_HOST_MOD = 40
MIRROR_PLANT_LIM = 8

MIRROR_PAGES_SQL = (
    # host-mirror fixture: 40 hosts of ~n/40 pages each; hosts h0..h7 get
    # full mirror twins m0..m7 carrying byte-identical page bodies, so
    # the mirror detector should flag exactly those 8 pairs at 1.0
    "SELECT 'h' || (doc_id % 40)::VARCHAR AS host, text FROM documents "
    "UNION ALL "
    "SELECT 'm' || (doc_id % 40)::VARCHAR AS host, text FROM documents "
    "WHERE doc_id % 40 < 8"
)


@_cacheable
def mirror_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, text) — MIRROR_PAGES_SQL's Spark twin."""
    docs = documents(spark, sf_dir)
    hk = (F.col("doc_id") % MIRROR_HOST_MOD).cast("string")
    base = docs.select(F.concat(F.lit("h"), hk).alias("host"), "text")
    mirrors = docs.where(
        F.col("doc_id") % MIRROR_HOST_MOD < MIRROR_PLANT_LIM
    ).select(F.concat(F.lit("m"), hk).alias("host"), "text")
    return base.unionAll(mirrors)


TRAP_PAGES_SQL = (
    # crawler-trap fixture: 20 honest hosts (one body per url) plus a
    # 'trap' host whose every doc spawns a distinct session url over only
    # 5 distinct bodies
    "SELECT 'h' || (doc_id % 20)::VARCHAR AS host, "
    "'u' || doc_id::VARCHAR AS url, text FROM documents "
    "UNION ALL "
    "SELECT 'trap' AS host, 'u?session=' || doc_id::VARCHAR AS url, "
    "'trap page ' || (doc_id % 5)::VARCHAR AS text FROM documents"
)


@_cacheable
def trap_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, url, text) — TRAP_PAGES_SQL's Spark twin."""
    docs = documents(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    honest = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("u"), did).alias("url"),
        "text",
    )
    trap = docs.select(
        F.lit("trap").alias("host"),
        F.concat(F.lit("u?session="), did).alias("url"),
        F.concat(
            F.lit("trap page "), (F.col("doc_id") % 5).cast("string")
        ).alias("text"),
    )
    return honest.unionAll(trap)


@_cacheable
def sitemap_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, xml) — one sitemaps.org 0.9 XML document per source host,
    listing that host's docs with deterministic lastmod/changefreq/
    priority hints (every 6th entry omits the optional <lastmod>). The
    fixture for functions.sitemaps; the gate twin reconstructs the
    PARSED rows directly from documents, so parse(build(x)) == x."""
    docs = documents(spark, sf_dir)
    did = F.col("doc_id")
    lastmod = F.when(
        did % 6 != 5,
        F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad((did % 28 + 1).cast("string"), 2, "0"),
            F.lit("</lastmod>"),
        ),
    ).otherwise(F.lit(""))
    changefreq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
        (did % 3 + 1).cast("int"),
    )
    entry = F.concat(
        F.lit("\n  <url>\n    <loc>https://"),
        F.col("source"),
        F.lit(".example/p"),
        did.cast("string"),
        # every 7th loc carries a query string with the spec-required
        # &amp; escaping — exercises the parser's entity unescape
        F.when(did % 7 == 3, F.lit("?a=1&amp;b=2")).otherwise(F.lit("")),
        F.lit("</loc>\n    "),
        lastmod,
        F.lit("\n    <changefreq>"),
        changefreq,
        F.lit("</changefreq>\n    <priority>0."),
        (did % 5 + 3).cast("string"),
        F.lit("</priority>\n  </url>"),
    )
    return (
        docs.select(
            F.col("source").alias("host"),
            F.struct(did.alias("doc_id"), entry.alias("e")).alias("r"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?>\n<urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list("r")), lambda s: s["e"]
                    ),
                ),
                F.lit("\n</urlset>"),
            ).alias("xml")
        )
    )


# the parsed-output twin (the XML itself never crosses engines)
SITEMAP_PARSED_SQL = (
    "SELECT source AS host, "
    "'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 7 = 3 THEN '?a=1&b=2' ELSE '' END "  # unescaped
    "AS loc, "
    "CASE WHEN doc_id % 6 = 5 THEN NULL ELSE CAST('2024-01-' || "
    "lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS DATE) END "
    "AS lastmod, "
    "CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' "
    "ELSE 'monthly' END AS changefreq, "
    "CAST('0.' || CAST(doc_id % 5 + 3 AS VARCHAR) AS DOUBLE) AS priority "
    "FROM documents"
)


FRONTIER_URLS_SQL = (
    # url-only spam-prior fixture: each residue class plants one signal —
    # deep path, session-id + params, deep subdomain, digit blob, hyphens
    "SELECT DISTINCT CASE l_linenumber % 5 "
    "WHEN 0 THEN 'http://h' || (l_orderkey % 97)::VARCHAR "
    "|| '.test/a/b/c/d/e/f/p' || (l_partkey % 4999)::VARCHAR "
    "WHEN 1 THEN 'http://h' || (l_orderkey % 97)::VARCHAR || '.test/p' "
    "|| (l_partkey % 4999)::VARCHAR || '?phpsessid=' "
    "|| substr(md5('s' || (l_partkey % 4999)::VARCHAR), 1, 8) "
    "|| '&ref=' || (l_orderkey % 97)::VARCHAR || '&src=1&n=2' "
    "WHEN 2 THEN 'http://s' || (l_partkey % 7)::VARCHAR || '.m.h' "
    "|| (l_orderkey % 97)::VARCHAR || '.test/p' "
    "|| (l_partkey % 4999)::VARCHAR "
    "WHEN 3 THEN 'http://h' || (l_orderkey % 97)::VARCHAR || '.test/' "
    "|| (l_partkey % 4999)::VARCHAR || '90210777/x' "
    "ELSE 'http://h' || (l_orderkey % 97)::VARCHAR "
    "|| '.test/page-one-two-three-' || (l_partkey % 4999)::VARCHAR "
    "END AS url FROM lineitem"
)


@_cacheable
def frontier_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url) — FRONTIER_URLS_SQL's Spark twin: distinct urls with planted
    URL-only spam signals for functions.urls.url_spam_features."""
    li = _lineitem(spark, sf_dir)
    ok = (F.col("l_orderkey") % 97).cast("string")
    pk = (F.col("l_partkey") % SPARSE_MOD).cast("string")
    ln = F.col("l_linenumber") % 5
    url = (
        F.when(
            ln == 0,
            F.concat(F.lit("http://h"), ok, F.lit(".test/a/b/c/d/e/f/p"), pk),
        )
        .when(
            ln == 1,
            F.concat(
                F.lit("http://h"), ok, F.lit(".test/p"), pk,
                F.lit("?phpsessid="),
                F.substring(
                    F.md5(F.concat(F.lit("s"), pk).cast("binary")), 1, 8
                ),
                F.lit("&ref="), ok, F.lit("&src=1&n=2"),
            ),
        )
        .when(
            ln == 2,
            F.concat(
                F.lit("http://s"), (F.col("l_partkey") % 7).cast("string"),
                F.lit(".m.h"), ok, F.lit(".test/p"), pk,
            ),
        )
        .when(
            ln == 3,
            F.concat(
                F.lit("http://h"), ok, F.lit(".test/"), pk,
                F.lit("90210777/x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://h"), ok, F.lit(".test/page-one-two-three-"), pk
            )
        )
    )
    return li.select(url.alias("url")).distinct()
