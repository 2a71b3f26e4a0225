"""S4 — pages→text+edges extraction (north-rule extension; the reference
ingests pre-extracted edge lists, so this stage has no reference counterpart
— its contract is oracle/extract.py, the sequential reference extractor).

All Python work is Arrow-batched and pandas-vectorized (``pandas_udf`` over
``pd.Series.str`` ops) — no per-row Python UDFs anywhere (input_hint
requirement). The href extraction emits one row per href occurrence in
document order with duplicates preserved (multigraph semantics,
SURVEY.md §1.1); ``href_pos`` keeps the within-page order.

The url→id dictionary encoding is the Spark analogue of the reference's
id map (Graph.cpp:60-91): a dense LongType id per distinct url. The
reference numbers by first appearance in a sequential file — meaningless
under distribution — so we number by url sort order, which is
deterministic and reproducible across cluster sizes; ranks are keyed by
url/id, never by position (SURVEY.md §2.2 G1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# exact same patterns as the sequential oracle (oracle/extract.py); the
# pandas .str engine applies them Arrow-batch-at-a-time, vectorized
_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_TAG = r"<[^>]*>"
_WS = r"\s+"
_AHREF = r'(?i)<a\b[^>]*\bhref="([^"]*)"[^>]*>'
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    s = html.str.decode("utf-8")
    s = s.str.replace(_SCRIPT_STYLE, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS, " ", regex=True).str.strip()


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    return html.str.decode("utf-8").str.findall(_AHREF)


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, text) — byte-identical to oracle.extract.extract_text."""
    return pages.select("url", extract_text_udf("html").alias("text"))


def extract_href_edges(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, href_pos) — one row per href occurrence,
    duplicates preserved, href_pos = within-page document order."""
    return pages.select(
        F.col("url").alias("src_url"),
        F.posexplode(extract_hrefs_udf("html")).alias("href_pos", "dst_url"),
    ).select("src_url", "dst_url", "href_pos")


def url_dictionary(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """(url, id) dense LongType ids, deterministic by url sort order.

    Scale-safe: NO global window (a partitionless ``row_number`` funnels
    the whole url universe through one task). Instead the distinct urls are
    range-partitioned by url, numbered locally inside each sorted
    partition, and shifted by per-partition offsets (a |partitions|-row
    cumulative sum computed driver-side) — the classic distributed
    zipWithIndex, every stage parallel (see plans.positions)."""
    from ..plans.positions import global_positions

    return global_positions(
        pages.select("url").distinct(), ["url"], partitions
    ).select("url", (F.col("pos") - 1).alias("id"))


def encode_edges(href_edges: DataFrame, url_dict: DataFrame) -> DataFrame:
    """href url-pairs → (src LONG, dst LONG) via dictionary joins.

    Hrefs pointing outside the crawled url universe are dropped (inner
    join) — the node set stays "ids that appear in the page table", the
    distributed analogue of the reference's in-file node universe. The
    dictionary is broadcast when small; at 1e12-url scale it would be a
    bucketed table co-partitioned with the edge shuffle instead.
    """
    src_d = url_dict.select(
        F.col("url").alias("src_url"), F.col("id").alias("src")
    )
    dst_d = url_dict.select(
        F.col("url").alias("dst_url"), F.col("id").alias("dst")
    )
    return (
        href_edges.join(src_d, "src_url").join(dst_d, "dst_url")
        .select("src", "dst")
    )


def pages_to_graph(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full extraction: pages → (edges(src,dst), url_dict(url,id))."""
    d = url_dictionary(pages)
    return encode_edges(extract_href_edges(pages), d), d


_AANCHOR = r'(?is)<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a\s*>'


@F.pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("anchor", T.StringType()),
            ]
        )
    )
)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    """[(href, raw inner html)] per page, document order. findall is the
    vectorized pandas .str engine; the listcomp only reshapes its per-row
    tuple lists into Arrow structs (no row-at-a-time UDF API anywhere)."""
    found = html.str.decode("utf-8").str.findall(_AANCHOR)
    return found.map(
        lambda pairs: [{"href": h, "anchor": a} for h, a in pairs]
    )


def anchor_texts(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor, href_pos) — one row per anchor occurrence
    in document order; ``anchor`` is the link's inner text cleaned with the
    SAME pipeline as extract_text (tags stripped, the five standard
    entities decoded, whitespace collapsed) but applied JVM-side — only the
    regex findall runs in the Arrow UDF, the cleanup is pure built-ins.

    Anchor text is the classic off-page ranking signal (what OTHER pages
    call a target), which is why it aggregates by dst_url downstream."""
    raw = pages.select(
        F.col("url").alias("src_url"),
        F.posexplode(extract_anchors_udf("html")).alias("href_pos", "pair"),
    ).select(
        "src_url",
        F.col("pair.href").alias("dst_url"),
        F.col("pair.anchor").alias("anchor"),
        "href_pos",
    )
    a = F.regexp_replace(F.col("anchor"), _TAG, " ")
    for ent, ch in _ENTITIES:
        a = F.replace(a, F.lit(ent), F.lit(ch))
    a = F.trim(F.regexp_replace(a, _WS, " "))
    return raw.select("src_url", "dst_url", a.alias("anchor"), "href_pos")


def anchor_summary(anchors: DataFrame) -> DataFrame:
    """(dst_url, n_anchors, n_unique_anchors, top_anchor) — per link
    target: total anchor occurrences, distinct anchor strings, and the
    most frequent anchor (ties → lexicographically smallest).

    The arg-max rides a printf sort key (inverted zero-padded count +
    anchor) so ONE min() aggregate resolves it — no window, and the key is
    byte-identical in any engine with printf, which keeps the DuckDB twin
    hash-stable. Scale: two hash aggs keyed by dst_url — partial-agg
    friendly, never wider than the distinct (dst_url, anchor) set."""
    per_anchor = anchors.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("n")
    )
    key = F.concat(
        F.format_string("%010d", F.lit(999999999) - F.col("n")),
        F.lit("#"),
        F.col("anchor"),
    )
    return per_anchor.groupBy("dst_url").agg(
        F.sum("n").alias("n_anchors"),
        F.count("*").alias("n_unique_anchors"),
        F.substring(F.min(key), 12, 1 << 20).alias("top_anchor"),
    )


def anchor_postings(anchors: DataFrame) -> DataFrame:
    """(term, dst_url, tf, df_term) — the anchor-text inverted index:
    for every anchor TERM, the pages it points at with term frequency
    (how often the term appears in anchors targeting that page) and the
    term's posting-list length. This is the index web search serves
    "miserable failure"-style anchor queries from — anchor terms describe
    the TARGET, so the posting key is dst_url.

    Scale: one term explode over the anchor rows, a (term, dst_url) hash
    agg, and a term-keyed agg for df joined back — all map-side
    combinable; posting lists shard naturally by term.
    """
    terms = anchors.select(
        "dst_url",
        F.explode(F.split(F.lower("anchor"), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("term", "dst_url").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df_term"))
    return tf.join(df_, "term").select("term", "dst_url", "tf", "df_term")


def anchor_search(
    anchors: DataFrame, query_terms: list[str], k: int = 10
) -> DataFrame:
    """(dst_url, score, n_terms_hit) — rank pages for a bag-of-words
    anchor query: score = Σ over query terms of tf on that page (exact
    BIGINT), requiring at least one hit; top-k by (score desc, dst_url
    asc). The serving-side read of ``anchor_postings``.

    Scale: the postings are filtered to the |query| terms FIRST (an
    IN-list the optimizer pushes into the scan), so the join touches
    |query| posting lists, never the index.
    """
    if not query_terms:
        raise ValueError("anchor_search needs >= 1 query term")
    qt = [t.lower() for t in query_terms]
    hits = (
        anchor_postings(anchors)
        .where(F.col("term").isin(qt))
        .groupBy("dst_url")
        .agg(
            F.sum("tf").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    key = F.concat(
        F.format_string("%019d", F.lit(10**18) - F.col("score")),
        F.lit("#"),
        F.col("dst_url"),
    )
    ranked = hits.select(
        "dst_url", "score", "n_terms_hit", key.alias("_k")
    )
    topk = ranked.orderBy("_k").limit(int(k))
    return topk.select("dst_url", "score", "n_terms_hit")


def anchor_bm25(
    anchors: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(dst_url, bm25, n_terms_hit) — Okapi BM25 over the anchor-text
    index: the standard web-search ranking where each page's "document"
    is the concatenation of all anchor text pointing AT it.

    Engine-exact scoring without floating logs (the tfidf/surprisal
    trick): idf = idf_bits = floor(log2(n_docs / df)) via the integer
    bin-length chain, and the tf-saturation factor
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` is ONE fixed IEEE
    expression over exact BIGINT inputs (tf, dl, n_docs, total_terms) and
    shared double literals — both engines produce bit-identical doubles,
    and the per-term sum is rounded 6 dp (the repo-wide float-agg
    contract). Terms in more than half the targets get idf 0 — the same
    stopword suppression tfidf_top_terms applies.

    Scale: postings filtered to the |query| terms FIRST; dl and the two
    corpus scalars are hash aggs over the postings; the final rank is a
    TakeOrderedAndProject top-k, never a global sort materialization.
    """
    if not query_terms:
        raise ValueError("anchor_bm25 needs >= 1 query term")
    qt = sorted({t.lower() for t in query_terms})
    k1p1 = k1 + 1.0
    postings = anchor_postings(anchors)
    dl = postings.groupBy("dst_url").agg(F.sum("tf").alias("dl"))
    stats = postings.agg(
        F.countDistinct("dst_url").alias("n_docs"),
        F.sum("tf").alias("total_terms"),
    )
    hits = (
        postings.where(F.col("term").isin(qt))
        .join(dl, "dst_url")
        .crossJoin(F.broadcast(stats))
    )
    idf = (
        F.length(F.bin(F.expr("n_docs div df_term"))) - 1
    ).cast("double")
    avgdl = F.col("total_terms") / F.col("n_docs")
    sat = (F.col("tf") * F.lit(k1p1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    scored = hits.groupBy("dst_url").agg(
        F.round(F.sum(idf * sat), 6).alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )
    return scored.orderBy(F.desc("bm25"), F.asc("dst_url")).limit(int(k))


def latest_capture(pages):
    """The newest capture per url — Common Crawl ships multiple WARC
    captures of the same page across crawls; everything downstream
    (extraction, dedup, ranking) wants exactly one row per url, the
    freshest (reference feeds single-capture page dumps,
    prepletanje.cpp; multi-capture collapse is the north-rule Iceberg
    reality).

    Shape: (url, max warc_ts) hash agg + an equi-join back on
    (url, warc_ts) — both shuffles hash on url, so AQE co-locates them;
    no window, no per-row Python. Capture timestamps per url are unique
    in a WARC store (one fetch per crawl), which makes the join-back
    exact; ties would duplicate, so upstream stores must keep (url,
    warc_ts) unique — the same invariant Iceberg's MERGE key would
    enforce.
    """
    from pyspark.sql import functions as F

    win = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    return pages.join(win, ["url", "warc_ts"])


def capture_change_stats(pages):
    """(url, n_captures BIGINT, n_versions BIGINT, changed BOOLEAN) —
    per-url crawl-freshness signal over the multi-capture store: how many
    WARC captures exist, how many DISTINCT contents among them (by text
    md5), and whether the page ever changed. Feeds re-crawl scheduling —
    a changed=true page earns a shorter revisit interval (Cho &
    Garcia-Molina 2003), composing with host_crawl_budget.

    Shape: ONE hash agg on url (count + count-distinct-md5, map-side
    combine). No window, no join.
    """
    from pyspark.sql import functions as F

    return pages.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias(
            "n_versions"
        ),
        (
            F.countDistinct(F.md5(F.col("text").cast("binary"))) > 1
        ).alias("changed"),
    )
