"""Line-level corpus cleaning — the C4 recipe (Raffel et al. 2020, §2.2)
re-expressed as DataFrame algebra, plus the cross-document boilerplate
detector that motivates it.

The reference engine ranks pages it extracted from raw HTML
(``extract.cpp`` walks anchor/text nodes); a training-data pipeline over
the same crawl then has to clean the extracted text. C4's published
rules are the canonical recipe: keep only lines ending in terminal
punctuation, drop short lines, drop javascript notices, kill pages with
"lorem ipsum" or code braces, and deduplicate repeated spans across the
corpus so shared boilerplate survives exactly once.

Scale shape: one ``posexplode`` to |lines| rows, JVM-side predicate
filters, one hash-agg + equi-join on the line string for the
first-occurrence dedup (map-side combinable; the hot boilerplate lines
are exactly the high-frequency groups AQE handles), and one per-doc
agg to reassemble. No windows, no driver loops, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One occurrence key per (doc, line-position): pos is bounded by the page
# line count (< _POS_BASE always — asserted by the splitter's contract),
# so doc_id * _POS_BASE + pos is a collision-free BIGINT in both engines.
_POS_BASE = 1024

_TERMINAL_RE = '[.!?"]$'


def split_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, line) — one row per newline-separated line, pos
    0-based in document order."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def _retained(line: Column, min_words: int) -> Column:
    return (
        line.rlike(_TERMINAL_RE)
        & (F.size(F.split(line, " ")) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def boilerplate_lines(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """(line, n_docs) — lines occurring in ≥ ``min_docs`` DISTINCT
    documents: the site-chrome / copyright / cookie-notice signal a
    host-level cleaner strips. Pure hash agg on the line string."""
    return (
        split_lines(docs, text_col)
        .groupBy("line")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def c4_clean(
    docs: DataFrame,
    min_words: int = 3,
    min_kept: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, n_kept, n_dropped) — the C4 line-level cleaning
    pass over multi-line pages:

    page rules   — drop any page containing "lorem ipsum" (lowercased)
                   or a '{' (code), before line processing;
    line rules   — keep a line iff it ends in terminal punctuation
                   ([.!?"]), has ≥ ``min_words`` space-separated words,
                   and does not contain "javascript" (lowercased);
    corpus dedup — a retained line string that occurs multiple times
                   across the corpus survives only at its first
                   occurrence (minimal (doc_id, pos)); every other copy
                   is dropped as boilerplate;
    page floor   — pages with fewer than ``min_kept`` surviving lines
                   are dropped entirely.

    ``text`` is the surviving lines re-joined with '\\n' in original
    order; ``n_dropped`` counts the page's original lines that did not
    survive. Reassembly is sort_array over collected (pos, line) structs
    — per-doc, never a global sort.
    """
    pages = docs.select("doc_id", F.col(text_col).alias("text")).where(
        ~F.lower(F.col("text")).contains("lorem ipsum")
        & ~F.col("text").contains("{")
    )
    lines = split_lines(pages)
    retained = lines.where(_retained(F.col("line"), min_words))
    key = (F.col("doc_id") * _POS_BASE + F.col("pos")).alias("k")
    first = (
        retained.select("line", key)
        .groupBy("line")
        .agg(F.min("k").alias("mk"))
    )
    kept = retained.join(first, "line").where(
        F.col("doc_id") * _POS_BASE + F.col("pos") == F.col("mk")
    )
    totals = pages.select(
        "doc_id", F.size(F.split("text", "\n")).alias("n_lines")
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
    )
    return (
        agg.join(totals, "doc_id")
        .where(F.col("n_kept") >= min_kept)
        .select(
            "doc_id",
            "text",
            F.col("n_kept").cast("long").alias("n_kept"),
            (F.col("n_lines") - F.col("n_kept")).cast("long").alias(
                "n_dropped"
            ),
        )
    )


def boilerplate_lines_sql(docs_sql: str, min_docs: int = 3) -> str:
    """DuckDB twin of boilerplate_lines — identical chr(10) split and
    distinct-doc counting."""
    return (
        f"WITH p AS (SELECT doc_id, string_split(text, chr(10)) AS parts "
        f"FROM ({docs_sql})), "
        "l AS (SELECT doc_id, unnest(parts) AS line FROM p) "
        "SELECT line, count(DISTINCT doc_id) AS n_docs FROM l "
        f"GROUP BY line HAVING count(DISTINCT doc_id) >= {int(min_docs)}"
    )


def c4_clean_sql(
    docs_sql: str, min_words: int = 3, min_kept: int = 2
) -> str:
    """DuckDB twin of c4_clean — same page/line rules (RE2 and Java
    agree on the terminal-punctuation class), same doc_id*1024+pos
    first-occurrence key, string_agg ORDER BY pos for reassembly."""
    return (
        "WITH pages AS (SELECT doc_id, text FROM (" + docs_sql + ") "
        "WHERE NOT contains(lower(text), 'lorem ipsum') "
        "AND NOT contains(text, '{')), "
        "px AS (SELECT doc_id, string_split(text, chr(10)) AS parts "
        "FROM pages), "
        "lx AS (SELECT doc_id, parts, "
        "unnest(range(0, len(parts))) AS pos FROM px), "
        "l AS (SELECT doc_id, pos, parts[pos + 1] AS line FROM lx), "
        "retained AS (SELECT * FROM l WHERE "
        f"regexp_matches(line, '{_TERMINAL_RE}') "
        f"AND len(string_split(line, ' ')) >= {int(min_words)} "
        "AND NOT contains(lower(line), 'javascript')), "
        f"first AS (SELECT line, min(doc_id * {_POS_BASE} + pos) AS mk "
        "FROM retained GROUP BY line), "
        "kept AS (SELECT r.doc_id, r.pos, r.line FROM retained r "
        "JOIN first f ON r.line = f.line "
        f"AND r.doc_id * {_POS_BASE} + r.pos = f.mk), "
        "totals AS (SELECT doc_id, len(string_split(text, chr(10))) "
        "AS n_lines FROM pages), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
        "string_agg(line, chr(10) ORDER BY pos) AS text FROM kept "
        "GROUP BY doc_id) "
        "SELECT a.doc_id, a.text, a.n_kept, "
        "CAST(t.n_lines - a.n_kept AS BIGINT) AS n_dropped "
        "FROM agg a JOIN totals t USING (doc_id) "
        f"WHERE a.n_kept >= {int(min_kept)}"
    )
