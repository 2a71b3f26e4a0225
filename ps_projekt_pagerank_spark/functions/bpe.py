"""Distributed BPE merge-table induction (Sennrich/Haddow/Birch, ACL 2016)
— learn the byte-pair-encoding vocabulary itself, not just count tokens
under a fixed tokenizer (that is ``text.bpe_ish_token_stats``).

Why this scales to a 100 TB corpus: the ONLY full-corpus pass is the
word-frequency dictionary (a heavy-hitter groupBy — |vocab| << |corpus|).
Every merge round after that is O(|vocab|) work over the dictionary:
count adjacent symbol pairs weighted by word frequency, take the global
argmax, rewrite the symbol strings. This is exactly why classic BPE
learners operate on the word-frequency dict and why the operator is
cluster-friendly — the corpus is touched once.

Engine-exact construction (no floats, no RNG, no lookaround regex):

* a word's symbol sequence is ONE string with a two-space invariant —
  two spaces before the first symbol, between every adjacent pair, and
  after the last (``"  l  o  w  </w>  "``). A merge of pair (a, b) is a
  plain GLOBAL ``regexp_replace`` of ``" a  b "`` with ``" ab "``: each
  match consumes one space of each flanking boundary and the replacement
  restores it, so the invariant is preserved AND the scan-resumes-after-
  replacement semantics of global replace gives exactly BPE's
  left-to-right non-overlapping merge order ("a a a" -> "aa a"). No
  lookbehind needed, so the construction runs identically under Java
  regex (Spark) and RE2 (DuckDB).
* pair counts are exact BIGINT sums of word frequencies over every
  adjacent position (repeated pairs inside one word count per position,
  as in the reference BPE implementation); the per-round winner is the
  lexicographically smallest (left, right) among maximal counts.
* the learned alphabet is ``[a-z]`` plus the ``</w>`` end-of-word marker
  (words are ``regexp_extract_all(lower(text), '[a-z]+')``), so every
  symbol — including every merged symbol — is regex-literal and needs no
  escaping when spliced into the merge pattern.

Merges are learned in BATCHED rounds (round-4 verdict task 5): one
driver action collects the top-K candidate pairs PLUS, per candidate,
the maximum adjacent-trigram count — an upper bound on the count of any
NEW pair a merge can create (a new pair (x, ab) only arises at trigram
(x, a, b) positions, and (ab, y) at (a, b, y); a pair between two
freshly merged symbols is bounded by the leading trigram too). The
driver then accepts a sorted PREFIX of candidates, stopping at the
first that (a) CHAIN-overlaps an accepted merge — its left equals an
accepted right, its right equals an accepted left, or either symbol
equals an accepted merged string — or (b) has a count not strictly
above every accepted merge's trigram bound (a created pair could
overtake it). Sharing only the same LEFT (or only the same RIGHT)
symbol is safe and accepted: applying (a,b) consumes exactly the
a-tokens followed by b and the b-tokens preceded by a, so an
occurrence of (a,d) with d≠b or (c,b) with c≠a is positionally
untouched and its stale count stays EXACT; an applied pair's own count
drops to zero under left-to-right global replace, and every pair a
merge CREATES contains the merged symbol, which no candidate may use.
The batched merge table is therefore IDENTICAL to sequential greedy —
the unchanged sequential SQL twin is the proof obligation the gate
checks every round. Worst case (every step interacts) degenerates to top-1
per action, i.e. exactly the old loop; typical text accepts several
merges per action, cutting driver round-trips proportionally.

Reference parity: the reference engine has no tokenizer induction — this
is part of the training-data-pipeline surface the brief adds on top of
the link-graph core (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_MARK = "</w>"
WORD_RE = "[a-z]+"


def _word_dict(docs: DataFrame, text_col: str) -> DataFrame:
    """(sym STRING, freq BIGINT) — the word-frequency dictionary with each
    word rendered in the two-space symbol representation."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("word")
    )
    sym = F.concat(
        F.lit("  "),
        F.regexp_replace(F.col("word"), "(.)", "$1  "),
        F.lit(END_MARK + "  "),
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    ).select(sym.alias("sym"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count BIGINT) — adjacent-pair counts
    weighted by word frequency, one count per adjacent position."""
    syms = F.split(F.trim(F.col("sym")), "  ")
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, F.lit(1), n - 1).alias("l"),
        F.slice(syms, F.lit(2), n - 1).alias("r"),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .select(
            F.col("p.l").alias("left_sym"),
            F.col("p.r").alias("right_sym"),
            "freq",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _trigram_counts(vocab: DataFrame) -> DataFrame:
    """(s1, s2, s3, tri_count BIGINT) — adjacent symbol triples weighted
    by word frequency (2-symbol words contribute none)."""
    syms = F.split(F.trim(F.col("sym")), "  ")
    n = F.size(syms)
    tris = F.arrays_zip(
        F.slice(syms, F.lit(1), n - 2).alias("a"),
        F.slice(syms, F.lit(2), n - 2).alias("b"),
        F.slice(syms, F.lit(3), n - 2).alias("c"),
    )
    return (
        vocab.where(n >= 3)
        .select(F.explode(tris).alias("t"), "freq")
        .select(
            F.col("t.a").alias("s1"),
            F.col("t.b").alias("s2"),
            F.col("t.c").alias("s3"),
            "freq",
        )
        .groupBy("s1", "s2", "s3")
        .agg(F.sum("freq").cast("long").alias("tri_count"))
    )


def _batch_candidates(vocab: DataFrame, k: int) -> list:
    """ONE driver action: the top-``k`` pairs by (count desc, lex) with,
    per pair, the max adjacent-trigram count (``tri_bound``, -1 when the
    pair only ever spans a whole 2-symbol word and so can create no new
    pair). Identical pair-count exchanges are reused within the job."""
    pc = _pair_counts(vocab)
    top = pc.orderBy(
        F.col("pair_count").desc(), "left_sym", "right_sym"
    ).limit(k)
    tri = _trigram_counts(vocab)
    key = top.select("left_sym", "right_sym")
    pre = (
        tri.join(
            F.broadcast(key),
            (F.col("s2") == F.col("left_sym"))
            & (F.col("s3") == F.col("right_sym")),
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.max("tri_count").alias("tb_pre"))
    )
    post = (
        tri.join(
            F.broadcast(key),
            (F.col("s1") == F.col("left_sym"))
            & (F.col("s2") == F.col("right_sym")),
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.max("tri_count").alias("tb_post"))
    )
    return (
        top.join(pre, ["left_sym", "right_sym"], "left")
        .join(post, ["left_sym", "right_sym"], "left")
        .select(
            "left_sym",
            "right_sym",
            "pair_count",
            F.greatest(
                F.coalesce("tb_pre", F.lit(-1)),
                F.coalesce("tb_post", F.lit(-1)),
            ).alias("tri_bound"),
        )
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .collect()
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_top_k: int = 16,
) -> DataFrame:
    """(round INT, left_sym STRING, right_sym STRING, pair_count BIGINT)
    — the first ``n_merges`` BPE merges learned from ``docs[text_col]``,
    in merge order (round is 1-based), bit-identical to sequential
    greedy (see module docstring for the batching proof). Stops early if
    the dictionary runs out of adjacent pairs (every word fully merged).
    ``bpe_learn_merges.last_actions`` records the candidate-collect
    action count of the most recent call (bench visibility)."""
    if n_merges < 1:
        raise ValueError(f"bpe_learn_merges: n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = _word_dict(docs, text_col).persist()
    merges: list[tuple[int, str, str, int]] = []
    actions = 0
    try:
        while len(merges) < n_merges:
            cand = _batch_candidates(vocab, batch_top_k)
            actions += 1
            if not cand:
                break
            accepted: list[tuple[str, str]] = []
            used_l: set[str] = set()
            used_r: set[str] = set()
            used_m: set[str] = set()
            max_bound = -1
            for row in cand:
                left, right, cnt, bound = (
                    row["left_sym"],
                    row["right_sym"],
                    row["pair_count"],
                    row["tri_bound"],
                )
                chained = (
                    left in used_r
                    or right in used_l
                    or left in used_m
                    or right in used_m
                )
                if accepted and (chained or cnt <= max_bound):
                    break  # stop, never skip: the real next winner may
                    # be this rejected candidate after recount
                merges.append((len(merges) + 1, left, right, cnt))
                accepted.append((left, right))
                used_l.add(left)
                used_r.add(right)
                used_m.add(left + right)
                max_bound = max(max_bound, bound)
                if len(merges) >= n_merges:
                    break
            if len(merges) >= n_merges:
                break  # budget filled — the rewritten dict is unused
            sym = F.col("sym")
            for left, right in accepted:
                sym = F.regexp_replace(
                    sym,
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {left}{right} "),
                )
            nxt = vocab.select(sym.alias("sym"), "freq").persist()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    bpe_learn_merges.last_actions = actions
    return spark.createDataFrame(
        merges, "round INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, bpe_tokens BIGINT) — token count per document under the
    learned merge table: apply every merge in order to each word, count
    resulting symbols. Pure column algebra (a regexp_replace chain) —
    no Python in the hot path."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("word"),
    )
    sym = F.concat(
        F.lit("  "),
        F.regexp_replace(F.col("word"), "(.)", "$1  "),
        F.lit(END_MARK + "  "),
    )
    for left, right in merges:
        sym = F.regexp_replace(
            sym, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        )
    n_sym = F.size(F.split(F.trim(sym), "  ")).cast("long")
    return (
        words.groupBy(id_col)
        .agg(F.sum(n_sym).alias("bpe_tokens"))
        .select(id_col, "bpe_tokens")
    )


def _learn_ctes(docs_sql: str, n_merges: int) -> list[str]:
    """Shared CTE list for the learn chain: w, v0, then per round
    p{r} (pair counts), b{r} (winner), v{r} (rewritten dictionary)."""
    parts = [
        f"w AS MATERIALIZED (SELECT unnest(regexp_extract_all(lower(text), "
        f"'{WORD_RE}')) AS word FROM ({docs_sql}))",
        "v0 AS MATERIALIZED (SELECT '  ' || "
        "regexp_replace(word, '(.)', '\\1  ', 'g') || "
        f"'{END_MARK}  ' AS sym, CAST(count(*) AS BIGINT) AS freq "
        "FROM w GROUP BY 1)",
    ]
    for r in range(1, n_merges + 1):
        prev = f"v{r - 1}"
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT p[1] AS left_sym, p[2] AS right_sym, "
            f"CAST(SUM(freq) AS BIGINT) AS pair_count FROM "
            f"(SELECT unnest(list_zip(string_split(trim(sym), '  '), "
            f"string_split(trim(sym), '  ')[2:])) AS p, freq FROM {prev}) "
            f"WHERE p[2] IS NOT NULL GROUP BY 1, 2)"
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT left_sym, right_sym, pair_count FROM p{r} "
            f"ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"
        )
        if r < n_merges:
            bl = f"(SELECT left_sym FROM b{r})"
            br = f"(SELECT right_sym FROM b{r})"
            parts.append(
                f"v{r} AS MATERIALIZED (SELECT regexp_replace(sym, "
                f"' ' || {bl} || '  ' || {br} || ' ', "
                f"' ' || {bl} || {br} || ' ', 'g') AS sym, freq FROM {prev})"
            )
    return parts


def bpe_encode_learned_sql(
    docs_sql: str, n_merges: int, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of learn-then-encode: the learn chain's per-round
    winners are replayed over the per-document word table, then symbols
    are counted per document. An early-stopped round (empty b{r}) makes
    its scalar subqueries NULL; the COALESCE guard turns that round's
    pattern into an unmatchable NUL literal so the document symbols pass
    through unchanged — matching the Spark loop's break."""
    parts = _learn_ctes(docs_sql, n_merges)
    parts.append(
        f"d0 AS MATERIALIZED (SELECT {id_col}, '  ' || "
        "regexp_replace(word, '(.)', '\\1  ', 'g') || "
        f"'{END_MARK}  ' AS sym FROM (SELECT {id_col}, "
        f"unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word "
        f"FROM ({docs_sql})))"
    )
    for r in range(1, n_merges + 1):
        bl = f"(SELECT left_sym FROM b{r})"
        br = f"(SELECT right_sym FROM b{r})"
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT {id_col}, regexp_replace(sym, "
            f"COALESCE(' ' || {bl} || '  ' || {br} || ' ', chr(1)), "
            f"COALESCE(' ' || {bl} || {br} || ' ', ''), 'g') AS sym "
            f"FROM d{r - 1})"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT {id_col}, CAST(SUM(len(string_split(trim(sym), '  '))) "
        f"AS BIGINT) AS bpe_tokens FROM d{n_merges} GROUP BY {id_col}"
    )


def bpe_learn_merges_sql(docs_sql: str, n_merges: int) -> str:
    """DuckDB twin of :func:`bpe_learn_merges` — the merge loop unrolled
    as CTE rounds; each round's winner is a scalar subquery spliced into
    the next round's global regexp_replace. Early-stop parity: an empty
    round makes the scalar subqueries NULL, the rewritten sym NULL, and
    every later round empty — matching the Spark loop's break."""
    if n_merges < 1:
        raise ValueError(f"bpe_learn_merges_sql: n_merges must be >= 1, got {n_merges}")
    parts = _learn_ctes(docs_sql, n_merges)
    union = " UNION ALL ".join(
        f"SELECT {r} AS round, left_sym, right_sym, pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT * FROM ({union}) ORDER BY round"
    )
