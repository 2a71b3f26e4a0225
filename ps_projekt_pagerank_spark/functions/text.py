"""Text-analysis column functions for training-data pipelines.

All pure `pyspark.sql.functions` compositions (whole-stage codegen'd,
zero Python): token counting, quality scoring, language-ID heuristic,
document fingerprinting. Each has an exactly-equivalent ANSI/DuckDB SQL
form used by the correctness oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny function-word lists for the language-ID heuristic (shared with the
# SQL oracle; deliberately short + lowercase-only so both engines agree)
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]
SL_STOPWORDS = ["in", "je", "na", "se", "za", "da", "ki", "so", "ne", "pri"]
PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    """whitespace tokens (single-space split; empty tokens preserved so the
    SQL oracle's string_split agrees exactly)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column | str) -> Column:
    return F.length(text).cast("long")


def punct_count(text: Column | str) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    ).cast("long")


def stopword_count(text: Column | str, words: list[str]) -> Column:
    tok = tokens(F.lower(text))
    return F.size(F.filter(tok, lambda t: t.isin(*words))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length / punctuation / stopword-ratio quality signals, rounded to a
    cross-engine-stable precision."""
    n_tok = token_count(text_col)
    return df.select(
        "doc_id",
        char_count(text_col).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        punct_count(text_col).alias("n_punct"),
        F.round(
            stopword_count(text_col, EN_STOPWORDS) / n_tok.cast("double"), 6
        ).alias("stopword_ratio"),
        F.round(char_count(text_col) / n_tok.cast("double"), 6).alias(
            "avg_token_len"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: argmax of function-word hits
    between English and Slovene lists (ties → 'en')."""
    en = stopword_count(text_col, EN_STOPWORDS)
    sl = stopword_count(text_col, SL_STOPWORDS)
    return df.select(
        "doc_id",
        en.alias("en_hits"),
        sl.alias("sl_hits"),
        F.when(sl > en, F.lit("sl")).otherwise(F.lit("en")).alias("lang_pred"),
    )


def _ngrams(tok: Column, n: int) -> Column:
    """array of space-joined word n-grams (empty when fewer than n
    tokens)."""
    if n == 1:
        return tok
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.array_join(F.slice(tok, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repeated_ngram_stats(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Per-document duplicate-n-gram ratios — the Gopher/MassiveText
    repetition signals (Rae et al. 2021 §A1.1): dup_ratio_{n} =
    1 - distinct/total over the document's word n-grams. High ratios mark
    boilerplate, keyword stuffing, and template spam — the documents an
    LLM-data pipeline drops before dedup even runs.

    Pure built-ins (split/sequence/slice/array_distinct — JVM-side,
    whole-stage codegen); one row pass, no shuffle, no Python.

    The token array and each n-gram array get their own projection:
    inlined into the slice lambda the tokenizer would be re-evaluated
    once per n-gram (the winnowing O(n^2) lesson, operators/winnow.py).
    """
    toked = df.select(
        "doc_id", F.filter(tokens(text_col), lambda t: t != "").alias("_tok")
    )
    tok = F.col("_tok")
    grammed = toked.select(
        "doc_id",
        tok,
        *[_ngrams(tok, n).alias(f"_g{n}") for n in ns],
    )
    cols = [F.col("doc_id"), F.size(tok).cast("long").alias("n_tokens")]
    for n in ns:
        g = F.col(f"_g{n}")
        total = F.size(g)
        dup = F.when(
            total > 0,
            F.round(
                (total - F.size(F.array_distinct(g))) / total.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))
        cols += [
            total.cast("long").alias(f"total_{n}gr"),
            dup.alias(f"dup_ratio_{n}gr"),
        ]
    return grammed.select(*cols)


def repeated_ngram_sql(
    docs_expr: str, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> str:
    """DuckDB twin of ``repeated_ngram_stats`` — same tokenization, same
    n-gram windows, same rounding."""
    tok = f"list_filter(string_split({text_col}, ' '), t -> t <> '')"
    parts = [f"SELECT doc_id, CAST(len({tok}) AS BIGINT) AS n_tokens"]
    for n in ns:
        if n == 1:
            g = tok
        else:
            g = (
                f"(CASE WHEN len({tok}) >= {n} THEN "
                f"list_transform(generate_series(1, len({tok}) - {n - 1}), "
                f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) "
                f"ELSE [] END)"
            )
        parts.append(
            f"CAST(len({g}) AS BIGINT) AS total_{n}gr, "
            f"CASE WHEN len({g}) > 0 THEN "
            f"round((len({g}) - len(list_distinct({g}))) "
            f"/ CAST(len({g}) AS DOUBLE), 6) ELSE 0.0 END "
            f"AS dup_ratio_{n}gr"
        )
    return ", ".join(parts) + f" FROM ({docs_expr})"


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100000,
    max_dup_2gr: float = 0.6,
    max_dup_3gr: float = 0.4,
) -> DataFrame:
    """(doc_id, keep BOOLEAN, n_tokens, dup_ratio_2gr, dup_ratio_3gr) —
    the composed Gopher-style keep/drop rule: length window + repetition
    caps. The thresholds are knobs; the defaults mirror the published
    MassiveText cuts loosely (the synthetic corpus has no real boilerplate
    to calibrate on)."""
    s = repeated_ngram_stats(df, text_col, ns=(2, 3))
    return s.select(
        "doc_id",
        "n_tokens",
        "dup_ratio_2gr",
        "dup_ratio_3gr",
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("dup_ratio_2gr") <= max_dup_2gr)
            & (F.col("dup_ratio_3gr") <= max_dup_3gr)
        ).alias("keep"),
    )


def fingerprint(text: Column | str) -> Column:
    """deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (the rolling-hash analogue, portable across engines)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )


def lm_surprisal_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_token_freq, bits_per_token) — unigram
    language-model scoring against the corpus's own token distribution,
    the CCNet/Gopher-style "how surprising is this document" filter signal:

    - mean_token_freq: mean over token OCCURRENCES of corpus probability
      c(t)/N — boilerplate scores high, rare-token gibberish scores low.
    - bits_per_token: mean floor(log2(N / c(t))) — integer-quantized
      unigram surprisal (1-bit resolution perplexity proxy).

    Determinism contract: floor(log2(N/c)) is computed as
    length(bin(N div c)) - 1 — pure int64 ops (floor(log2(floor(x))) ==
    floor(log2(x)) for x >= 1), NO floating log anywhere, so any engine
    reproduces every row bit-for-bit; the two means are single IEEE
    divisions of exact BIGINT moments. The price is the 1-bit surprisal
    resolution, which the filter use-case doesn't feel.

    Scale: one token explode, one |vocab|-row count agg (map-side
    combinable), a broadcast scalar for N, one |tokens|-row equi-join on
    the term (AQE salts the stopword hot keys), one per-doc agg.
    """
    occ = docs.select(
        "doc_id", F.explode(tokens(F.lower(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    cnt = occ.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = cnt.agg(F.sum("c").alias("n_corpus"))
    j = occ.join(cnt, "tok").crossJoin(F.broadcast(n_total))
    per = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("c").alias("sum_c"),
        F.sum(
            F.length(F.bin(F.expr("n_corpus div c"))).cast("long") - 1
        ).alias("sum_bits"),
        F.max("n_corpus").alias("n_corpus"),
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        (
            F.col("sum_c").cast("double")
            / F.col("n_corpus").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("mean_token_freq"),
        (
            F.col("sum_bits").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("bits_per_token"),
    )


def lm_surprisal_sql(docs_sql: str) -> str:
    """DuckDB twin — identical bin/div integer chain and IEEE divisions."""
    return (
        f"WITH d AS (SELECT doc_id, text FROM ({docs_sql})), "
        "occ AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) "
        "AS tok FROM d), "
        "occ2 AS (SELECT doc_id, tok FROM occ WHERE tok <> ''), "
        "cnt AS (SELECT tok, count(*) AS c FROM occ2 GROUP BY tok), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_corpus FROM cnt), "
        "j AS (SELECT doc_id, c, n_corpus FROM occ2 JOIN cnt USING (tok) "
        "CROSS JOIN tot), "
        "per AS (SELECT doc_id, count(*) AS n_tokens, "
        "CAST(sum(c) AS BIGINT) AS sum_c, "
        "CAST(sum(length(bin(n_corpus // c)) - 1) AS BIGINT) AS sum_bits, "
        "max(n_corpus) AS n_corpus FROM j GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens, "
        "CAST(p.sum_c AS DOUBLE) / CAST(p.n_corpus AS DOUBLE) / "
        "CAST(p.n_tokens AS DOUBLE) AS mean_token_freq, "
        "CAST(p.sum_bits AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) AS "
        "bits_per_token "
        "FROM d LEFT JOIN per p USING (doc_id)"
    )


def perplexity_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, bits_per_token, bucket) — CCNet-style quality
    tiers (Wenzek et al., LREC 2020 §4.3: documents sorted by LM
    perplexity, corpus cut into head/middle/tail thirds; head = least
    surprising = closest to the reference LM). The LM here is the
    corpus-own unigram model of ``lm_surprisal_stats`` (the
    no-floating-log bits_per_token chain) and the cuts are the EXACT 1/3
    and 2/3 quantiles (operators.quantiles.exact_quantiles — distributed
    numbering, engine-identical rank arithmetic).

    Ties at a threshold all fall to the lower bucket (<=), so bucket
    sizes can deviate from n/3 on tie-heavy corpora — deterministic in
    both engines either way. Zero-token documents are excluded (their
    surprisal is undefined).

    Scale: the surprisal aggs + one count + the two-row quantile probe
    broadcast back over the stats — nothing wider than lm_surprisal_stats
    itself.
    """
    from ..operators.quantiles import exact_quantiles

    stats = lm_surprisal_stats(docs, text_col).where(F.col("n_tokens") > 0)
    th = exact_quantiles(
        stats, "bits_per_token", [1 / 3, 2 / 3], key_col="doc_id"
    )
    t = th.agg(
        F.min(F.when(F.col("q") < 0.5, F.col("value"))).alias("t1"),
        F.min(F.when(F.col("q") > 0.5, F.col("value"))).alias("t2"),
    )
    return stats.crossJoin(F.broadcast(t)).select(
        "doc_id",
        "n_tokens",
        "bits_per_token",
        F.when(F.col("bits_per_token") <= F.col("t1"), F.lit("head"))
        .when(F.col("bits_per_token") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def perplexity_buckets_sql(docs_sql: str) -> str:
    """DuckDB twin — the surprisal chain, the identical ceil(q·n) rank
    probe (sequential row_number stands in for global_positions), and the
    same <= threshold CASE."""
    t1q, t2q = float(1 / 3), float(2 / 3)
    return (
        f"WITH st0 AS MATERIALIZED ({lm_surprisal_sql(docs_sql)}), "
        "st AS (SELECT doc_id, n_tokens, bits_per_token FROM st0 "
        "WHERE n_tokens > 0), "
        "nn AS (SELECT count(*) AS n FROM st), "
        f"qs(q) AS (VALUES (CAST({t1q!r} AS DOUBLE)), "
        f"(CAST({t2q!r} AS DOUBLE))), "
        "probe AS (SELECT q, greatest(1, CAST(ceil(q * nn.n) AS BIGINT)) "
        "AS rank FROM qs, nn), "
        "pos AS (SELECT bits_per_token AS value, row_number() OVER "
        "(ORDER BY bits_per_token ASC, doc_id ASC) AS rank FROM st), "
        "th AS (SELECT min(CASE WHEN q < CAST(0.5 AS DOUBLE) THEN value "
        "END) AS t1, min(CASE WHEN q > CAST(0.5 AS DOUBLE) THEN value "
        "END) AS t2 FROM probe JOIN pos ON pos.rank = probe.rank) "
        "SELECT doc_id, n_tokens, bits_per_token, "
        "CASE WHEN bits_per_token <= t1 THEN 'head' "
        "WHEN bits_per_token <= t2 THEN 'middle' ELSE 'tail' END AS bucket "
        "FROM st, th"
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """(doc_id, term, tf, df, idf_bits, score, term_rank) — the top-k
    characteristic terms per document by tf-idf with an integer-quantized
    idf: idf_bits = floor(log2(N_docs / df)) (same exact bin/div chain as
    ``lm_surprisal_stats`` — no floating log, engine-exact), score =
    tf * idf_bits as BIGINT, ties broken by term ascending. Terms in more
    than half the corpus get idf_bits 0 and never rank — the stopword
    suppression tf-idf exists for.

    Scale: token explode, (doc, term) and term-df hash aggs, broadcast
    scalar N_docs, and a per-doc window (partitioned by doc_id — each
    partition is one document's vocabulary, never a global sort).
    """
    from pyspark.sql import Window

    occ = docs.select(
        "doc_id", F.explode(tokens(F.lower(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = occ.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.length(F.bin(F.expr("n_docs div df"))).cast("long") - 1
            ).alias("idf_bits"),
        )
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "idf_bits",
            (F.col("tf") * F.col("idf_bits")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.select(
            "*", F.row_number().over(w).alias("term_rank")
        ).where(F.col("term_rank") <= int(k))
    )


def tfidf_top_terms_sql(docs_sql: str, k: int = 5) -> str:
    """DuckDB twin — identical aggs, idf chain, and window ordering."""
    return (
        f"WITH d AS (SELECT doc_id, text FROM ({docs_sql})), "
        "occ AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) "
        "AS term FROM d), "
        "occ2 AS (SELECT doc_id, term FROM occ WHERE term <> ''), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM occ2 "
        "GROUP BY doc_id, term), "
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "nd AS (SELECT count(*) AS n_docs FROM d), "
        "scored AS (SELECT doc_id, term, tf, df, "
        "CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf_bits "
        "FROM tf JOIN dfq USING (term) CROSS JOIN nd), "
        "ranked AS (SELECT doc_id, term, tf, df, idf_bits, "
        "tf * idf_bits AS score, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY tf * idf_bits DESC, term ASC) AS term_rank FROM scored) "
        "SELECT doc_id, term, tf, df, idf_bits, score, term_rank "
        f"FROM ranked WHERE term_rank <= {int(k)}"
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    min_pmi_bits: int = 1,
) -> DataFrame:
    """(w1, w2, pair_count, pmi_bits) — adjacent-token collocations with
    positive pointwise mutual information, the classic phrase-discovery /
    tokenizer-merge-candidate report (Church & Hanks 1990):

        PMI(x,y) = log2( p(xy) / (p(x)·p(y)) )
                 = log2( c_xy · N² / (M · c_x · c_y) )

    with c_xy = bigram count, M = total bigrams, c_x = unigram occurrence
    counts, N = total tokens. ``pmi_bits`` = floor of that log2, computed
    on the SAME no-floating-log bin/div chain as ``lm_surprisal_stats``
    (pure int64 — engine-exact); only pairs with PMI ratio >= 2^min_pmi_bits
    and count >= min_count are emitted, so the bound below never bites on
    noise pairs.

    int64 bound: c_xy·N² must fit — safe to N ≈ 3·10^9 tokens per run;
    at full-crawl scale shard the corpus (PMI is per-shard diagnostics)
    or move the product to DECIMAL(38,0) and accept engine-checked rather
    than bit-checked equality.

    Scale: one bigram explode, two hash aggs (bigram + unigram counts),
    two |vocab|-row equi-joins onto the bigram table, broadcast scalars;
    hot stopword unigrams are join keys but the bigram table is already
    count-filtered before the join, so no skew amplification.
    """
    toks = docs.select(
        F.filter(
            tokens(F.lower(text_col)), lambda t: t != ""
        ).alias("toks")
    )
    n_sz = F.size("toks")
    big = toks.select(
        F.when(
            n_sz >= 2,
            F.transform(
                F.sequence(F.lit(0), n_sz - 2),
                lambda i: F.struct(
                    F.element_at("toks", i + 1).alias("w1"),
                    F.element_at("toks", i + 2).alias("w2"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        .alias("bg")
    ).select(F.explode("bg").alias("b")).select("b.w1", "b.w2")
    uni = toks.select(F.explode("toks").alias("w"))
    cxy = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= int(min_count))
    )
    cx = uni.groupBy("w").agg(F.count("*").alias("c"))
    totals = uni.agg(F.count("*").alias("n_tok")).crossJoin(
        big.agg(F.count("*").alias("m_big"))
    )
    j = (
        cxy.join(cx.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(cx.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    # overflow guard (VERDICT r3 task 8): the integer-log ratio multiplies
    # counts up to n_tok² — past ~3.03e9 tokens (floor(sqrt(2^63-1))) the
    # products wrap int64. Fail loudly with the remedy; the guard's own
    # conditions only compute products already proven to fit.
    _i64max = 9223372036854775807
    _sqrt_i64 = 3037000499
    j = j.withColumn("_ratio", F.expr(
        f"CASE WHEN n_tok > {_sqrt_i64} OR m_big > {_sqrt_i64} THEN "
        "raise_error('pmi_collocations: corpus exceeds the ~3e9-token "
        "int64 bound of the integer-log ratio — shard the corpus or "
        "rescale counts') "
        f"WHEN pair_count > {_i64max} div (n_tok * n_tok) OR "
        f"c1 > {_i64max} div (m_big * c2) THEN "
        "raise_error('pmi_collocations: count product exceeds int64 — "
        "shard the corpus or rescale counts') "
        "ELSE (pair_count * n_tok * n_tok) div (m_big * c1 * c2) END"
    ))
    return (
        j.where(F.col("_ratio") >= F.lit(2 ** int(min_pmi_bits)))
        .select(
            "w1",
            "w2",
            "pair_count",
            (F.length(F.bin(F.col("_ratio"))).cast("long") - 1).alias(
                "pmi_bits"
            ),
        )
    )


def pmi_collocations_sql(
    docs_sql: str,
    min_count: int = 3,
    min_pmi_bits: int = 1,
) -> str:
    """DuckDB twin — identical bigram explode, counts, and bin/div chain."""
    return (
        f"WITH d AS (SELECT doc_id, text FROM ({docs_sql})), "
        "tk AS (SELECT list_filter(string_split(lower(text), ' '), "
        "t -> t <> '') AS toks FROM d), "
        "bg AS (SELECT toks[CAST(i + 1 AS INT)] AS w1, "
        "toks[CAST(i + 2 AS INT)] AS w2 FROM "
        "(SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM tk)), "
        "uni AS (SELECT unnest(toks) AS w FROM tk), "
        "cxy AS (SELECT w1, w2, count(*) AS pair_count FROM bg "
        f"GROUP BY w1, w2 HAVING count(*) >= {int(min_count)}), "
        "cx AS (SELECT w, count(*) AS c FROM uni GROUP BY w), "
        "tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM uni) AS n_tok, "
        "(SELECT CAST(count(*) AS BIGINT) FROM bg) AS m_big), "
        "j AS (SELECT cxy.w1, cxy.w2, cxy.pair_count, "
        "(pair_count * n_tok * n_tok) // (m_big * c1.c * c2.c) AS _ratio "
        "FROM cxy JOIN cx c1 ON cxy.w1 = c1.w JOIN cx c2 ON cxy.w2 = c2.w "
        "CROSS JOIN tot) "
        "SELECT w1, w2, pair_count, "
        "CAST(length(bin(_ratio)) - 1 AS BIGINT) AS pmi_bits "
        f"FROM j WHERE _ratio >= {2 ** int(min_pmi_bits)}"
    )


def lm_bigram_surprisal_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, cond_bits_per_bigram) — bigram conditional
    surprisal against the corpus's own bigram counts: mean over a doc's
    adjacent pairs (x,y) of floor(log2(c(x)/c(x,y))) — "given x, how
    surprising is y" — the step past ``lm_surprisal_stats``' unigram
    model (a doc full of common words in an uncommon ORDER scores high
    here and low there). Same no-floating-log contract: the per-pair
    bits are length(bin(c_x div c_xy)) - 1 (c_x counts x as a bigram
    PREFIX, so c_x >= c_xy > 0 always), the mean is one IEEE division of
    exact BIGINTs. Docs with < 2 tokens get 0 bigrams and NULL bits.

    Scale: one bigram explode, one bigram-count agg, one prefix-count
    agg (derived from the bigram counts — no second pass over tokens),
    one equi-join; all map-side combinable.
    """
    toks = docs.select(
        "doc_id",
        F.filter(tokens(F.lower(text_col)), lambda t: t != "").alias(
            "toks"
        ),
    )
    n_sz = F.size("toks")
    big = toks.select(
        "doc_id",
        F.when(
            n_sz >= 2,
            F.transform(
                F.sequence(F.lit(0), n_sz - 2),
                lambda i: F.struct(
                    F.element_at("toks", i + 1).alias("w1"),
                    F.element_at("toks", i + 2).alias("w2"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        .alias("bg"),
    ).select("doc_id", F.explode("bg").alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    cxy = big.groupBy("w1", "w2").agg(F.count("*").alias("cxy"))
    cx = cxy.groupBy("w1").agg(F.sum("cxy").alias("cx"))
    j = big.join(cxy, ["w1", "w2"]).join(cx, "w1")
    per = j.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(
            F.length(F.bin(F.expr("cx div cxy"))).cast("long") - 1
        ).alias("sum_bits"),
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        (
            F.col("sum_bits").cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("cond_bits_per_bigram"),
    )


def lm_bigram_surprisal_sql(docs_sql: str) -> str:
    """DuckDB twin — identical bigram explode and bin/div chain."""
    return (
        f"WITH d AS (SELECT doc_id, text FROM ({docs_sql})), "
        "tk AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "t -> t <> '') AS toks FROM d), "
        "bg AS (SELECT doc_id, toks[CAST(i + 1 AS INT)] AS w1, "
        "toks[CAST(i + 2 AS INT)] AS w2 FROM "
        "(SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i "
        "FROM tk)), "
        "cxy AS (SELECT w1, w2, count(*) AS cxy FROM bg GROUP BY w1, w2), "
        "cx AS (SELECT w1, CAST(sum(cxy) AS BIGINT) AS cx FROM cxy "
        "GROUP BY w1), "
        "j AS (SELECT bg.doc_id, cx.cx, cxy.cxy FROM bg "
        "JOIN cxy ON bg.w1 = cxy.w1 AND bg.w2 = cxy.w2 "
        "JOIN cx ON bg.w1 = cx.w1), "
        "per AS (SELECT doc_id, count(*) AS n_bigrams, "
        "CAST(sum(length(bin(cx // cxy)) - 1) AS BIGINT) AS sum_bits "
        "FROM j GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams, "
        "CAST(p.sum_bits AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE) AS "
        "cond_bits_per_bigram "
        "FROM d LEFT JOIN per p USING (doc_id)"
    )


def vocab_coverage(
    docs: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(vocab_rank, token, token_count, cum_count, coverage) — the
    tokenizer-budget curve: corpus coverage achieved by the top-N most
    frequent tokens (rank ties by token ascending). Reading "the top 50
    tokens cover 61% of all occurrences" is how a vocabulary size /
    stopword cut is chosen.

    Scale: one token-count agg, a global top-k CAP (ORDER BY + LIMIT on
    the |vocab|-row count table — a TakeOrdered, not a full sort), then
    the cumulative sum via a <= self-join on the CAPPED k rows (k², k ≤
    a few hundred — never a global window). Coverage is an IEEE division
    of exact BIGINTs.
    """
    cnt = (
        docs.select(
            F.explode(tokens(F.lower(text_col))).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    total = cnt.agg(F.sum("c").alias("total"))
    key = F.concat(
        F.format_string("%019d", F.lit(10**18) - F.col("c")),
        F.lit("#"),
        F.col("tok"),
    )
    top = (
        cnt.select(F.col("tok").alias("token"), F.col("c"), key.alias("_k"))
        .orderBy("_k")
        .limit(int(top_k))
    )
    a = top.select(
        F.col("token"), F.col("c").alias("token_count"), F.col("_k")
    )
    b = top.select(F.col("c").alias("_bc"), F.col("_k").alias("_bk"))
    cum = (
        a.join(b, F.col("_bk") <= F.col("_k"))
        .groupBy("token", "token_count", "_k")
        .agg(F.sum("_bc").alias("cum_count"), F.count("*").alias("vocab_rank"))
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.col("vocab_rank").cast("int").alias("vocab_rank"),
            "token",
            "token_count",
            "cum_count",
            (
                F.col("cum_count").cast("double")
                / F.col("total").cast("double")
            ).alias("coverage"),
        )
    )


def vocab_coverage_sql(docs_sql: str, top_k: int = 100) -> str:
    """DuckDB twin — identical printf rank key, capped <= self-join, and
    IEEE division."""
    return (
        f"WITH d AS (SELECT text FROM ({docs_sql})), "
        "occ AS (SELECT unnest(string_split(lower(text), ' ')) AS tok "
        "FROM d), "
        "cnt AS (SELECT tok, count(*) AS c FROM occ WHERE tok <> '' "
        "GROUP BY tok), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt), "
        "top AS (SELECT tok AS token, c, printf('%019d#%s', "
        "1000000000000000000 - c, tok) AS _k FROM cnt "
        f"ORDER BY _k LIMIT {int(top_k)}), "
        "cum AS (SELECT a.token, a.c AS token_count, "
        "CAST(sum(b.c) AS BIGINT) AS cum_count, "
        "CAST(count(*) AS INT) AS vocab_rank "
        "FROM top a JOIN top b ON b._k <= a._k "
        "GROUP BY a.token, a.c) "
        "SELECT vocab_rank, token, token_count, cum_count, "
        "CAST(cum_count AS DOUBLE) / CAST(total AS DOUBLE) AS coverage "
        "FROM cum CROSS JOIN tot"
    )


def ngram_novelty(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_ngrams, novel_ngrams, novelty) — how much of a document
    is corpus-original: the fraction of its DISTINCT word n-grams that
    occur in no other document (corpus document frequency 1). Templated /
    syndicated text scores near 0, fresh prose near 1 — the inverse of
    chunk_dup_stats' boilerplate signal and a direct mix-quality feature.

    Docs with fewer than ``n`` tokens have no n-grams → NULL novelty.

    Scale: one explode to distinct (doc, ngram) rows, a map-side-
    combinable df agg on the ngram, one equi-join back, one per-doc agg
    — chunk_dup_stats' exact shape."""
    toks = docs.select("doc_id", F.split(F.col(text_col), " ").alias("t"))
    grams = (
        toks.select("doc_id", F.explode(_ngrams(F.col("t"), n)).alias("g"))
        .distinct()
    )
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    per = (
        grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("df") == 1).cast("long")).alias("novel_ngrams"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("novel_ngrams", F.lit(0).cast("long")).alias(
            "novel_ngrams"
        ),
        F.when(
            F.coalesce("n_ngrams", F.lit(0).cast("long")) > 0,
            F.round(
                F.col("novel_ngrams") / F.col("n_ngrams").cast("double"), 6
            ),
        ).alias("novelty"),
    )


def ngram_novelty_sql(docs_sql: str, n: int = 3) -> str:
    """DuckDB twin of ngram_novelty — identical n-gram construction
    (list_slice == Spark slice on single-spaced text)."""
    n = int(n)
    return (
        f"WITH d AS (SELECT doc_id, string_split(text, ' ') AS t "
        f"FROM ({docs_sql})), "
        "grams AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, "
        f"array_to_string(list_slice(t, i + 1, i + {n}), ' ') AS g "
        "FROM (SELECT doc_id, t, unnest(range(0, "
        f"greatest(len(t) - {n - 1}, 0))) AS i FROM d))), "
        "dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY g), "
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams, "
        "CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS "
        "novel_ngrams FROM grams JOIN dfreq USING (g) GROUP BY doc_id) "
        "SELECT b.doc_id, coalesce(p.n_ngrams, 0) AS n_ngrams, "
        "coalesce(p.novel_ngrams, 0) AS novel_ngrams, "
        "CASE WHEN coalesce(p.n_ngrams, 0) > 0 THEN "
        "round(p.novel_ngrams / CAST(p.n_ngrams AS DOUBLE), 6) END "
        "AS novelty FROM d b LEFT JOIN per p USING (doc_id)"
    )


def _feat_bucket(feat: Column, num_buckets: int) -> Column:
    """Engine-replayable feature hash: first 8 md5 hex chars -> 32-bit
    int -> mod num_buckets (the stratified-sample md5-uniform idiom)."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
        % num_buckets
    )


def _doc_feats(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, feat) — hashed-n-gram feature OCCURRENCES: unigrams plus
    adjacent bigrams of the whitespace tokenization (the DSIR feature
    space, Xie et al. 2023 §3.2)."""
    # tokenize in its own projection — inlined into the element_at
    # lambda the split would re-run per bigram (the winnowing O(n^2)
    # lesson, operators/winnow.py)
    toked = docs.select(
        "doc_id",
        F.filter(tokens(F.lower(text_col)), lambda x: x != "").alias("_tok"),
    )
    t = F.col("_tok")
    big = F.when(
        F.size(t) > 1,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat(
                F.element_at(t, i + 1), F.lit(" "), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        "doc_id", F.explode(F.concat(t, big)).alias("feat")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
) -> DataFrame:
    """(doc_id, n_feats, dsir_bits, bits_per_feat) — DSIR-style importance
    weights (Data Selection with Importance Resampling, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much more likely a
    TARGET-domain hashed-n-gram LM finds it than the raw-corpus LM;
    resampling raw data by this weight shifts the mixture toward the
    target domain. Features are hashed unigrams+bigrams (``num_buckets``
    buckets); ``dsir_bits`` = Σ_occurrences (bits_raw(f) − bits_target(f))
    where bits_X(f) = floor(log2(N_X / (c_X(f)+1))) — the importance
    log-ratio log p_target − log p_raw at 1-bit resolution, add-one
    smoothed so unseen-in-target features are finite. Positive = more
    target-like than the raw average.

    Determinism contract: the bits chain is the ``lm_surprisal_stats``
    no-floating-log idiom (length(bin(N div (c+1))) − 1, pure int64), the
    bucket hash is the md5-hex-prefix uniform — every row reproduces
    bit-for-bit on any engine. ``bits_per_feat`` is one IEEE division of
    exact BIGINT moments.

    Scale: two token explodes (raw + target), two ≤num_buckets-row count
    aggs (map-side combinable, broadcast downstream), one per-doc agg.
    The bucket tables are fixed-size regardless of corpus scale — this is
    exactly why DSIR hashes features instead of keeping the raw vocab.
    """
    raw_occ = _doc_feats(docs, text_col).select(
        "doc_id", _feat_bucket(F.col("feat"), num_buckets).alias("b")
    )
    tgt_occ = _doc_feats(target, text_col).select(
        _feat_bucket(F.col("feat"), num_buckets).alias("b")
    )
    c_raw = raw_occ.groupBy("b").agg(F.count("*").alias("c_r"))
    c_tgt = tgt_occ.groupBy("b").agg(F.count("*").alias("c_t"))
    totals = c_raw.agg(F.sum("c_r").alias("n_r")).crossJoin(
        tgt_occ.agg(F.count("*").alias("n_t"))
    )
    bits = (
        c_raw.join(c_tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.length(
                    F.bin(
                        F.greatest(
                            F.expr("n_r div (c_r + 1)"), F.lit(1).cast("long")
                        )
                    )
                ).cast("long")
                - 1
                - (
                    F.length(
                        F.bin(
                            F.greatest(
                                F.expr("n_t div (coalesce(c_t, 0) + 1)"),
                                F.lit(1).cast("long"),
                            )
                        )
                    ).cast("long")
                    - 1
                )
            ).alias("dbits"),
        )
    )
    per = (
        raw_occ.join(F.broadcast(bits), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("dbits").alias("dsir_bits"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce("dsir_bits", F.lit(0).cast("long")).alias("dsir_bits"),
        (
            F.col("dsir_bits").cast("double")
            / F.col("n_feats").cast("double")
        ).alias("bits_per_feat"),
    )


def dsir_weights_sql(
    docs_sql: str, target_sql: str, num_buckets: int = 4096
) -> str:
    """DuckDB twin of dsir_weights — identical md5 buckets, bin/div
    integer bits chain, and IEEE closing division."""

    def feats(src: str, name: str) -> str:
        return (
            f"{name}0 AS (SELECT doc_id, list_filter("
            f"string_split(lower(text), ' '), x -> x <> '') AS t "
            f"FROM ({src})), "
            f"{name} AS (SELECT doc_id, feat FROM ("
            f"SELECT doc_id, unnest(t) AS feat FROM {name}0 "
            f"UNION ALL "
            f"SELECT doc_id, t[i + 1] || ' ' || t[i + 2] AS feat "
            f"FROM (SELECT doc_id, t, unnest(range(0, "
            f"greatest(len(t) - 1, 0))) AS i FROM {name}0)))"
        )

    bucket = (
        "CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % "
        f"{num_buckets}"
    )
    return (
        f"WITH {feats(docs_sql, 'rf')}, {feats(target_sql, 'tf')}, "
        f"ro AS (SELECT doc_id, {bucket} AS b FROM rf), "
        f"to_ AS (SELECT {bucket} AS b FROM tf), "
        "cr AS (SELECT b, count(*) AS c_r FROM ro GROUP BY b), "
        "ct AS (SELECT b, count(*) AS c_t FROM to_ GROUP BY b), "
        "tot AS (SELECT (SELECT CAST(sum(c_r) AS BIGINT) FROM cr) AS n_r, "
        "(SELECT CAST(count(*) AS BIGINT) FROM to_) AS n_t), "
        "bits AS (SELECT cr.b, "
        "CAST((length(bin(greatest(n_r // (c_r + 1), 1))) - 1) - "
        "(length(bin(greatest(n_t // (coalesce(c_t, 0) + 1), 1))) - 1) "
        "AS BIGINT) AS dbits "
        "FROM cr LEFT JOIN ct ON ct.b = cr.b CROSS JOIN tot), "
        "per AS (SELECT doc_id, count(*) AS n_feats, "
        "CAST(sum(dbits) AS BIGINT) AS dsir_bits "
        "FROM ro JOIN bits ON bits.b = ro.b GROUP BY doc_id) "
        f"SELECT d.doc_id, coalesce(p.n_feats, 0) AS n_feats, "
        "coalesce(p.dsir_bits, 0) AS dsir_bits, "
        "CAST(p.dsir_bits AS DOUBLE) / CAST(p.n_feats AS DOUBLE) "
        "AS bits_per_feat "
        f"FROM (SELECT doc_id FROM ({docs_sql})) d "
        "LEFT JOIN per p USING (doc_id)"
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, fertility) — token counts under
    the two tokenizations an LLM-data pipeline actually budgets with:
    whitespace words and a BPE-style PRE-tokenization (letter runs, digit
    runs, and each remaining symbol as its own token — the
    alternation-of-classes core of the GPT-2 pretokenizer regex, kept to
    RE2-safe constructs so Java and RE2 engines agree). ``fertility`` =
    bpe_tokens / ws_tokens (6 dp; NULL when the doc has no words) — the
    per-doc expansion factor used to convert word budgets to model-token
    budgets. Real BPE merges need a learned vocab; the pretokenizer count
    is the standard cheap upper-bound proxy.

    Scale: two per-row regexp/array expressions, no joins, no shuffle.
    """
    ws = F.size(
        F.filter(tokens(F.col(text_col)), lambda x: x != "")
    ).cast("long")
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.when(
            ws > 0,
            F.round(bpe.cast("double") / ws.cast("double"), 6),
        ).alias("fertility"),
    )


def bpe_ish_token_stats_sql(docs_sql: str) -> str:
    """DuckDB twin — identical pattern, counts, and 6 dp rounding."""
    return (
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) "
        "AS BIGINT) AS ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) "
        "AS BIGINT) AS bpe_tokens, "
        "CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) "
        "> 0 THEN round("
        f"len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) / "
        "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) "
        "AS DOUBLE), 6) END AS fertility "
        f"FROM ({docs_sql})"
    )


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair (same explode
    as lm_bigram_surprisal_stats; factored for the backoff scorer)."""
    toks = docs.select(
        "doc_id",
        F.filter(tokens(F.lower(text_col)), lambda t: t != "").alias("toks"),
    )
    n_sz = F.size("toks")
    return (
        toks.select(
            "doc_id",
            F.when(
                n_sz >= 2,
                F.transform(
                    F.sequence(F.lit(0), n_sz - 2),
                    lambda i: F.struct(
                        F.element_at("toks", i + 1).alias("w1"),
                        F.element_at("toks", i + 2).alias("w2"),
                    ),
                ),
            )
            .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("bg"),
        )
        .select("doc_id", F.explode("bg").alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )


def lm_stupid_backoff_stats(
    docs: DataFrame, model_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, n_backoff, bits_per_bigram) — stupid-backoff
    bigram scoring (Brants et al., EMNLP 2007: the web-scale LM that
    replaces discounting with a raw-count backoff chain) of ``docs``
    against a model trained on ``model_docs`` — at last a HELD-OUT
    scorer: the surprisal ops score the corpus against itself, where
    every bigram is seen by construction and backoff never fires.

    Per adjacent pair (x, y): if the model saw the bigram, bits =
    floor(log2(c(x)/c(xy))); else back off to the unigram with a fixed
    +1-bit penalty, bits = 1 + floor(log2(N/c(y))) (documented deviation
    from the paper: α = 0.5 instead of 0.4, so the penalty is an exact
    integer bit and the whole chain stays engine-portable int64; OOV y
    uses c = 1). ``n_backoff`` counts backed-off pairs — the
    train/serve-divergence signal. One IEEE division at the end.

    Scale: the model is two hash aggs (bigram + unigram counts); scoring
    is three equi-joins keyed on token strings — all map-side
    combinable, no windows, no Python.
    """
    big_m = _doc_bigrams(model_docs, text_col)
    cxy = big_m.groupBy("w1", "w2").agg(F.count("*").alias("cxy"))
    cx = cxy.groupBy("w1").agg(F.sum("cxy").alias("cx"))
    toks_m = model_docs.select(
        F.explode(F.filter(tokens(F.lower(text_col)), lambda t: t != ""))
        .alias("tok")
    )
    cy = toks_m.groupBy("tok").agg(F.count("*").alias("cy"))
    n_row = toks_m.agg(F.count("*").alias("n_model"))
    big = _doc_bigrams(docs, text_col)
    j = (
        big.join(cxy, ["w1", "w2"], "left")
        .join(cx, "w1", "left")
        .join(cy.withColumnRenamed("tok", "w2"), "w2", "left")
        .crossJoin(F.broadcast(n_row))
    )
    seen = F.col("cxy").isNotNull()
    bits = F.when(
        seen,
        F.length(F.bin(F.expr("cx div cxy"))).cast("long") - 1,
    ).otherwise(
        F.lit(1)
        + F.length(
            F.bin(F.expr("n_model div coalesce(cy, CAST(1 AS BIGINT))"))
        ).cast("long")
        - 1
    )
    per = j.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum((~seen).cast("long")).alias("n_backoff"),
        F.sum(bits).alias("sum_bits"),
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("n_backoff", F.lit(0).cast("long")).alias("n_backoff"),
        F.round(
            F.col("sum_bits").cast("double")
            / F.col("n_bigrams").cast("double"),
            6,
        ).alias("bits_per_bigram"),
    )


def lm_stupid_backoff_sql(docs_sql: str, model_sql: str) -> str:
    """DuckDB twin — identical bigram explode, backoff rule, bin chains."""
    bg = (
        "SELECT doc_id, toks[CAST(i + 1 AS INT)] AS w1, "
        "toks[CAST(i + 2 AS INT)] AS w2 FROM "
        "(SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM "
        "(SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "t -> t <> '') AS toks FROM {src}))"
    )
    return (
        f"WITH d AS (SELECT doc_id, text FROM ({docs_sql})), "
        f"m AS (SELECT doc_id, text FROM ({model_sql})), "
        f"bgm AS ({bg.format(src='m')}), "
        "cxy AS (SELECT w1, w2, count(*) AS cxy FROM bgm GROUP BY w1, w2), "
        "cx AS (SELECT w1, CAST(sum(cxy) AS BIGINT) AS cx FROM cxy "
        "GROUP BY w1), "
        "tkm AS (SELECT unnest(list_filter(string_split(lower(text), ' '), "
        "t -> t <> '')) AS tok FROM m), "
        "cy AS (SELECT tok, count(*) AS cy FROM tkm GROUP BY tok), "
        "nm AS (SELECT count(*) AS n_model FROM tkm), "
        f"bgd AS ({bg.format(src='d')}), "
        "j AS (SELECT bgd.doc_id, cxy.cxy, cx.cx, cy.cy, nm.n_model "
        "FROM bgd LEFT JOIN cxy ON bgd.w1 = cxy.w1 AND bgd.w2 = cxy.w2 "
        "LEFT JOIN cx ON bgd.w1 = cx.w1 "
        "LEFT JOIN cy ON bgd.w2 = cy.tok CROSS JOIN nm), "
        "per AS (SELECT doc_id, count(*) AS n_bigrams, "
        "CAST(sum(CASE WHEN cxy IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_backoff, "
        "CAST(sum(CASE WHEN cxy IS NOT NULL THEN "
        "length(bin(cx // cxy)) - 1 ELSE "
        "1 + length(bin(n_model // coalesce(cy, 1))) - 1 END) AS BIGINT) "
        "AS sum_bits FROM j GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams, "
        "coalesce(p.n_backoff, 0) AS n_backoff, "
        "round(CAST(p.sum_bits AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE), 6) "
        "AS bits_per_bigram FROM d LEFT JOIN per p USING (doc_id)"
    )
