"""Unigram LM surprisal stats and tf-idf top terms vs pure-Python
replications and the DuckDB twins (everything integer-exact: the
floor(log2) chain uses bin/div, never a floating log)."""

import math
from collections import Counter

import duckdb

from ps_projekt_pagerank_spark.functions.text import (
    lm_surprisal_stats,
    lm_surprisal_sql,
    tfidf_top_terms,
    tfidf_top_terms_sql,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "quantum chromodynamics lattice gauge"),
    (3, "the the the the"),
]


def _py_lm(docs):
    occ = [(i, t) for i, txt in docs for t in txt.lower().split(" ") if t]
    cnt = Counter(t for _, t in occ)
    n = sum(cnt.values())
    out = {}
    for did, _ in docs:
        toks = [t for i, t in occ if i == did]
        if not toks:
            out[did] = (0, None, None)
            continue
        sum_c = sum(cnt[t] for t in toks)
        sum_bits = sum(int(math.log2(n // cnt[t])) for t in toks)
        out[did] = (
            len(toks),
            float(sum_c) / n / len(toks),
            float(sum_bits) / len(toks),
        )
    return out


def test_lm_surprisal_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_token_freq"], r["bits_per_token"])
        for r in lm_surprisal_stats(df).collect()
    }
    assert got == _py_lm(DOCS)
    # rare-token doc is more surprising than the stopword doc
    assert got[2][2] > got[3][2]


def test_lm_surprisal_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_token_freq"], r["bits_per_token"])
        for r in lm_surprisal_stats(df).collect()
    }
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = lm_surprisal_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def _py_tfidf(docs, k):
    tf = Counter()
    for did, txt in docs:
        for t in txt.lower().split(" "):
            if t:
                tf[(did, t)] += 1
    df = Counter(t for (_, t) in tf)
    n_docs = len(docs)
    rows = [
        (did, t, c, df[t], int(math.log2(n_docs // df[t])))
        for (did, t), c in tf.items()
    ]
    out = {}
    for did, _ in docs:
        mine = sorted(
            (r for r in rows if r[0] == did),
            key=lambda r: (-r[2] * r[4], r[1]),
        )[:k]
        out.update(
            {
                (did, rank + 1): (t, c, d, i, c * i)
                for rank, (_, t, c, d, i) in enumerate(mine)
            }
        )
    return out


def test_tfidf_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["term_rank"]): (
            r["term"], r["tf"], r["df"], r["idf_bits"], r["score"],
        )
        for r in tfidf_top_terms(df, k=2).collect()
    }
    assert got == _py_tfidf(DOCS, 2)
    # "the" appears in 3/4 docs -> idf_bits 0 -> never outranks a real
    # term (doc 3 is all-"the", so it still surfaces there with score 0)
    assert all(
        t != "the" for (did, _), (t, *_) in got.items() if did != 3
    )
    assert got[(3, 1)] == ("the", 4, 3, 0, 0)
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = tfidf_top_terms_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)", 2
    )
    oracle = {
        (r[0], r[6]): (r[1], r[2], r[3], r[4], r[5])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def _py_bigram_lm(docs):
    from collections import Counter

    big = Counter()
    per_doc = {}
    for did, txt in docs:
        toks = [t for t in txt.lower().split(" ") if t]
        pairs = list(zip(toks, toks[1:]))
        per_doc[did] = pairs
        big.update(pairs)
    cx = Counter()
    for (x, _), c in big.items():
        cx[x] += c
    out = {}
    for did, pairs in per_doc.items():
        if not pairs:
            out[did] = (0, None)
            continue
        bits = sum(int(math.log2(cx[x] // big[(x, y)])) for x, y in pairs)
        out[did] = (len(pairs), float(bits) / len(pairs))
    return out


def test_bigram_surprisal_matches_python_and_duckdb(spark):
    from ps_projekt_pagerank_spark.functions.text import (
        lm_bigram_surprisal_sql,
        lm_bigram_surprisal_stats,
    )

    docs = DOCS + [(4, "solo")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cond_bits_per_bigram"])
        for r in lm_bigram_surprisal_stats(df).collect()
    }
    assert got == _py_bigram_lm(docs)
    assert got[4] == (0, None)  # single token -> no bigrams
    # "the the the the": bigram (the,the) always follows "the" in doc 3,
    # but "the" also prefixes cat/dog -> cond bits > 0
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    sql = lm_bigram_surprisal_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def test_vocab_coverage(spark):
    from ps_projekt_pagerank_spark.functions.text import (
        vocab_coverage,
        vocab_coverage_sql,
    )

    docs = [(0, "a a a b b c"), (1, "a b d")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["vocab_rank"]: (
            r["token"], r["token_count"], r["cum_count"], r["coverage"]
        )
        for r in vocab_coverage(df, top_k=3).collect()
    }
    # counts: a=4 b=3 c=1 d=1 (total 9); top-3 ties c/d -> c wins by token
    assert got == {
        1: ("a", 4, 4, 4 / 9),
        2: ("b", 3, 7, 7 / 9),
        3: ("c", 1, 8, 8 / 9),
    }
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    sql = vocab_coverage_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)", 3
    )
    oracle = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def test_perplexity_buckets_terciles(spark):
    from ps_projekt_pagerank_spark.functions.text import perplexity_buckets

    # 9 docs with three clearly separated surprisal tiers: pure-stopword
    # docs (head), mixed (middle), rare-token docs (tail)
    rows = (
        [(i, "the the the the the the") for i in range(3)]
        + [(10 + i, "the cat sat on mat " + f"word{i}") for i in range(3)]
        + [(20 + i, f"zeta{i} eta{i} theta{i} iota{i}") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df).collect()}
    assert all(got[i] == "head" for i in range(3))
    assert all(got[10 + i] == "middle" for i in range(3))
    assert all(got[20 + i] == "tail" for i in range(3))


def test_perplexity_buckets_head_lower_bits_than_tail(spark):
    from ps_projekt_pagerank_spark.functions.text import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j % (i + 1)}" for j in range(12))) for i in range(9)],
        "doc_id LONG, text STRING",
    )
    rows = perplexity_buckets(docs).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["bits_per_token"])
    assert max(by_bucket["head"]) <= min(by_bucket["tail"])
