"""PMI collocations and the FM cardinality estimator vs pure-Python
replications and the DuckDB twins."""

import hashlib
import math
from collections import Counter

import duckdb

from ps_projekt_pagerank_spark.functions.sketches import (
    fm_count_distinct,
    fm_count_distinct_sql,
    fm_est_table,
)
from ps_projekt_pagerank_spark.functions.text import (
    pmi_collocations,
    pmi_collocations_sql,
)

DOCS = [
    (0, "new york is a big city and new york never sleeps"),
    (1, "i love new york and i love big data"),
    (2, "the city of new york has big data centers"),
    (3, "x"),  # single token -> no bigrams
]


def _py_pmi(docs, min_count, min_bits):
    uni, big = Counter(), Counter()
    for _, t in docs:
        toks = [w for w in t.lower().split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n, m = sum(uni.values()), sum(big.values())
    out = {}
    for (w1, w2), c in big.items():
        if c < min_count:
            continue
        ratio = (c * n * n) // (m * uni[w1] * uni[w2])
        if ratio >= 2**min_bits:
            out[(w1, w2)] = (c, int(math.log2(ratio)))
    return out


def test_pmi_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi_bits"])
        for r in pmi_collocations(df, min_count=2).collect()
    }
    assert got == _py_pmi(DOCS, 2, 1)
    assert ("new", "york") in got  # the canonical collocation survives


def test_pmi_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi_bits"])
        for r in pmi_collocations(df, min_count=2).collect()
    }
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = pmi_collocations_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)", min_count=2
    )
    oracle = {
        (r[0], r[1]): (r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def _py_fm(values, r_sketches=8, nibbles=10):
    pos_sum = 0
    for r in range(r_sketches):
        sk = 0
        for v in values:
            x = int(
                hashlib.md5(f"{v}#{r}".encode()).hexdigest()[:nibbles], 16
            )
            tz = nibbles * 4 if x == 0 else (x & -x).bit_length() - 1
            sk |= 1 << tz
        p = 0
        while sk & (1 << p):
            p += 1
        pos_sum += p
    return pos_sum


def test_fm_count_distinct(spark):
    values = [f"tok{i}" for i in range(300)] * 3  # 300 distinct, 900 rows
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    row = fm_count_distinct(df, "v").collect()[0]
    assert row["sum_positions"] == _py_fm(sorted(set(values)))
    table = fm_est_table(8, 10)
    assert row["est_distinct"] == table[row["sum_positions"]]
    # FM with 8 sketches: order-of-magnitude accuracy is the contract
    assert 100 <= row["est_distinct"] <= 900


def test_fm_duckdb_twin(spark):
    values = [f"item{i % 97}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    got = fm_count_distinct(df, "v").collect()[0]
    vlist = ", ".join(f"('{v}')" for v in values)
    sql = fm_count_distinct_sql(f"SELECT * FROM (VALUES {vlist}) AS t(v)")
    oracle = duckdb.connect().execute(sql).fetchone()
    assert (got["sum_positions"], got["est_distinct"]) == oracle


def test_fm_by_key_matches_scalar_and_duckdb(spark):
    from ps_projekt_pagerank_spark.functions.sketches import (
        fm_count_distinct_by_key,
        fm_count_distinct_by_key_sql,
    )

    rows = [("en", f"w{i % 60}") for i in range(200)] + [
        ("fr", f"m{i % 9}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "lang STRING, tok STRING")
    got = {
        r["key"]: (r["sum_positions"], r["est_distinct"])
        for r in fm_count_distinct_by_key(df, "lang", "tok").collect()
    }
    # per-key sketch must equal the scalar estimator run on that key alone
    assert got["en"][0] == _py_fm(sorted({f"w{i}" for i in range(60)}))
    assert got["fr"][0] == _py_fm(sorted({f"m{i}" for i in range(9)}))
    vlist = ", ".join(f"('{k}', '{v}')" for k, v in rows)
    sql = fm_count_distinct_by_key_sql(
        f"SELECT * FROM (VALUES {vlist}) AS t(key, v)"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def _py_hll(values):
    """literal HLL replay: md5 60-bit hash, m=64 registers, integer
    register sum, literal corrections — the definitional oracle."""
    from ps_projekt_pagerank_spark.functions.sketches import (
        HLL_B,
        HLL_LC_THRESHOLD,
        HLL_M,
        HLL_NIBBLES,
        HLL_RMAX,
        HLL_SCALE,
        hll_lc_table,
    )

    regs = [0] * HLL_M
    for v in values:
        h = int(hashlib.md5(f"{v}#hll".encode()).hexdigest()[:HLL_NIBBLES], 16)
        b, w = h & (HLL_M - 1), h >> HLL_B
        rho = HLL_RMAX if w == 0 else HLL_RMAX - w.bit_length()
        regs[b] = max(regs[b], rho)
    s = sum(1 << (HLL_RMAX - m) for m in regs)
    v0 = sum(1 for m in regs if m == 0)
    raw = HLL_SCALE / float(s)
    est = hll_lc_table()[v0] if (raw <= HLL_LC_THRESHOLD and v0 > 0) else raw
    return v0, s, est


def test_hll_count_distinct(spark):
    from ps_projekt_pagerank_spark.functions.sketches import (
        hll_count_distinct,
        hll_count_distinct_sql,
    )

    words = [f"word{i % 500}" for i in range(2000)]
    df = spark.createDataFrame([(w,) for w in words], "v STRING")
    got = hll_count_distinct(df, "v").collect()[0]
    assert (
        got["n_zero_registers"],
        got["register_sum"],
        got["est_distinct"],
    ) == _py_hll(words)
    # HLL at m=64 has sigma ~13%; 500 distinct must land within 3 sigma
    assert abs(got["est_distinct"] - 500) / 500 < 0.4
    vlist = ", ".join(f"('{w}')" for w in set(words))
    sql = hll_count_distinct_sql(f"SELECT * FROM (VALUES {vlist}) AS t(v)")
    assert tuple(duckdb.connect().execute(sql).fetchone()) == tuple(got)


def test_hll_empty_and_small_range(spark):
    from ps_projekt_pagerank_spark.functions.sketches import (
        hll_count_distinct,
        hll_count_distinct_sql,
    )

    empty = spark.createDataFrame([], "v STRING")
    got = hll_count_distinct(empty, "v").collect()[0]
    assert got["est_distinct"] == 0.0 and got["n_zero_registers"] == 64
    oracle = (
        duckdb.connect()
        .execute(
            hll_count_distinct_sql("SELECT 'x' AS v WHERE false")
        )
        .fetchone()
    )
    assert tuple(got) == oracle
    # 20 distinct values: the small-range (linear counting) branch fires
    small = spark.createDataFrame([(f"s{i}",) for i in range(20)], "v STRING")
    g2 = hll_count_distinct(small, "v").collect()[0]
    assert tuple(g2) == _py_hll([f"s{i}" for i in range(20)])
    assert abs(g2["est_distinct"] - 20) < 8


def test_hll_by_key_matches_scalar_and_duckdb(spark):
    from ps_projekt_pagerank_spark.functions.sketches import (
        hll_count_distinct_by_key,
        hll_count_distinct_by_key_sql,
    )

    rows = [("en", f"w{i % 60}") for i in range(200)] + [
        ("fr", f"m{i % 9}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "lang STRING, tok STRING")
    got = {
        r["key"]: (r["n_zero_registers"], r["register_sum"], r["est_distinct"])
        for r in hll_count_distinct_by_key(df, "lang", "tok").collect()
    }
    assert got["en"] == _py_hll([f"w{i}" for i in range(60)])
    assert got["fr"] == _py_hll([f"m{i}" for i in range(9)])
    vlist = ", ".join(f"('{k}', '{v}')" for k, v in rows)
    sql = hll_count_distinct_by_key_sql(
        f"SELECT * FROM (VALUES {vlist}) AS t(key, v)"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle
