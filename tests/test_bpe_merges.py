"""BPE merge-table induction: literal Python replay, DuckDB twin
equality, early-stop, and encode round-trip."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.bpe import (
    END_MARK,
    bpe_encode,
    bpe_learn_merges,
    bpe_learn_merges_sql,
)

DOCS = [
    (1, "low lower lowest low low"),
    (2, "newer newest new low widely wide"),
    (3, "a ab abc low lower NEW new!! new"),
]


def _py_bpe(texts, n_merges):
    """Reference BPE learner: dict of symbol tuples -> freq, naive
    per-position pair counts, left-to-right non-overlapping merge."""
    import re
    from collections import Counter

    freqs = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            freqs[tuple(w) + (END_MARK,)] += 1
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in freqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((rnd, best[0], best[1], pairs[best]))
        nxt = Counter()
        for syms, f in freqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += f
        freqs = nxt
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_replay(docs):
    got = [tuple(r) for r in bpe_learn_merges(docs, 6).collect()]
    want = _py_bpe([t for _, t in DOCS], 6)
    assert got == want


def test_twin_equality(docs):
    got = [tuple(r) for r in bpe_learn_merges(docs, 6).collect()]
    union = " UNION ALL ".join(
        "SELECT {} AS doc_id, '{}' AS text".format(i, t.replace("!!", "!!"))
        for i, t in DOCS
    )
    oracle = duckdb.connect().execute(bpe_learn_merges_sql(union, 6)).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_early_stop_when_fully_merged(spark):
    # one distinct word "ab": symbols a b </w> -> 2 merges possible, then dry
    d = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    out = bpe_learn_merges(d, 10).collect()
    assert len(out) == 2
    assert [ (r["left_sym"], r["right_sym"]) for r in out ] == [
        ("a", "b"),
        ("ab", END_MARK),
    ]
    assert all(r["pair_count"] == 3 for r in out)


def test_overlap_is_left_to_right(spark):
    # "aaa": pairs (a,a) x2 -> merge gives (aa, a, </w>), NOT (a, aa, ...)
    d = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    out = bpe_learn_merges(d, 2).collect()
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("a", "a")
    # second round: symbols are (aa, a, </w>); best pair deterministic min
    assert (out[1]["left_sym"], out[1]["right_sym"]) in {
        ("a", END_MARK),
        ("aa", "a"),
    }
    want = _py_bpe(["aaa"], 2)
    assert [tuple(r) for r in out] == want


def test_encode_counts(docs):
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn_merges(docs, 4).collect()
    ]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    # replay: apply merges to each word, count symbols
    import re

    def count(text):
        n = 0
        for w in re.findall("[a-z]+", text.lower()):
            syms = list(w) + [END_MARK]
            for l, r in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    assert enc == {i: count(t) for i, t in DOCS}


def test_batched_equals_sequential_and_saves_actions(spark):
    """batch_top_k=16 must reproduce the sequential (top-1) merge table
    exactly — the batching rule only accepts candidates whose stale
    counts are provably exact — while spending fewer candidate-collect
    actions on non-interacting text."""
    rows = [
        (i, "alpha bravo charlie delta echo foxtrot golf hotel " * 3)
        for i in range(4)
    ] + [(9, "india juliet kilo lima mike november oscar papa")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    seq = [
        tuple(r)
        for r in bpe_learn_merges(
            docs, 8, batch_top_k=1
        ).orderBy("round").collect()
    ]
    seq_actions = bpe_learn_merges.last_actions
    bat = [
        tuple(r)
        for r in bpe_learn_merges(
            docs, 8, batch_top_k=16
        ).orderBy("round").collect()
    ]
    bat_actions = bpe_learn_merges.last_actions
    assert bat == seq
    assert len(bat) == 8
    assert seq_actions == 8
    assert bat_actions < seq_actions  # batching actually engaged


def test_batched_interacting_pairs_fall_back(spark):
    """Heavily self-interacting text (one repeated letter run) must not
    let the batch accept a stale count — result still matches the
    literal Python replay even when every step interacts."""
    docs = spark.createDataFrame(
        [(1, "aaaaaaaa aaaa aa a"), (2, "aaaaaaa aaa aa")],
        "doc_id LONG, text STRING",
    )
    got = [
        tuple(r)
        for r in bpe_learn_merges(
            docs, 5, batch_top_k=16
        ).orderBy("round").collect()
    ]
    expect = [tuple(r) for r in _py_bpe(
        ["aaaaaaaa aaaa aa a", "aaaaaaa aaa aa"], 5
    )]
    assert got == expect
