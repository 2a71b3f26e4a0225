"""ExactSubstr-style duplicated-span detection/removal vs a Python oracle.

Oracle: brute-force k-gram counting + interval merge over a tiny corpus
with a planted shared sentence, a within-doc repeat, and clean docs.
"""

import pytest

from ps_projekt_pagerank_spark.operators import dedup as dd

K = 3

DOCS = [
    # docs 0 and 1 share the exact 5-token sentence "big brown fox jumps high"
    (0, "alpha beta big brown fox jumps high gamma delta"),
    (1, "big brown fox jumps high omega psi chi phi upsilon"),
    # doc 2 repeats its own 4-token phrase -> within-doc duplication counts
    (2, "one two three four pad one two three four tail"),
    # doc 3 is clean
    (3, "unique tokens never repeated anywhere in this corpus at all"),
    # doc 4 is shorter than k
    (4, "tiny doc"),
]


def _oracle():
    from collections import Counter

    toks = {d: t.split() for d, t in DOCS}
    freq = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - K + 1):
            freq[" ".join(ts[i : i + K])] += 1
    stats, cleans = {}, {}
    for d, ts in toks.items():
        hits = [
            i
            for i in range(len(ts) - K + 1)
            if freq[" ".join(ts[i : i + K])] >= 2
        ]
        covered = set()
        spans = 0
        prev = None
        for i in hits:
            if prev is None or i - prev > K:
                spans += 1
            prev = i
            covered.update(range(i, i + K))
        stats[d] = (len(ts), spans, len(covered), len(covered) / len(ts))
        cleans[d] = (
            " ".join(t for j, t in enumerate(ts) if j not in covered),
            len(covered),
        )
    return stats, cleans


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_duplicated_span_stats(docs):
    exp, _ = _oracle()
    rows = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_spans"],
            r["dup_tokens"],
            r["dup_fraction"],
        )
        for r in dd.duplicated_span_stats(docs, k=K).collect()
    }
    assert set(rows) == set(exp)
    for d in exp:
        assert rows[d][:3] == exp[d][:3], (d, rows[d], exp[d])
        assert rows[d][3] == pytest.approx(exp[d][3])
    # the planted share is detected on both sides, the clean doc is zero
    assert rows[0][2] == 5 and rows[1][2] == 5
    assert rows[3][2] == 0 and rows[4][2] == 0


def test_remove_duplicated_spans(docs):
    _, exp = _oracle()
    rows = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in dd.remove_duplicated_spans(docs, k=K).collect()
    }
    assert rows == exp
    # untouched docs round-trip byte-identically
    assert rows[3][0] == DOCS[3][1]
    assert rows[4][0] == DOCS[4][1]


def test_within_doc_repeat_counts(docs):
    # doc 2's phrase occurs twice in the SAME doc: both occurrences are
    # duplicated spans under the ExactSubstr total-occurrence rule
    r = {
        x["doc_id"]: x
        for x in dd.duplicated_span_stats(docs, k=K).collect()
    }[2]
    assert r["dup_spans"] == 2 and r["dup_tokens"] == 8
