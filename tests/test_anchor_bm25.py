"""anchor_bm25: hand-replicated Okapi scoring on a tiny anchor set.

The Python oracle recomputes idf_bits (floor(log2(n_docs/df)) via
int.bit_length — the same integer chain) and the saturation factor with
the identical double arithmetic, so the comparison is exact after the
operator's 6-dp rounding.
"""

import math

from ps_projekt_pagerank_spark.sources.extraction import anchor_bm25

# anchor "documents" per target: rare in 1/4 targets (idf_bits 2),
# alpha in 2/4 (idf_bits 1), beta in 3/4 (idf_bits 0 — suppressed)
_DOCS = {
    "u1": ["rare", "alpha", "alpha"],
    "u2": ["alpha", "beta"],
    "u3": ["beta", "beta", "beta"],
    "u4": ["beta", "gamma"],
}
_QUERY = ["rare", "alpha", "beta"]


def _anchors(spark):
    rows = [("s", url, " ".join(toks)) for url, toks in _DOCS.items()]
    return spark.createDataFrame(rows, ["src_url", "dst_url", "anchor"])


def _oracle(k1=1.2, b=0.75):
    n_docs = len(_DOCS)
    total = sum(len(t) for t in _DOCS.values())
    avgdl = total / n_docs
    df = {}
    for toks in _DOCS.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for url, toks in _DOCS.items():
        dl = len(toks)
        score = 0.0
        hits = 0
        for q in _QUERY:
            tf = toks.count(q)
            if not tf:
                continue
            hits += 1
            idf = (n_docs // df[q]).bit_length() - 1
            score += float(idf) * (
                (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
            )
        if hits:
            out[url] = (round(score, 6), hits)
    return out


def test_bm25_matches_hand_oracle(spark):
    got = {
        r["dst_url"]: (r["bm25"], r["n_terms_hit"])
        for r in anchor_bm25(_anchors(spark), _QUERY, k=10).collect()
    }
    exp = _oracle()
    assert got == exp
    # u3 only matches beta (idf_bits 0): a hit, but a zero score
    assert got["u3"][1] == 1 and math.isclose(got["u3"][0], 0.0)
    # u1 holds the rare term: the top score
    assert got["u1"][0] == max(v[0] for v in exp.values())


def test_bm25_topk_and_order(spark):
    exp = _oracle()
    best = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[0][0]
    top1 = anchor_bm25(_anchors(spark), _QUERY, k=1).collect()
    assert len(top1) == 1 and top1[0]["dst_url"] == best


def test_bm25_empty_query_raises(spark):
    try:
        anchor_bm25(_anchors(spark), [])
        raised = False
    except ValueError:
        raised = True
    assert raised
