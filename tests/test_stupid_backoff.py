"""Stupid-backoff bigram LM (functions/text.py::lm_stupid_backoff_stats).

Model doc "a b a b": bigram counts c(a,b)=2, c(b,a)=1; prefix counts
c(a)=2, c(b)=1; unigrams a:2 b:2, N=4.
"""

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.text import lm_stupid_backoff_stats

DOCS = [
    (0, "a b a b"),  # the model doc — every bigram seen, all bits 0
    (1, "a b c"),  # (a,b) seen: 0 bits; (b,c) unseen -> backoff OOV c
    (2, "z"),  # single token: no bigrams
]


def test_backoff_bits(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    model = docs.where(F.col("doc_id") == 0)
    rows = {
        r["doc_id"]: r for r in lm_stupid_backoff_stats(docs, model).collect()
    }
    d0 = rows[0]
    assert (d0["n_bigrams"], d0["n_backoff"]) == (3, 0)
    assert d0["bits_per_bigram"] == 0.0  # ilog2(2/2), ilog2(1/1), ilog2(2/2)
    d1 = rows[1]
    assert (d1["n_bigrams"], d1["n_backoff"]) == (2, 1)
    # seen (a,b): ilog2(2/2) = 0; unseen (b,c): 1 + ilog2(4/1) = 3
    assert d1["bits_per_bigram"] == 1.5
    d2 = rows[2]
    assert (d2["n_bigrams"], d2["n_backoff"]) == (0, 0)
    assert d2["bits_per_bigram"] is None
