"""Round-4 session-3 operators: C4 line cleaning, boilerplate detection,
sequence packing, overlap-coefficient (containment) dedup — closed-form
hand fixtures for each rule, plus the distributed-cumsum contract."""

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.lines import (
    boilerplate_lines,
    c4_clean,
    split_lines,
)
from ps_projekt_pagerank_spark.operators.dedup import token_overlap_pairs
from ps_projekt_pagerank_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- C4 line cleaning ------------------------------------------------------


def test_c4_line_rules(spark):
    page = "\n".join(
        [
            "Nav | Bar",  # no terminal punctuation → dropped
            "This line survives the filter.",  # kept
            "Too short.",  # 2 words < 3 → dropped
            "Please enable JavaScript here.",  # blacklist → dropped
            "Another good line stays!",  # kept (bang terminal)
        ]
    )
    out = c4_clean(_docs(spark, [(1, page)]), min_kept=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["text"] == (
        "This line survives the filter.\nAnother good line stays!"
    )
    assert r["n_kept"] == 2 and r["n_dropped"] == 3


def test_c4_page_kill_and_floor(spark):
    rows = [
        (1, "Real content line here.\nLorem Ipsum dolor sit."),  # page kill
        (2, "var x = {a: 1};\nGood line otherwise kept."),  # brace kill
        (3, "Only one surviving line here."),  # below min_kept=2 floor
        (4, "First good line is kept.\nSecond good line is kept."),
    ]
    out = c4_clean(_docs(spark, rows), min_kept=2)
    assert [r["doc_id"] for r in out.collect()] == [4]


def test_c4_cross_doc_first_occurrence_dedup(spark):
    shared = "All rights reserved to the site."
    rows = [
        (1, f"{shared}\nUnique alpha content line one."),
        (2, f"{shared}\nUnique beta content line two."),
        (3, f"Unique gamma content line three.\n{shared}"),
    ]
    out = {r["doc_id"]: r for r in c4_clean(_docs(spark, rows), min_kept=1).collect()}
    # the shared line survives only in doc 1 (minimal (doc_id, pos))
    assert shared in out[1]["text"]
    assert shared not in out[2]["text"] and shared not in out[3]["text"]
    assert out[2]["n_dropped"] == 1 and out[3]["n_dropped"] == 1


def test_boilerplate_lines_distinct_doc_counting(spark):
    rows = [
        (1, "chrome line\nbody a\nchrome line"),  # dup within one doc
        (2, "chrome line\nbody b"),
        (3, "chrome line\nbody c"),
        (4, "body d"),
    ]
    out = {r["line"]: r["n_docs"] for r in boilerplate_lines(
        _docs(spark, rows), min_docs=3
    ).collect()}
    # within-doc repeats don't inflate the distinct-doc count
    assert out == {"chrome line": 3}


def test_split_lines_positions(spark):
    out = split_lines(_docs(spark, [(7, "a\nb\nc")])).collect()
    assert sorted((r["pos"], r["line"]) for r in out) == [
        (0, "a"), (1, "b"), (2, "c"),
    ]


# --- sequence packing ------------------------------------------------------


def test_pack_sequences_closed_form(spark):
    # tokens: doc1=3, doc2=4, doc3=2; L=4 →
    # doc1 [0,3) seq0; doc2 [3,7) seqs 0-1 (cut); doc3 [7,9) seqs 1-2 (cut)
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i")]
    out = {r["doc_id"]: r for r in pack_sequences(_docs(spark, rows), 4).collect()}
    assert (out[1]["start_tok"], out[1]["start_seq"], out[1]["end_seq"]) == (0, 0, 0)
    assert (out[2]["start_tok"], out[2]["start_seq"], out[2]["end_seq"]) == (3, 0, 1)
    assert (out[3]["start_tok"], out[3]["start_seq"], out[3]["end_seq"]) == (7, 1, 2)
    assert [out[i]["n_seqs"] for i in (1, 2, 3)] == [1, 2, 2]


def test_pack_summary_closed_form(spark):
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i")]
    r = packing_summary(_docs(spark, rows), 4).collect()[0]
    assert r["total_tokens"] == 9 and r["n_seqs"] == 3
    assert r["n_cut_docs"] == 2
    assert r["frag_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["fill_rate"] == pytest.approx(9 / 12, abs=1e-6)


def test_pack_sequences_matches_partitionless_window(spark):
    # distributed cumsum == the single-window definition on a bigger frame
    rows = [(i, " ".join(["t"] * (1 + i % 7))) for i in range(200)]
    docs = _docs(spark, rows).repartition(8)
    got = {
        r["doc_id"]: r["start_tok"]
        for r in pack_sequences(docs, 16).collect()
    }
    acc, want = 0, {}
    for i in range(200):
        want[i] = acc
        acc += 1 + i % 7
    assert got == want


def test_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, "a")]), 0)


# --- containment dedup -----------------------------------------------------


def test_token_overlap_catches_containment_jaccard_misses(spark):
    long = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10))  # subset of long
    other = " ".join(f"z{i}" for i in range(10))
    docs = _docs(spark, [(1, long), (2, quote), (3, other)])
    out = token_overlap_pairs(docs, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["overlap"]) for r in out] == [(1, 2, 1.0)]


def test_token_overlap_candidate_driven(spark):
    long = " ".join(f"w{i}" for i in range(20))
    quote = " ".join(f"w{i}" for i in range(5))
    docs = _docs(spark, [(1, long), (2, quote), (3, "x y z q.")])
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = token_overlap_pairs(docs, threshold=0.5, candidates=cands).collect()
    assert [(r["id_a"], r["id_b"], r["overlap"]) for r in out] == [(1, 2, 1.0)]


# --- grouped quantiles -------------------------------------------------------


def test_grouped_quantiles_closed_form(spark):
    from ps_projekt_pagerank_spark.operators.quantiles import (
        grouped_quantiles,
    )

    rows = [(i, "a", i * 10) for i in range(1, 11)] + [
        (100 + i, "b", i) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    out = {
        (r["grp"], r["q"]): (r["rank"], r["value"])
        for r in grouped_quantiles(
            df, "v", "grp", qs=(0.5, 0.9), key_col="doc_id"
        ).collect()
    }
    # a: n=10 → rank(.5)=5 value 50, rank(.9)=9 value 90
    assert out[("a", 0.5)] == (5, 50) and out[("a", 0.9)] == (9, 90)
    # b: n=4 → rank(.5)=2 value 2, rank(.9)=4 value 4
    assert out[("b", 0.5)] == (2, 2) and out[("b", 0.9)] == (4, 4)


def test_grouped_positions_match_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F2
    from ps_projekt_pagerank_spark.operators.quantiles import (
        grouped_positions,
    )

    rows = [(i, "g%d" % (i % 3), (i * 37) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, grp string, v long").repartition(8)
    got = {
        (r["grp"], r["k"]): r["rank"]
        for r in grouped_positions(
            df, "grp", [F2.asc("v"), F2.asc("k")]
        ).collect()
    }
    want = {
        (r["grp"], r["k"]): r["rank"]
        for r in df.withColumn(
            "rank",
            F2.row_number().over(
                Window.partitionBy("grp").orderBy(F2.asc("v"), F2.asc("k"))
            ).cast("long"),
        ).collect()
    }
    assert got == want


def test_grouped_quantiles_validates_qs(spark):
    import pytest as _pytest
    from ps_projekt_pagerank_spark.operators.quantiles import (
        grouped_quantiles,
    )

    df = spark.createDataFrame([(1, "a", 1)], "doc_id long, grp string, v long")
    with _pytest.raises(ValueError):
        grouped_quantiles(df, "v", "grp", qs=())
    with _pytest.raises(ValueError):
        grouped_quantiles(df, "v", "grp", qs=(0.0,))


# --- n-gram novelty ----------------------------------------------------------


def test_ngram_novelty_closed_form(spark):
    from ps_projekt_pagerank_spark.functions.text import ngram_novelty

    rows = [
        (1, "a b c d"),      # trigrams {a b c, b c d}
        (2, "a b c x"),      # trigrams {a b c, b c x} — shares "a b c"
        (3, "q r"),          # too short → 0 ngrams, NULL novelty
    ]
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(_docs(spark, rows), n=3).collect()
    }
    assert out[1]["n_ngrams"] == 2 and out[1]["novel_ngrams"] == 1
    assert out[1]["novelty"] == 0.5
    assert out[2]["novelty"] == 0.5
    assert out[3]["n_ngrams"] == 0 and out[3]["novelty"] is None


def test_ngram_novelty_distinct_within_doc(spark):
    from ps_projekt_pagerank_spark.functions.text import ngram_novelty

    # "a b a b a b": trigrams (a b a, b a b, a b a, b a b) → 2 DISTINCT,
    # both df=1 → novelty 1.0
    out = ngram_novelty(_docs(spark, [(1, "a b a b a b")]), n=3).collect()[0]
    assert out["n_ngrams"] == 2 and out["novelty"] == 1.0
