"""Round-4 session-2 operators: rich-club, eigenvector centrality, MIS,
condensation depth, contamination, mixture weights, PII scan — hand
fixtures with closed-form expectations plus the gate-contract checks."""

import math

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.contamination import (
    ngram_contamination,
)
from ps_projekt_pagerank_spark.functions.pii import pii_scan, redact
from ps_projekt_pagerank_spark.operators.eigenvector import eigenvector_fixed
from ps_projekt_pagerank_spark.operators.mis import maximal_independent_set
from ps_projekt_pagerank_spark.operators.richclub import rich_club
from ps_projekt_pagerank_spark.operators.sampling import mixture_weights
from ps_projekt_pagerank_spark.operators.scc import condensation_depth


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# --- rich club -------------------------------------------------------------


def test_rich_club_closed_form(spark):
    # K4 on {0,1,2,3} (degree 3 each) + pendant 4-0 (deg(4)=1, deg(0)=4)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = _edges(spark, k4 + [(4, 0)])
    rows = {
        r["k"]: r for r in rich_club(edges, ks=[1, 3]).collect()
    }
    # k=1: nodes with deg>1 = {0,1,2,3}; edges among them = 6 → phi=1.0
    assert rows[1]["n_nodes"] == 4 and rows[1]["n_edges"] == 6
    assert rows[1]["phi"] == 1.0
    # k=3: only node 0 (deg 4) → n<2 → phi 0.0
    assert rows[3]["n_nodes"] == 1 and rows[3]["phi"] == 0.0


def test_rich_club_ignores_duplicates_and_loops(spark):
    edges = _edges(spark, [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)])
    rows = {r["k"]: r for r in rich_club(edges, ks=[0]).collect()}
    # simple undirected graph: 0-1, 1-2 → 3 nodes deg>0, 2 edges
    assert rows[0]["n_nodes"] == 3 and rows[0]["n_edges"] == 2


# --- eigenvector centrality --------------------------------------------------


def test_eigenvector_star(spark):
    # all spokes point at the hub: after one sweep the hub holds all mass
    edges = _edges(spark, [(i, 99) for i in range(1, 6)])
    scores = {
        r["id"]: r["score"]
        for r in eigenvector_fixed(edges, num_iterations=1).collect()
    }
    assert scores[99] == 1.0
    assert all(scores[i] == 0.0 for i in range(1, 6))
    # a DAG operator is nilpotent: once paths run out the vector is zero
    # (and stays zero — the guarded normalization must not divide by 0)
    late = {
        r["id"]: r["score"]
        for r in eigenvector_fixed(edges, num_iterations=3).collect()
    }
    assert all(v == 0.0 for v in late.values())


def test_eigenvector_matches_numpy(spark):
    import numpy as np

    pairs = [(i * 7 % 11, i * 3 % 11) for i in range(40)]
    pairs = [(a, b) for a, b in pairs]
    edges = _edges(spark, pairs)
    got = {
        r["id"]: r["score"]
        for r in eigenvector_fixed(edges, num_iterations=5).collect()
    }
    nodes = sorted({n for e in pairs for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for s, d in pairs:
        a[idx[d], idx[s]] += 1.0  # weighted multigraph collapse
    x = np.ones(len(nodes))
    for _ in range(5):
        x = a @ x
        x = x / x.max()
    for n in nodes:
        assert math.isclose(got[n], x[idx[n]], abs_tol=1e-8)


# --- maximal independent set -------------------------------------------------


def test_mis_independent_and_maximal(spark):
    pairs = [(i * 13 % 37, i * 5 % 37) for i in range(120)]
    edges = _edges(spark, pairs)
    mis = {r["id"] for r in maximal_independent_set(edges).collect()}
    und = {(a, b) for a, b in pairs if a != b}
    und |= {(b, a) for a, b in und}
    nodes = {n for e in pairs for n in e}
    # independence: no MIS edge internal
    assert not any((a, b) in und for a in mis for b in mis)
    # maximality: every non-member has a MIS neighbor
    for v in nodes - mis:
        assert any((v, m) in und for m in mis), v
    # determinism
    again = {r["id"] for r in maximal_independent_set(edges).collect()}
    assert mis == again


def test_mis_gate_round_contract(spark):
    """_MIS_ROUNDS in __spark_entry__ must equal the measured fixpoint on
    the sf0.01 web graph — the unrolled DuckDB twin depends on it."""
    import __spark_entry__ as entry
    from ps_projekt_pagerank_spark.sources import derived as D

    edges = D.web_edges(spark, "/root/testdata/sf0.01")
    with pytest.raises(RuntimeError):
        maximal_independent_set(edges, max_rounds=entry._MIS_ROUNDS - 1)
    maximal_independent_set(edges, max_rounds=entry._MIS_ROUNDS).count()


# --- condensation depth ------------------------------------------------------


def test_condensation_depth_hand_graph(spark):
    # cycle {0,1,2} → 3 → cycle {4,5} → 6; plus isolated edge 7→8
    edges = _edges(
        spark,
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4), (5, 6),
         (7, 8)],
    )
    rows = {
        r["component"]: r for r in condensation_depth(edges).collect()
    }
    assert rows[0]["n_nodes"] == 3 and rows[0]["depth"] == 0
    assert rows[3]["n_nodes"] == 1 and rows[3]["depth"] == 1
    assert rows[4]["n_nodes"] == 2 and rows[4]["depth"] == 2
    assert rows[6]["n_nodes"] == 1 and rows[6]["depth"] == 3
    assert rows[7]["depth"] == 0 and rows[8]["depth"] == 1


# --- contamination -----------------------------------------------------------


def test_contamination_plants_flagged(spark):
    from ps_projekt_pagerank_spark.sources import derived as D

    docs = D.near_dup_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    is_bench = (F.col("doc_id") % D.NEAR_DUP_PLANT_MOD == 0) & (
        F.col("doc_id") < D.NEAR_DUP_ID_OFFSET
    )
    out = ngram_contamination(
        docs.where(~is_bench), docs.where(is_bench), n=8, threshold=0.5
    ).collect()
    plants = [r for r in out if r["doc_id"] >= D.NEAR_DUP_ID_OFFSET]
    clean = [r for r in out if r["doc_id"] < D.NEAR_DUP_ID_OFFSET]
    assert plants and all(r["contaminated"] for r in plants)
    # a plant shares 56 of its 57 8-grams with its benchmark original
    assert all(r["frac"] > 0.9 for r in plants)
    # originals' md5-token streams are doc-unique → zero overlap
    assert clean and all(r["n_contaminated"] == 0 for r in clean)


def test_contamination_short_doc_zero_shingles(spark):
    corpus = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h i")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h i")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, bench, n=8).collect()
    }
    assert rows[1]["n_shingles"] == 0 and rows[1]["frac"] == 0.0
    assert not rows[1]["contaminated"]
    assert rows[2]["n_shingles"] == 2 and rows[2]["n_contaminated"] == 2


# --- mixture weights ---------------------------------------------------------


def test_mixture_weights_sqrt_rebalance(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, lang string",
    )
    rows = {
        r["lang"]: r
        for r in mixture_weights(docs, budget=1000).collect()
    }
    z = math.sqrt(90) + math.sqrt(10)
    assert math.isclose(rows["big"]["weight"], math.sqrt(90) / z, abs_tol=1e-9)
    assert math.isclose(
        rows["small"]["target_docs"], 1000 * math.sqrt(10) / z, abs_tol=1e-5
    )
    # sqrt rebalance lifts the tail above its raw share (10%)
    assert rows["small"]["weight"] > 0.10
    assert math.isclose(
        rows["big"]["weight"] + rows["small"]["weight"], 1.0, abs_tol=1e-8
    )


# --- PII scan ----------------------------------------------------------------


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at bob.smith@corp-mail.co or 555-0199 today"),
            (2, "server 10.0.42.7 and 192.168.1.1 are fine"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[2]["n_ipv4"] == 2 and not rows[3]["has_pii"]
    # scanning the redacted text finds nothing
    redacted = docs.select("doc_id", redact(F.col("text")).alias("text"))
    again = pii_scan(redacted).collect()
    assert all(not r["has_pii"] for r in again)
    red1 = redacted.where("doc_id = 1").collect()[0]["text"]
    assert "<EMAIL>" in red1 and "<PHONE>" in red1
    assert "bob" not in red1 and "0199" not in red1


# --- graph coloring ----------------------------------------------------------


def test_coloring_proper_and_deterministic(spark):
    pairs = [(i * 11 % 29, i * 4 % 29) for i in range(80)]
    edges = _edges(spark, pairs)
    from ps_projekt_pagerank_spark.operators.coloring import graph_coloring

    col = {r["id"]: r["color"] for r in graph_coloring(edges).collect()}
    und = {(a, b) for a, b in pairs if a != b}
    deg = {}
    for a, b in und | {(b, a) for a, b in und}:
        deg[a] = deg.get(a, 0) + 0  # node discovery
    nodes = {n for e in pairs for n in e}
    assert set(col) == nodes
    # proper: no edge is monochromatic
    assert all(col[a] != col[b] for a, b in und)
    # greedy bound: at most Delta+1 colors
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    delta = max(len(v) for v in nbrs.values())
    assert max(col.values()) <= delta
    again = {r["id"]: r["color"] for r in graph_coloring(edges).collect()}
    assert col == again


def test_coloring_triangle_and_bipartite(spark):
    from ps_projekt_pagerank_spark.operators.coloring import graph_coloring

    tri = {r["id"]: r["color"] for r in graph_coloring(
        _edges(spark, [(0, 1), (1, 2), (2, 0)])).collect()}
    assert sorted(tri.values()) == [0, 1, 2]
    # even cycle is 2-colorable and the greedy achieves it here
    cyc = {r["id"]: r["color"] for r in graph_coloring(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])).collect()}
    assert all(cyc[a] != cyc[b] for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)])


def test_coloring_gate_round_contract(spark):
    """_COLOR_ROUNDS in __spark_entry__ must equal the measured JP
    fixpoint on the sf0.01 ring fixture — the unrolled twin depends
    on it."""
    import __spark_entry__ as entry
    from ps_projekt_pagerank_spark.operators.coloring import graph_coloring
    from ps_projekt_pagerank_spark.sources import derived as D

    log = []
    graph_coloring(
        D.ring_edges(spark, "/root/testdata/sf0.01"), round_log=log
    ).count()
    assert len(log) == entry._COLOR_ROUNDS


# --- zipf fit ----------------------------------------------------------------


def test_zipf_fit_closed_form(spark):
    from ps_projekt_pagerank_spark.functions.zipf import zipf_fit

    # freqs: a x8, b x4, c x2, d x1 → ranks 1..4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(docs).collect()[0]
    assert row["n_types"] == 4 and row["n_tokens"] == 15
    xs = [0, 1, 1, 2]  # floor log2 of ranks 1,2,3,4
    ys = [3, 2, 1, 0]  # floor log2 of freqs 8,4,2,1
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert math.isclose(row["slope"], slope, abs_tol=1e-9)
    assert math.isclose(
        row["intercept"], (sy - slope * sx) / n, abs_tol=1e-9
    )
    assert row["slope"] < 0  # heavier tokens at lower ranks


def test_zipf_fit_degenerate_uniform(spark):
    from ps_projekt_pagerank_spark.functions.zipf import zipf_fit

    # 2 types, ranks 1 and 2 -> x in {0,1}, equal freqs -> slope 0
    docs = spark.createDataFrame(
        [(1, "aa bb aa bb")], "doc_id long, text string"
    )
    row = zipf_fit(docs).collect()[0]
    assert row["slope"] == 0.0


# --- composed training mix -----------------------------------------------------


def test_training_mix_composition(spark):
    from ps_projekt_pagerank_spark.plans.trainmix import training_mix
    from ps_projekt_pagerank_spark.sources import derived as D

    docs = D.near_dup_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    is_bench = (F.col("doc_id") % D.NEAR_DUP_PLANT_MOD == 0) & (
        F.col("doc_id") < D.NEAR_DUP_ID_OFFSET
    )
    lang = (
        F.when(F.col("doc_id") % 4 == 0, "en")
        .when(F.col("doc_id") % 4 == 1, "de")
        .when(F.col("doc_id") % 4 == 2, "fr")
        .otherwise("sl")
    )
    corpus = docs.where(~is_bench).withColumn("lang", lang)
    bench = docs.where(is_bench)
    rows = training_mix(corpus, bench, budget=50).collect()
    n_corpus = corpus.count()
    n_plants = corpus.where(
        F.col("doc_id") >= D.NEAR_DUP_ID_OFFSET
    ).count()
    # contaminated plants are screened out before mixing
    assert sum(r["n_clean"] for r in rows) == n_corpus - n_plants
    assert all(0 <= r["n_sampled"] <= r["n_clean"] for r in rows)
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    # determinism: the md5 draw reproduces exactly
    again = training_mix(corpus, bench, budget=50).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# --- crawl pages / latest capture ---------------------------------------------


def test_crawl_pages_shape_and_latest_capture(spark):
    from ps_projekt_pagerank_spark.sources import derived as D
    from ps_projekt_pagerank_spark.sources.extraction import latest_capture

    pages = D.crawl_pages(spark, "/root/testdata/sf0.001")
    # the north-rule input shape, verbatim
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,"
        "text:string,lang:string>"
    )
    n_docs = D.documents(spark, "/root/testdata/sf0.001").count()
    assert pages.count() > n_docs  # re-captures present
    latest = latest_capture(pages)
    assert latest.count() == n_docs  # exactly one capture per url
    # every url with a re-capture surfaces the updated text
    updated = latest.where(F.col("text").endswith(" updated"))
    recrawled = pages.groupBy("url").count().where("count > 1").count()
    assert updated.count() == recrawled > 0


# --- exact quantiles / capture changes ------------------------------------------


def test_exact_quantiles_closed_form(spark):
    from ps_projekt_pagerank_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])],
        "id long, v long",
    )
    rows = {r["q"]: r for r in exact_quantiles(
        df, "v", qs=(0.1, 0.5, 1.0), key_col="id").collect()}
    assert rows[0.1]["rank"] == 1 and rows[0.1]["value"] == 10
    assert rows[0.5]["rank"] == 5 and rows[0.5]["value"] == 50
    assert rows[1.0]["rank"] == 10 and rows[1.0]["value"] == 100


def test_exact_quantiles_validates_q(spark):
    from ps_projekt_pagerank_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", qs=(0.0,))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", qs=())


def test_capture_change_stats(spark):
    from ps_projekt_pagerank_spark.sources import derived as D
    from ps_projekt_pagerank_spark.sources.extraction import (
        capture_change_stats,
    )

    stats = capture_change_stats(
        D.crawl_pages(spark, "/root/testdata/sf0.001")
    )
    rows = stats.collect()
    # every 3rd url was re-crawled with changed text
    changed = [r for r in rows if r["changed"]]
    assert changed and all(
        r["n_captures"] == 2 and r["n_versions"] == 2 for r in changed
    )
    stable = [r for r in rows if not r["changed"]]
    assert stable and all(r["n_captures"] == 1 for r in stable)


# --- attack robustness ----------------------------------------------------------


def test_attack_robustness_hand_graph(spark):
    from ps_projekt_pagerank_spark.operators.robustness import (
        attack_robustness,
    )

    # hub 0 (degree 4 — strictly the highest) bridges two triangles
    # {1,2,3} and {4,5,6}
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4),
         (0, 1), (0, 2), (0, 4), (0, 5)],
    )
    rows = {r["k"]: r for r in attack_robustness(edges, ks=(0, 1)).collect()}
    assert rows[0]["n_nodes"] == 7 and rows[0]["giant_size"] == 7
    assert rows[0]["giant_frac"] == 1.0
    # removing the hub splits the graph into two triangles
    assert rows[1]["n_nodes"] == 6 and rows[1]["giant_size"] == 3
    assert rows[1]["giant_frac"] == 0.5


def test_attack_robustness_total_removal(spark):
    from ps_projekt_pagerank_spark.operators.robustness import (
        attack_robustness,
    )

    edges = _edges(spark, [(1, 2)])
    rows = {r["k"]: r for r in attack_robustness(edges, ks=(1, 2)).collect()}
    # one survivor, isolated -> singleton giant
    assert rows[1]["n_nodes"] == 1 and rows[1]["giant_size"] == 1
    # all nodes removed -> empty graph
    assert rows[2]["n_nodes"] == 0 and rows[2]["giant_frac"] == 0.0


# --- embedding outliers -----------------------------------------------------------


def test_embedding_outliers_planted(spark):
    from ps_projekt_pagerank_spark.functions.embeddings import (
        embedding_outliers,
    )

    # 9 tight vectors around (1,0) plus one far outlier per label
    rows = []
    vid = 0
    for label in (0, 1):
        for i in range(9):
            rows.append((vid, label, [1.0 + i * 0.001, 0.0]))
            vid += 1
        rows.append((vid, label, [50.0, 50.0]))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in embedding_outliers(df, q=0.9).collect()}
    planted = {9, 19}
    flagged = {v for v, r in out.items() if r["is_outlier"]}
    assert flagged == planted
    # the outlier drags the centroid, but tight members still sit two
    # orders of magnitude closer to it than the plant does
    tight_max = max(out[v]["dist2"] for v in out if v not in planted)
    plant_min = min(out[v]["dist2"] for v in planted)
    assert plant_min > 50 * tight_max


def test_embedding_outliers_validates_q(spark):
    from ps_projekt_pagerank_spark.functions.embeddings import (
        embedding_outliers,
    )

    df = spark.createDataFrame(
        [(1, 0, [1.0])], "vec_id long, label int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        embedding_outliers(df, q=1.5)
