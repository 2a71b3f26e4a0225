"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship converged PageRank over an edge table derived
from sf0.001; ``queries()`` — one entry per implemented operator from
SURVEY.md §2 (+ north-rule / training-pipeline extensions); ``oracle_sql()``
— the DuckDB-runnable equivalent for every SQL-expressible query (iterative
frozen-node algorithms are covered by pytest vs the NumPy oracle and get the
driver's rows-only check here).

Engine-vs-oracle determinism rules used throughout:
- graphs derive from lineitem by modular arithmetic (bit-identical in both
  engines, see ps_projekt_pagerank_spark.sources.derived);
- every float is rounded (1e-6/1e-9) before compare/order; orderings break
  ties by id; hashes are md5 (identical hex in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark import DAMPING, NORTH_EPSILON
from ps_projekt_pagerank_spark.functions import text as tx
from ps_projekt_pagerank_spark.operators import dedup as dd
from ps_projekt_pagerank_spark.operators import graph as G
from ps_projekt_pagerank_spark.operators import multimodal as mm
from ps_projekt_pagerank_spark.operators.anf import anf_neighborhood
from ps_projekt_pagerank_spark.operators.cocitation import (
    cocitation_pairs,
    coupling_pairs,
)
from ps_projekt_pagerank_spark.operators.dedup import dedup_clusters
from ps_projekt_pagerank_spark.operators.graph import reciprocity
from ps_projekt_pagerank_spark.operators.hostgraph import host_edges
from ps_projekt_pagerank_spark.operators.sampling import (
    ego_network,
    random_walks,
    stratified_sample,
)
from ps_projekt_pagerank_spark.operators.triangles import clustering_coefficient
from ps_projekt_pagerank_spark.operators import similarity as sim
from ps_projekt_pagerank_spark.operators.components import connected_components
from ps_projekt_pagerank_spark.operators.labelprop import label_propagation
from ps_projekt_pagerank_spark.operators.pagerank import pagerank, pagerank_fixed
from ps_projekt_pagerank_spark.operators.triangles import triangles_total
from ps_projekt_pagerank_spark.plans.reporting import top_bottom_k
from ps_projekt_pagerank_spark.sources import derived as D
from ps_projekt_pagerank_spark.sources.tripler import tripled
from ps_projekt_pagerank_spark.streaming.events import windowed_event_agg

# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Converged frozen-node PageRank (d=0.85, eps=1e-6) on the web graph
    derived from sf0.001, reporting top/bottom-10 with in-link counts."""
    sf_dir = "/root/testdata/sf0.001"
    edges = D.web_edges(spark, sf_dir)
    result = pagerank(edges, epsilon=NORTH_EPSILON, max_iterations=200)
    return top_bottom_k(result.ranks, edges, k=10).select(
        "which", "id", "inlinks", F.round("rank", 6).alias("rank")
    )


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def _q_node_ids(spark, sf_dir):
    return G.node_ids(D.web_edges(spark, sf_dir))


def _q_out_degrees(spark, sf_dir):
    return G.out_degrees(D.web_edges(spark, sf_dir))


def _q_sinks(spark, sf_dir):
    return G.sink_nodes(D.web_edges(spark, sf_dir))


def _q_tripled(spark, sf_dir):
    return tripled(D.web_edges(spark, sf_dir))


# shared once-built web graph for the rank family (VERDICT r3 task 5):
# with SPARK_GRAFT_CACHE_DERIVED set (the gate replica's mode), the
# weighted adjacency is built/persisted once and every rank query
# scatters over it; unset (driver default), each query builds its own —
# identical results either way (graph= is just the prebuilt input).
_GRAPH_CACHE: dict = {}


def _web_graph(spark, sf_dir):
    import os as _os

    if not _os.environ.get("SPARK_GRAFT_CACHE_DERIVED"):
        return None
    key = (id(spark), sf_dir)
    g = _GRAPH_CACHE.get(key)
    if g is None:

        g = build_graph(D.web_edges(spark, sf_dir))
        _GRAPH_CACHE[key] = g
    return g


def _q_pagerank_fixed4(spark, sf_dir):
    ranks = pagerank_fixed(
        D.web_edges(spark, sf_dir),
        num_iterations=4,
        graph=_web_graph(spark, sf_dir),
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def _q_opic4(spark, sf_dir):
    res = opic(
        D.web_edges(spark, sf_dir),
        num_iterations=4,
        graph=_web_graph(spark, sf_dir),
    )
    return res.select(
        "id",
        F.round("cash", 9).alias("cash"),
        F.round("history", 9).alias("history"),
        F.round("importance", 9).alias("importance"),
    )


def _q_pagerank_total(spark, sf_dir):
    ranks = pagerank_fixed(
        D.web_edges(spark, sf_dir),
        num_iterations=4,
        graph=_web_graph(spark, sf_dir),
    )
    return ranks.agg(F.round(F.sum("rank"), 6).alias("total_rank"))


def _q_pagerank_top10(spark, sf_dir):
    ranks = pagerank_fixed(
        D.web_edges(spark, sf_dir),
        num_iterations=4,
        graph=_web_graph(spark, sf_dir),
    )
    r = ranks.select("id", F.round("rank", 9).alias("rank"))
    return r.orderBy(F.desc("rank"), F.asc("id")).limit(10)


def _q_pagerank_converged_top20(spark, sf_dir):
    # full frozen-node convergence loop — iterative, pytest-verified vs the
    # NumPy oracle; driver does the rows-only check (no SQL form exists)
    edges = D.web_edges(spark, sf_dir)
    res = pagerank(
        edges,
        epsilon=NORTH_EPSILON,
        max_iterations=200,
        graph=_web_graph(spark, sf_dir),
    )
    r = res.ranks.select("id", F.round("rank", 6).alias("rank"))
    return r.orderBy(F.desc("rank"), F.asc("id")).limit(20)


def _q_salsa4(spark, sf_dir):
    return salsa(D.web_edges(spark, sf_dir), iterations=4).select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _q_hits4(spark, sf_dir):
    return hits(D.web_edges(spark, sf_dir), iterations=4).select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


_PPR_SEEDS = [0, 1, 2, 3, 4]


def _q_ppr_fixed4(spark, sf_dir):
    r = pagerank_personalized_fixed(
        D.web_edges(spark, sf_dir), seeds=_PPR_SEEDS, num_iterations=4
    )
    return r.select("id", F.round("rank", 9).alias("rank"))


def _q_spam_mass(spark, sf_dir):
    return spam_mass(
        D.web_edges(spark, sf_dir), trusted=_PPR_SEEDS, num_iterations=4
    )


def _q_degree_dist(spark, sf_dir):
    return degree_distribution(D.web_edges(spark, sf_dir))


def _q_components(spark, sf_dir):
    return connected_components(D.block_edges(spark, sf_dir))


def _q_components_star(spark, sf_dir):
    return connected_components_star(D.block_edges(spark, sf_dir))


def _q_labelprop(spark, sf_dir):
    return label_propagation(D.block_edges(spark, sf_dir), rounds=5)


def _q_louvain(spark, sf_dir):
    return louvain_moves(D.block_edges(spark, sf_dir), rounds=4)


def _q_matching(spark, sf_dir):
    return maximal_matching(D.block_edges(spark, sf_dir))


def _q_coarsen_map(spark, sf_dir):
    return coarsen_map(D.block_edges(spark, sf_dir))


def _q_coarsen_edges(spark, sf_dir):
    return coarsen_edges(D.block_edges(spark, sf_dir))


def _q_cc_size_hist(spark, sf_dir):
    return component_size_histogram(
        connected_components(D.block_edges(spark, sf_dir))
    )


def _q_cc_summary(spark, sf_dir):
    return component_summary(
        connected_components(D.block_edges(spark, sf_dir))
    )


def _q_vocab_coverage(spark, sf_dir):
    return tx.vocab_coverage(
        D.documents(spark, sf_dir).select("doc_id", "text"), top_k=100
    )


def _q_vocab_by_lang_fm(spark, sf_dir):
    pairs = (
        D.documents(spark, sf_dir)
        .select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    return fm_count_distinct_by_key(pairs, "lang", "tok")


def _q_corpus_splits(spark, sf_dir):
    return corpus_splits(
        D.documents(spark, sf_dir).select("doc_id"),
        {"train": 0.5, "val": 0.25, "test": 0.25},
        key_cols=["doc_id"],
        salt="split1",
    )


def _q_pmi_bigrams(spark, sf_dir):
    return tx.pmi_collocations(
        D.documents(spark, sf_dir).select("doc_id", "text"),
        min_count=3,
        min_pmi_bits=1,
    )


def _q_vocab_fm(spark, sf_dir):
    toks = (
        D.documents(spark, sf_dir)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("v"))
        .where(F.col("v") != "")
    )
    return fm_count_distinct(toks, "v")


def _q_quality_model(spark, sf_dir):
    return hashed_linear_score(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


N_BPE_MERGES = 8


def _q_bpe_merges(spark, sf_dir):
    return bpe_learn_merges(
        D.documents(spark, sf_dir).select("doc_id", "text"), N_BPE_MERGES
    )


def _q_bpe_tokens(spark, sf_dir):
    docs = D.documents(spark, sf_dir).select("doc_id", "text")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn_merges(docs, N_BPE_MERGES).collect()
    ]
    return bpe_encode(docs, merges)


def _q_vocab_hll(spark, sf_dir):
    toks = (
        D.documents(spark, sf_dir)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("v"))
        .where(F.col("v") != "")
    )
    return hll_count_distinct(toks, "v")


def _q_vocab_by_lang_hll(spark, sf_dir):
    pairs = (
        D.documents(spark, sf_dir)
        .select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    return hll_count_distinct_by_key(pairs, "lang", "tok")


def _q_corpus_pipeline(spark, sf_dir):
    docs = D.documents(spark, sf_dir).select("doc_id", "text", "n_chars")
    dups = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "n_chars"
    )
    return corpus_pipeline(docs.unionAll(dups))


def _q_corpus_pipeline_neardup(spark, sf_dir):
    # the composed filter WITH the minhash near-dup stage, on the
    # wide-vocabulary fixture where LSH discriminates (VERDICT r3 task 7);
    # keep_p_scale below the fixture's ~450-char docs so the weighted
    # sampler stage also discriminates

    return corpus_pipeline(
        D.near_dup_documents(spark, sf_dir),
        near_dup=True,
        keep_p_scale=600.0,
        salt="corpusnd",
    )


def _q_lm_bigram_surprisal(spark, sf_dir):
    return tx.lm_bigram_surprisal_stats(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


def _q_lm_surprisal(spark, sf_dir):
    return tx.lm_surprisal_stats(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


def _q_principal_component(spark, sf_dir):
    # power-iteration top PC of the embedding corpus (centering vector +
    # direction) — the all-but-the-top whitening primitive

    return principal_component(D.embeddings(spark, sf_dir), iters=3)


def _q_pc_projection(spark, sf_dir):
    vecs = D.embeddings(spark, sf_dir)
    return pc_projection(vecs, principal_component(vecs, iters=3))


def _q_perplexity_buckets(spark, sf_dir):
    # CCNet head/middle/tail tiers at the exact corpus surprisal terciles
    return tx.perplexity_buckets(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


def _q_tfidf_top5(spark, sf_dir):
    return tx.tfidf_top_terms(
        D.documents(spark, sf_dir).select("doc_id", "text"), k=5
    )


def _q_chunk_dup_stats(spark, sf_dir):
    return dd.chunk_dup_stats(
        D.documents(spark, sf_dir).select("doc_id", "text"), chunk_tokens=16
    )


def _q_weighted_sample(spark, sf_dir):
    docs = D.documents(spark, sf_dir).select(
        "doc_id",
        F.least(
            F.lit(1.0), F.col("n_chars").cast("double") / F.lit(500.0)
        ).alias("keep_p"),
    )
    return weighted_bernoulli_sample(
        docs, "keep_p", key_cols=["doc_id"], salt="mix1"
    )


def _q_cluster_stats(spark, sf_dir):
    return cluster_stats(D.embeddings(spark, sf_dir))


def _q_quantize_embeddings(spark, sf_dir):
    return quantize_embeddings(D.embeddings(spark, sf_dir))


_BFS_SEEDS = [0, 17]


def _q_bfs_distances(spark, sf_dir):
    return bfs_distances(
        D.sparse_edges(spark, sf_dir), seeds=_BFS_SEEDS, max_depth=4
    )


def _q_bfs_hopplot(spark, sf_dir):
    return distance_histogram(
        bfs_distances(
            D.sparse_edges(spark, sf_dir), seeds=_BFS_SEEDS, max_depth=4
        )
    )


_DIAM_SEEDS = [0, 17, 42, 99]


def _q_crawl_schedule(spark, sf_dir):
    frontier = D.url_edges(spark, sf_dir).groupBy(
        F.col("dst_url").alias("url")
    ).agg(F.count("*").alias("inlinks"))
    return crawl_schedule(frontier, "inlinks", per_host_per_round=2)


def _q_resolve_redirects(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    red = (
        li.select((F.col("l_orderkey") % 4999).alias("src"))
        .where(F.col("src") % 7 != 0)
        .select("src", (F.col("src") - 1).alias("dst"))
        .distinct()
    )
    return resolve_redirects(red)


def _q_anchor_postings(spark, sf_dir):
    return anchor_postings(anchor_texts(_synthetic_pages(spark, sf_dir)))


def _q_anchor_search(spark, sf_dir):
    return anchor_search(
        anchor_texts(_synthetic_pages(spark, sf_dir)), ["x", "y"], k=10
    )


def _robots_fixture(spark, sf_dir):
    # per-host robots.txt: a '*' group (/p{g} disallowed except /p{g}/ok)
    # plus a testbot group — exercises comments, group boundaries, and
    # allow-overrides; byte-identical text in the DuckDB fixture
    docs = D.documents(spark, sf_dir)
    g = docs.select((F.col("doc_id") % 7).alias("g")).distinct()
    gs = F.col("g").cast("string")
    return g.select(
        F.concat(F.lit("h"), gs, F.lit(".com")).alias("host"),
        F.concat(
            F.lit("# synthetic robots\nuser-agent: *\ndisallow: /p"),
            gs,
            F.lit("\nallow: /p"),
            gs,
            F.lit("/ok\nuser-agent: testbot\ndisallow: /q"),
            gs,
        ).alias("robots_txt"),
    )


def _q_robots_rules(spark, sf_dir):
    return rb.robots_rules(_robots_fixture(spark, sf_dir))


def _q_crawl_allowed(spark, sf_dir):
    docs = D.documents(spark, sf_dir)
    g = (F.col("doc_id") % 7).cast("string")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("/p"), g))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("/p"), g, F.lit("/ok/x")))
        .otherwise(F.lit("/free"))
    )
    urls = docs.select(
        F.concat(F.lit("http://h"), g, F.lit(".com"), suffix).alias("url")
    ).distinct()
    return rb.crawl_allowed(
        urls, rb.robots_rules(_robots_fixture(spark, sf_dir)), agent="*"
    )


def _q_leakage_safe_split(spark, sf_dir):
    # cluster-keyed train/test split over the planted-duplicate corpus —
    # near-dups never straddle the boundary
    return dd.leakage_safe_split(_docs_with_dups(spark, sf_dir), test_frac=0.2)


def _q_skipgram_pairs(spark, sf_dir):
    # DeepWalk = random_walks ∘ skip-gram: pair counts over the SAME
    # md5-deterministic walk corpus smp_random_walks gates

    return skipgram_pairs(
        random_walks(D.sparse_edges(spark, sf_dir), walk_length=4),
        window=2,
    )


def _q_anchor_bm25(spark, sf_dir):
    # BM25 over a vocabulary-rich synthetic anchor set: a per-doc rare
    # term t{doc_id % 97} (df ~ 2% of targets -> positive idf_bits) plus
    # the doc's first two text tokens (common terms -> idf_bits 0, the
    # stopword-suppression path) — the x/y anchor fixture is degenerate
    # for idf, so BM25 gets its own

    docs = D.documents(spark, sf_dir)
    anchors = docs.select(
        F.lit("s").alias("src_url"),
        F.concat(
            F.lit("u"), (F.col("doc_id") * 7 % 211).cast("string")
        ).alias("dst_url"),
        F.concat(
            F.lit("t"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(" "),
            F.array_join(F.slice(F.split("text", " "), 1, 2), " "),
        ).alias("anchor"),
    )
    return anchor_bm25(anchors, ["t13", "t42", "join"], k=10)


def _q_events_trending(spark, sf_dir):
    return trending_event_types(D.events(spark, sf_dir), k=3)


def _q_edge_report(spark, sf_dir):
    return edge_table_report(D.web_edges(spark, sf_dir))


def _q_top_docs_per_lang(spark, sf_dir):
    return top_k_per_group(
        D.documents(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        group_col="lang",
        order_col="n_chars",
        k=3,
        tiebreak_col="doc_id",
    )


_PPR_BATCH_SEEDS = [0, 17, 42]


def _q_ppr_batch(spark, sf_dir):
    out = pagerank_personalized_batch(
        D.web_edges(spark, sf_dir), _PPR_BATCH_SEEDS, num_iterations=3
    )
    return out.select(
        "seed", "id", F.round("rank", 9).alias("rank")
    )


def _q_wl_colors(spark, sf_dir):
    return wl_colors(D.sparse_edges(spark, sf_dir), rounds=2)


def _q_wl_histogram(spark, sf_dir):
    return wl_color_histogram(
        wl_colors(D.sparse_edges(spark, sf_dir), rounds=2)
    )


def _q_ktruss3(spark, sf_dir):
    return k_truss(D.sparse_edges(spark, sf_dir), k=3)


def _q_truss_decomp(spark, sf_dir):
    return truss_decomposition(D.sparse_edges(spark, sf_dir), rounds=5)


def _q_betweenness(spark, sf_dir):
    return betweenness_sampled(
        D.sparse_edges(spark, sf_dir), seeds=_DIAM_SEEDS, max_depth=4
    )


def _q_eff_diameter(spark, sf_dir):
    return effective_diameter_sampled(
        D.sparse_edges(spark, sf_dir), seeds=_DIAM_SEEDS, max_depth=5
    )


def _q_closeness(spark, sf_dir):
    # truncated closeness from the effective-diameter seed sample; exact
    # BIGINT moments + one guarded IEEE division per score

    return closeness_sampled(
        D.sparse_edges(spark, sf_dir), seeds=_DIAM_SEEDS, max_depth=5
    )


def _q_sssp_weighted(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    we = li.select(
        (F.col("l_orderkey") % 4999).alias("src"),
        (F.col("l_partkey") % 4999).alias("dst"),
        ((F.col("l_suppkey") % 7) + 1).alias("w"),
    )
    return sssp_weighted(we, seeds=_BFS_SEEDS, rounds=4)


def _q_modularity_lp(spark, sf_dir):
    block = D.block_edges(spark, sf_dir)
    return modularity(block, label_propagation(block, rounds=5), "label")


def _q_triangles(spark, sf_dir):
    return triangles_total(D.sparse_edges(spark, sf_dir))


def _q_triangles_per_node(spark, sf_dir):
    return triangles_per_node(D.sparse_edges(spark, sf_dir))


def _q_order_agreement(spark, sf_dir):
    """R4 — positional agreement between the 3- and 4-iteration rank
    orderings (reference main.cpp:16-33 compares backends; here the two
    'backends' are two iteration depths — a deterministic, SQL-expressible
    stand-in). Ordering key rounds rank to 9 decimals so Spark and DuckDB
    sort identically despite last-ulp float differences. Positions use the
    distributed numbering (plans.positions) — no partitionless Window."""

    edges = D.web_edges(spark, sf_dir)
    g = build_graph(edges)  # one shared build: both depths scatter over it

    def positions(num_iters):
        r = pagerank_fixed(edges, num_iters, graph=g).select(
            "id", F.round("rank", 9).alias("rk")
        )
        return global_positions(r, [F.desc("rk"), F.asc("id")]).select(
            "id", "pos"
        )

    a = positions(3).withColumnRenamed("id", "id_a")
    b = positions(4).withColumnRenamed("id", "id_b")
    return (
        a.join(b, "pos")
        .agg(
            F.round(
                F.avg((F.col("id_a") == F.col("id_b")).cast("double")), 6
            ).alias("agreement")
        )
    )


def _docs_with_dups(spark, sf_dir):
    docs = D.documents(spark, sf_dir).select("doc_id", "text")
    dups = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionAll(dups)


def _q_dedup_exact(spark, sf_dir):
    return dd.exact_duplicates(_docs_with_dups(spark, sf_dir))


def _q_minhash_sigs(spark, sf_dir):
    return dd.minhash_signatures(D.documents(spark, sf_dir).select("doc_id", "text"))


def _q_minhash_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(_docs_with_dups(spark, sf_dir))


def _q_token_jaccard(spark, sf_dir):
    # candidate-driven: minhash LSH pairs feed the exact-jaccard verifier,
    # so the plan never builds the token-bucket self-join (the scale path);
    # the DuckDB twin replays the identical band predicate
    docs = D.documents(spark, sf_dir).select("doc_id", "text").where(
        F.col("doc_id") < 120
    )
    cands = dd.minhash_lsh_pairs(docs)
    return dd.token_jaccard_pairs(docs, threshold=0.5, candidates=cands)


def _q_simhash(spark, sf_dir):
    # md5-bit-source variant (engine-portable) so the DuckDB twin replays
    # the fingerprint bit-for-bit; the xxhash64 variant (simhash64) stays
    # the fast default and is pytest-covered vs the NumPy oracle
    return dd.simhash_hex(D.documents(spark, sf_dir).select("doc_id", "text"))


def _q_simhash_pairs(spark, sf_dir):
    return dd.simhash_near_pairs_hex(
        _docs_with_dups(spark, sf_dir), max_hamming=3
    ).select("id_a", "id_b")


def _q_embedding_neardup(spark, sf_dir):
    return dd.embedding_neardup_pairs(D.embeddings(spark, sf_dir), threshold=0.35)


def _q_knn(spark, sf_dir):
    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sim.knn_bruteforce(vecs, queries, k=5).select(
        "query_id", "neighbor_id", "knn_rank"
    )


def _q_knn_ivf(spark, sf_dir):
    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sim.knn_ivf(
        vecs, queries, k=5, num_centroids=8, nprobe=2
    ).select("query_id", "neighbor_id", "knn_rank")


def _q_knn_lsh(spark, sf_dir):
    # md5-derived literal hyperplanes (engine-portable) so the DuckDB twin
    # replays the buckets exactly; the xxhash64 planes stay the fast
    # default and are pytest-covered
    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sim.knn_lsh(
        vecs, queries, k=5, num_bits=4, planes=sim.md5_planes(4, 64)
    ).select("query_id", "neighbor_id", "knn_rank")


def _q_knn_pq(spark, sf_dir):
    # product quantization: m=4 subspaces x ksub=8 codewords over the
    # 64-dim embeddings; ADC distances. The twin replays the per-subspace
    # Lloyd trajectory (rounded-L2 assignment, 6-dp means) exactly.
    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sim.knn_pq(
        vecs, queries, k=5, m=4, ksub=8, kmeans_iters=2, dim=64
    ).select("query_id", "neighbor_id", "knn_rank")


def _q_pq_codes(spark, sf_dir):
    # the compressed-corpus artifact itself: every vector as m codeword ids
    vecs = D.embeddings(spark, sf_dir)
    books = sim.pq_codebooks(vecs, m=4, ksub=8, kmeans_iters=2, dim=64)
    return sim.pq_encode(vecs, books, m=4, dim=64)


def _q_knn_ivfpq(spark, sf_dir):
    # IVFADC: coarse L2 cells + PQ on residuals — the twin replays BOTH
    # k-means trajectories (coarse = an m=1 chain) and the per-cell
    # query-residual ADC
    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sim.knn_ivfpq(
        vecs, queries, k=5, num_cells=4, m=4, ksub=8, kmeans_iters=2,
        nprobe=2, dim=64,
    ).select("query_id", "neighbor_id", "knn_rank")


def _q_token_stats(spark, sf_dir):
    return tx.quality_features(D.documents(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return tx.lang_id(D.documents(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return D.documents(spark, sf_dir).select(
        "doc_id", tx.fingerprint("text").alias("fp")
    )


def _synthetic_pages(spark, sf_dir, mods=((7, 500), (13, 500))):
    """pages(url, html BINARY) synthesized from `documents` — html embeds a
    script/style head, the doc text, and two modular hrefs ``u{doc_id *
    mult % mod}``, so the whole S4 path (Arrow-UDF text + href extraction,
    url→id dictionary encoding) is covered by the driver's DuckDB
    cross-check, not just pytest. The default mods keep the original
    s4_extract_* oracles; the e2e flagship passes a skewed pair."""
    docs = D.documents(spark, sf_dir)
    (m1, d1), (m2, d2) = mods
    html = F.concat(
        F.lit(
            "<html><head><script>var x = 1;</script>"
            "<style>p { color: red }</style></head><body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="u'),
        (F.col("doc_id") * m1 % d1).cast("string"),
        F.lit('">x</a> <a href="u'),
        (F.col("doc_id") * m2 % d2).cast("string"),
        F.lit('">y</a></body></html>'),
    )
    return docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
        html.cast("binary").alias("html"),
    )


def _q_extract_text(spark, sf_dir):
    return extract_text(_synthetic_pages(spark, sf_dir))


def _q_extract_edges(spark, sf_dir):
    edges, _ = pages_to_graph(_synthetic_pages(spark, sf_dir))
    return edges


def _q_snap_roundtrip(spark, sf_dir):
    """S1 — the SNAP text scan, gate-checked end-to-end: render the derived
    web graph as a SNAP edge list (``#`` comment lines + tab-separated
    src/dst pairs), write it with the distributed text sink, re-scan with
    sources.snap.read_snap_edges, and reduce to the per-edge multiset.
    Oracle = the same multiset straight from lineitem, so equality proves
    the text round-trip (comment filtering, whitespace split, long cast,
    duplicate-edge preservation) is lossless. Ref: src/Graph.cpp:32-101."""
    import hashlib
    import os
    import tempfile


    out = os.path.join(
        tempfile.gettempdir(),
        "snap_rt_" + hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    header = spark.createDataFrame(
        [
            ("# Directed graph: derived web edges (round-trip fixture)",),
            ("# FromNodeId\tToNodeId",),
        ],
        "value STRING",
    )
    lines = D.web_edges(spark, sf_dir).select(
        F.concat_ws("\t", F.col("src"), F.col("dst")).alias("value")
    )
    header.unionAll(lines).write.mode("overwrite").text(out)
    return (
        read_snap_edges(spark, out)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("multiplicity"))
    )


def _q_e2e_extract_rank(spark, sf_dir):
    """Flagship end-to-end pipeline in ONE gate row: synthesized crawl pages
    → S4 extraction (Arrow href UDF + distributed url dictionary) → edge
    encoding → 4 fixed PageRank sweeps → top-10 urls by rank. The DuckDB
    twin replays extraction in SQL and unrolls the same 4 sweeps, so the
    whole production path is value-hash-checked across engines. Hrefs use
    a skewed pair — u{id*7%499} (near-permutation) + u{id%25} (25 hub
    pages with ~20 in-links each) — so ranks genuinely vary; the default
    s4 pair is 2-regular (both multipliers coprime to 500) and would make
    every rank a constant 1/n."""

    edges, urls = pages_to_graph(
        _synthetic_pages(spark, sf_dir, mods=((7, 499), (1, 25)))
    )
    r = pagerank_fixed(edges, num_iterations=4).select(
        "id", F.round("rank", 9).alias("rank")
    )
    return (
        r.orderBy(F.desc("rank"), F.asc("id"))
        .limit(10)
        .join(urls, "id")
        .select("url", "rank")
    )


def _q_events_agg(spark, sf_dir):
    return windowed_event_agg(D.events(spark, sf_dir))


def _q_events_props(spark, sf_dir):
    """Semi-structured path: parse the JSON props column JVM-side
    (get_json_object — no Python) and aggregate the extracted field."""
    ev = D.events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def _q_events_sessions(spark, sf_dir):
    return sessionized(D.events(spark, sf_dir))


def _q_multimodal_decode(spark, sf_dir):
    media = mm.fake_media(D.documents(spark, sf_dir))
    return mm.decode_image(media, codec="fake")


def _q_frame_sample(spark, sf_dir):
    media = mm.fake_media(D.documents(spark, sf_dir))
    return mm.frame_sample(media, every_n=10)


def _q_ppm_decode(spark, sf_dir):
    # REAL pixel decode: fake_media_ppm emits valid binary PPM (P6); the
    # pure-numpy decoder parses the header and sums the actual pixel
    # plane. Gate compares the exact-integer columns; mean_pixel (a
    # Python-rounded float) is pytest-covered instead (round-half ties
    # differ between Python and SQL round)
    media = mm.fake_media_ppm(D.documents(spark, sf_dir))
    return mm.decode_image(media, codec="ppm").select(
        "media_id", "width", "height", "channels", "n_pixels", "pixel_sum"
    )


def _q_png_decode(spark, sf_dir):
    # REAL compressed decode (round-4 verdict task 6): valid PNGs
    # (deflate + CRCs + None/Sub/Up filter rotation) built from the same
    # md5 pixel plane closed form, decoded with stdlib zlib + numpy.
    # Gate compares the exact-integer columns; mean_pixel is
    # pytest-covered (same reason as the PPM row)
    media = mm.fake_media_png(D.documents(spark, sf_dir))
    return mm.decode_image(media, codec="png").select(
        "media_id", "width", "height", "channels", "n_pixels", "pixel_sum"
    )


def _q_anf_reach(spark, sf_dir):
    # gate compares the INTEGER per-h sum of FM bit positions only —
    # est_reach is a float sum whose addition order differs across engines
    return anf_neighborhood(D.sparse_edges(spark, sf_dir), rounds=3).select(
        "h", "sum_positions"
    )


def _q_harmonic(spark, sf_dir):
    # per-node floats ARE comparable here (unlike est_reach above): each
    # round's estimate is rounded to 6 dp before the fixed-order
    # telescoping sum, so both engines walk identical doubles
    return harmonic_centrality(D.sparse_edges(spark, sf_dir), rounds=3)


def _q_assortativity(spark, sf_dir):
    return degree_assortativity(D.sparse_edges(spark, sf_dir))


def _q_katz(spark, sf_dir):
    return katz_fixed(D.web_edges(spark, sf_dir), num_iterations=4)


def _q_node_reciprocity(spark, sf_dir):
    return node_reciprocity(D.web_edges(spark, sf_dir))


def _q_avg_nn_degree(spark, sf_dir):
    return avg_neighbor_degree(D.sparse_edges(spark, sf_dir))


def _q_neighborhood_jaccard(spark, sf_dir):
    return neighborhood_jaccard(
        D.sparse_edges(spark, sf_dir), min_common=2, max_fanout=16
    )


def _q_cocitation(spark, sf_dir):
    return cocitation_pairs(
        D.sparse_edges(spark, sf_dir), min_count=2, max_fanout=16
    )


def _q_coupling(spark, sf_dir):
    return coupling_pairs(
        D.sparse_edges(spark, sf_dir), min_count=1, max_fanout=16
    )


def _q_random_walks(spark, sf_dir):
    # path as a '-'-joined string: arrays hash differently across engines,
    # strings don't; start/order are already encoded in the path
    w = random_walks(D.sparse_edges(spark, sf_dir), walk_length=4)
    return w.select(
        "walk_id",
        "start",
        F.concat_ws(
            "-", F.transform(F.col("walk"), lambda x: x.cast("string"))
        ).alias("path"),
    )


_EGO_SEEDS = [1, 2, 3]


def _q_ego_network(spark, sf_dir):
    return ego_network(D.sparse_edges(spark, sf_dir), seeds=_EGO_SEEDS, hops=2)


def _q_dedup_clusters(spark, sf_dir):
    return dedup_clusters(_docs_with_dups(spark, sf_dir))


def _q_clustering_coef(spark, sf_dir):
    return clustering_coefficient(D.sparse_edges(spark, sf_dir))


def _q_reciprocity(spark, sf_dir):
    return reciprocity(D.web_edges(spark, sf_dir))


def _q_host_edges(spark, sf_dir):
    return host_edges(D.url_edges(spark, sf_dir))


def _q_dedup_survivors(spark, sf_dir):
    docs = D.documents(spark, sf_dir).select("doc_id", "text", "n_chars")
    dups = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "n_chars"
    )
    return dd.dedup_survivors(docs.unionAll(dups), quality_col="n_chars")


def _q_semdedup(spark, sf_dir):
    # SemDeDup over the embeddings table: same k-means/nprobe config as
    # dedup_embedding_pairs so the twin reuses the trained-cell CTEs
    return dd.semdedup(
        D.embeddings(spark, sf_dir),
        threshold=0.35,
        num_centroids=8,
        nprobe=2,
    )


def _q_dsir_weights(spark, sf_dir):
    # DSIR importance weights: target domain = every 5th document (a
    # deterministic, engine-replayable slice of the same corpus)
    docs = D.documents(spark, sf_dir).select("doc_id", "text")
    return tx.dsir_weights(docs, docs.where(F.col("doc_id") % 5 == 0))


def _q_bloom_seen(spark, sf_dir):
    # crawl-frontier membership: bloom over crawled srcs, probe all dsts;
    # m sized so the sf0.01 fixture (997 seen keys) produces real false
    # positives alongside the guaranteed zero false negatives

    edges = D.web_edges(spark, sf_dir)
    seen = edges.select(F.col("src").alias("id"))
    frontier = edges.select(F.col("dst").alias("id"))
    filt = bl.bloom_build(seen, "id", m_bits=4096, num_hashes=3)
    probed = bl.bloom_probe(filt, frontier, "id", m_bits=4096, num_hashes=3)
    actually = seen.distinct().withColumn("actually_seen", F.lit(True))
    return probed.join(actually, "id", "left").select(
        "id",
        F.col("maybe_present").alias("maybe_seen"),
        F.coalesce("actually_seen", F.lit(False)).alias("actually_seen"),
    )


def _q_cms_heavy_hitters(spark, sf_dir):
    docs = D.documents(spark, sf_dir)
    vals = docs.select(F.explode(tx.tokens(F.col("text"))).alias("v"))
    grid = cm.cms_build(vals, "v", depth=3, width=256)
    exact = vals.groupBy("v").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "v").limit(20)
    est = cm.cms_estimate(grid, top, "v", depth=3, width=256)
    return top.join(est, "v").select(
        "v", "exact_cnt", F.col("est").alias("cms_est")
    )


def _q_winnow_pairs(spark, sf_dir):
    return winnow_pairs(D.documents(spark, sf_dir).select("doc_id", "text"))


def _q_landmark_dists(spark, sf_dir):
    # deterministic query-pair sample: src residues %100==0 crossed with
    # dst residues %100==1 (196 pairs; ~140 are landmark-boundable)

    edges = D.web_edges(spark, sf_dir)
    srcs = edges.where(F.col("src") % 100 == 0).select("src").distinct()
    dsts = edges.where(F.col("dst") % 100 == 1).select("dst").distinct()
    return landmark_distances(
        edges, srcs.crossJoin(dsts), num_landmarks=4, max_depth=6
    )


def _q_bpe_fertility(spark, sf_dir):
    return tx.bpe_ish_token_stats(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


def _q_textrank_keywords(spark, sf_dir):
    return textrank_keywords(
        D.documents(spark, sf_dir).select("doc_id", "text"), top_k=3
    )


def _q_anchor_summary(spark, sf_dir):
    return anchor_summary(anchor_texts(_synthetic_pages(spark, sf_dir)))


def _q_url_normalize(spark, sf_dir):
    return D.messy_urls(spark, sf_dir).select(
        "url", normalize_url(F.col("url")).alias("norm_url")
    )


def _q_kcore16(spark, sf_dir):
    return k_core(D.sparse_edges(spark, sf_dir), k=16)


def _q_rmat(spark, sf_dir):
    return rmat_edges(spark, n_edges=20000, scale=10)


def _q_coreness(spark, sf_dir):
    return coreness(D.web_edges(spark, sf_dir), rounds=25)


def _q_host_rank4(spark, sf_dir):
    return host_pagerank(D.url_edges(spark, sf_dir), num_iterations=4).select(
        "host", F.round("rank", 9).alias("rank")
    )


def _q_host_budget(spark, sf_dir):
    hr = host_pagerank(D.url_edges(spark, sf_dir), num_iterations=4).select(
        "host", F.round("rank", 9).alias("rank")
    )
    return host_crawl_budget(hr, total_budget=100000)


def _q_crawl_plan(spark, sf_dir):
    # end-to-end crawl planner: host rank -> budget -> schedule -> cut.
    # budget=500 over ~97 hosts (~5 urls/host) so the budget cut actually
    # discriminates on the fixture (100000 would keep every url)

    return crawl_plan(
        D.url_edges(spark, sf_dir),
        total_budget=500,
        num_iterations=4,
        per_host_per_round=2,
    )


def _q_crawl_plan_polite(spark, sf_dir):
    # the crawl planner with the robots politeness stage: per host h{g},
    # '/p{g}1'-prefixed paths are disallowed and must vanish from the
    # schedule BEFORE rank_in_host is assigned

    edges = D.url_edges(spark, sf_dir)
    hosts = (
        edges.select(
            F.regexp_extract("dst_url", rb._HOST_RE, 1).alias("host")
        )
        .where(F.col("host") != "")
        .distinct()
    )
    robots = hosts.select(
        "host",
        F.concat(
            F.lit("user-agent: *\ndisallow: /p"),
            F.regexp_extract("host", "^h([0-9]+)\\.test$", 1),
            F.lit("1"),
        ).alias("robots_txt"),
    )
    return crawl_plan(
        edges,
        total_budget=500,
        num_iterations=4,
        per_host_per_round=2,
        robots=rb.robots_rules(robots),
    )


def _q_scc_components(spark, sf_dir):
    return strongly_connected_components(D.funnel_edges(spark, sf_dir))


def _q_bowtie(spark, sf_dir):
    return bow_tie(D.funnel_edges(spark, sf_dir))


def _q_adamic_adar(spark, sf_dir):
    return adamic_adar_pairs(
        D.sparse_edges(spark, sf_dir), min_common=2, max_fanout=16
    ).select("a", "b", "common", F.round("aa", 6).alias("aa"))


def _q_repeated_ngrams(spark, sf_dir):
    return tx.repeated_ngram_stats(
        D.documents(spark, sf_dir).select("doc_id", "text")
    )


def _q_quality_filter(spark, sf_dir):
    return tx.quality_filter(D.documents(spark, sf_dir).select("doc_id", "text"))


_MIX_FRACTIONS = {"en": 0.5, "fr": 0.25, "zh": 0.1}  # de/es absent -> dropped


def _q_stratified_sample(spark, sf_dir):
    return stratified_sample(
        D.documents(spark, sf_dir).select("doc_id", "lang", "source"),
        "lang",
        _MIX_FRACTIONS,
        key_cols=["doc_id"],
        salt="mix1",
    )


def _q_rich_club(spark, sf_dir):
    return rich_club(D.web_edges(spark, sf_dir))


def _q_eigenvector4(spark, sf_dir):
    return eigenvector_fixed(
        D.web_edges(spark, sf_dir), num_iterations=4,
        graph=_web_graph(spark, sf_dir),
    )


def _q_mis(spark, sf_dir):
    return maximal_independent_set(D.web_edges(spark, sf_dir))


def _q_condensation_depth(spark, sf_dir):
    return condensation_depth(D.funnel_edges(spark, sf_dir))


def _contamination_corpus(spark, sf_dir):
    """corpus = near-dup fixture docs that are NOT the benchmark;
    benchmark = the planted originals (doc_id % 10 == 0 below the plant
    offset) — the plants at id+10M then read as ~fully contaminated."""
    docs = D.near_dup_documents(spark, sf_dir).select("doc_id", "text")
    is_bench = (F.col("doc_id") % D.NEAR_DUP_PLANT_MOD == 0) & (
        F.col("doc_id") < D.NEAR_DUP_ID_OFFSET
    )
    return docs.where(~is_bench), docs.where(is_bench)


def _q_contamination(spark, sf_dir):
    corpus, bench = _contamination_corpus(spark, sf_dir)
    return ngram_contamination(corpus, bench, n=8, threshold=0.5)


def _q_mixture_weights(spark, sf_dir):
    return mixture_weights(
        D.documents(spark, sf_dir), group_col="lang", budget=10_000
    )


def _q_pii_scan(spark, sf_dir):
    return pii_scan(D.dirty_documents(spark, sf_dir))


def _q_coloring(spark, sf_dir):
    return graph_coloring(D.ring_edges(spark, sf_dir))


def _q_zipf_fit(spark, sf_dir):
    return zipf_fit(D.documents(spark, sf_dir))


def _q_training_mix(spark, sf_dir):
    corpus, bench = _contamination_corpus(spark, sf_dir)
    lang = (
        F.when(F.col("doc_id") % 4 == 0, "en")
        .when(F.col("doc_id") % 4 == 1, "de")
        .when(F.col("doc_id") % 4 == 2, "fr")
        .otherwise("sl")
    )
    return training_mix(
        corpus.withColumn("lang", lang), bench, budget=120
    )


def _q_latest_capture(spark, sf_dir):
    latest = latest_capture(D.crawl_pages(spark, sf_dir))
    return latest.select(
        "url",
        F.unix_timestamp("warc_ts").alias("warc_epoch"),
        "lang",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


def _q_capture_changes(spark, sf_dir):
    return capture_change_stats(D.crawl_pages(spark, sf_dir))


def _q_length_quantiles(spark, sf_dir):
    return exact_quantiles(
        D.documents(spark, sf_dir).select("doc_id", "n_chars"),
        "n_chars",
        qs=(0.5, 0.9, 0.99),
        key_col="doc_id",
    )


def _q_attack_robustness(spark, sf_dir):
    return attack_robustness(D.block_edges(spark, sf_dir), ks=(0, 5, 25))


def _q_embedding_outliers(spark, sf_dir):
    return embedding_outliers(D.embeddings(spark, sf_dir), q=0.9)


def _q_boilerplate_lines(spark, sf_dir):
    return boilerplate_lines(D.paged_documents(spark, sf_dir), min_docs=3)


def _q_c4_clean(spark, sf_dir):
    return c4_clean(D.paged_documents(spark, sf_dir))


def _q_pack_spans(spark, sf_dir):
    return pack_sequences(
        D.documents(spark, sf_dir).select("doc_id", "text"), seq_len=512
    )


def _q_pack_summary(spark, sf_dir):
    return packing_summary(
        D.documents(spark, sf_dir).select("doc_id", "text"), seq_len=512
    )


def _q_dup_span_stats(spark, sf_dir):
    # ExactSubstr-style (Lee et al. 2022) duplicated-span stats on the
    # planted-quote fixture: quote docs read dup_fraction 1.0, their
    # originals 0.25 (first 16 of 64 tokens), everything else 0
    return dd.duplicated_span_stats(
        D.quote_documents(spark, sf_dir), k=8, min_count=2
    )


def _q_dup_span_clean(spark, sf_dir):
    # removal variant: ALL occurrences of a duplicated span go (the
    # ExactSubstr rule); byte-identical round-trip for untouched docs
    return dd.remove_duplicated_spans(
        D.quote_documents(spark, sf_dir), k=8, min_count=2
    )


def _q_overlap_pairs(spark, sf_dir):
    # bucket-join fallback on the wide-vocabulary fixture (per-token df ~ 2
    # so the df cap never trims); the candidate-driven path shares
    # _pair_intersections with dedup_token_jaccard's gate entry
    return dd.token_overlap_pairs(
        D.quote_documents(spark, sf_dir), threshold=0.9
    )


def _q_simrank(spark, sf_dir):
    return simrank(D.simrank_edges(spark, sf_dir), iterations=2)


def _q_corpus_diversity(spark, sf_dir):
    return corpus_diversity(D.documents(spark, sf_dir))


def _q_mirror_hosts(spark, sf_dir):
    return mirror_hosts(D.mirror_pages(spark, sf_dir), threshold=0.5)


def _q_readability(spark, sf_dir):
    # paged docs have real sentence punctuation; raw documents are
    # punctuation-free and all clamp to one sentence
    return readability(D.paged_documents(spark, sf_dir))


def _q_trap_hosts(spark, sf_dir):
    return crawler_trap_hosts(D.trap_pages(spark, sf_dir))


def _q_grouped_quantiles(spark, sf_dir):
    return grouped_quantiles(
        D.documents(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        "n_chars",
        "lang",
        qs=(0.25, 0.5, 0.9),
        key_col="doc_id",
    )


def _q_ngram_novelty(spark, sf_dir):
    return tx.ngram_novelty(
        D.documents(spark, sf_dir).select("doc_id", "text"), n=3
    )


def _warc_segment_col():
    # deterministic doc-id-derived segment (url = 'u<doc_id>') so the
    # DuckDB twin can reproduce segment membership; the production default
    # (xxhash64(url) % 64) stays the operator's own default
    return F.substring(F.col("url"), 2, 18).cast("long") % 16


def _q_warc_roundtrip(spark, sf_dir):
    return warc_roundtrip(
        D.crawl_pages(spark, sf_dir), segment_col=_warc_segment_col()
    ).select(
        "url",
        F.unix_timestamp("warc_ts").alias("warc_epoch"),
        "content_length",
        "payload_text",
    )


def _q_warc_stats(spark, sf_dir):
    return warc_segment_stats(
        D.crawl_pages(spark, sf_dir), segment_col=_warc_segment_col()
    )


def _q_sitemap_parse(spark, sf_dir):
    return parse_sitemaps(D.sitemap_pages(spark, sf_dir))


def _q_sitemap_recrawl(spark, sf_dir):
    return sitemap_recrawl_stats(
        parse_sitemaps(D.sitemap_pages(spark, sf_dir)), as_of="2024-01-15"
    )


_SEARCH_TERMS = ["window", "shuffle", "hash"]


def _q_search_rank(spark, sf_dir):
    ranks = pagerank_fixed(
        D.web_edges(spark, sf_dir), 4, graph=_web_graph(spark, sf_dir)
    )
    return search_with_authority(
        D.documents(spark, sf_dir).select("doc_id", "text"),
        ranks,
        _SEARCH_TERMS,
        doc_node=F.col("doc_id") % 1400,
        k_candidates=20,
        k=10,
    )


def _q_transitivity(spark, sf_dir):
    return global_transitivity(D.sparse_edges(spark, sf_dir))


def _q_frontier_plan(spark, sf_dir):
    return sitemap_frontier_plan(
        D.sitemap_pages(spark, sf_dir), urls_per_round=4, max_spam_score=2
    )


def _q_stupid_backoff(spark, sf_dir):
    """Held-out LM scoring: the model trains on even doc_ids, every doc
    is scored — odd docs exercise the backoff path for real."""
    docs = D.documents(spark, sf_dir).select("doc_id", "text")
    return tx.lm_stupid_backoff_stats(
        docs, docs.where(F.col("doc_id") % 2 == 0)
    )


def _q_random_failure(spark, sf_dir):
    return random_failure_robustness(
        D.block_edges(spark, sf_dir), fracs=(0.0, 0.3, 0.6)
    )


def _q_url_spam_features(spark, sf_dir):
    return url_spam_features(D.frontier_urls(spark, sf_dir))


def _q_rewired_edges(spark, sf_dir):
    return rewire_configuration(D.sparse_edges(spark, sf_dir))


def _q_motif_significance(spark, sf_dir):
    return motif_significance(D.sparse_edges(spark, sf_dir))


def _q_rank_churn(spark, sf_dir):
    """Yesterday-vs-today rank churn: 'yesterday' is 3 sweeps on the full
    web graph, 'today' is 4 sweeps on the graph with every (src+dst)%13==0
    edge gone (a deterministic crawl delta — some nodes vanish entirely,
    so the id-churn counters have real work)."""

    edges = D.web_edges(spark, sf_dir)
    old = pagerank_fixed(edges, 3, graph=_web_graph(spark, sf_dir))
    new_edges = edges.where((F.col("src") + F.col("dst")) % 13 != 0)
    new = pagerank_fixed(new_edges, 4)
    return rank_churn(old, new, k=10)


def _q_doc_bm25(spark, sf_dir):
    return doc_bm25_search(
        D.documents(spark, sf_dir).select("doc_id", "text"),
        ["window", "shuffle", "hash"],
        k=15,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- never driver-sampled in rounds 1-4 (the driver checks the
        # FIRST 50 entries; leading with these rotates fresh coverage
        # into CORRECTNESS_r05 — round-4 verdict task 3) ---
        "mm_decode_png": _q_png_decode,
        "text_perplexity_buckets": _q_perplexity_buckets,
        "emb_principal_component": _q_principal_component,
        "emb_pc_projection": _q_pc_projection,
        "e2e_corpus_filter_neardup": _q_corpus_pipeline_neardup,
        "text_vocab_hll": _q_vocab_hll,
        "text_quality_model": _q_quality_model,
        "text_bpe_merges": _q_bpe_merges,
        "text_bpe_tokens": _q_bpe_tokens,
        "text_vocab_by_lang_hll": _q_vocab_by_lang_hll,
        "lv_communities": _q_louvain,
        "g_matching": _q_matching,
        "g_coarsen_map": _q_coarsen_map,
        "g_coarsen_edges": _q_coarsen_edges,
        "knn_pq_top5": _q_knn_pq,
        "pq_codes": _q_pq_codes,
        "knn_ivfpq_top5": _q_knn_ivfpq,
        "s1_snap_roundtrip": _q_snap_roundtrip,
        "e2e_extract_rank_top10": _q_e2e_extract_rank,
        "mm_decode_ppm": _q_ppm_decode,
        "la_anf_reach": _q_anf_reach,
        "la_harmonic3": _q_harmonic,
        "la_cocitation_pairs": _q_cocitation,
        "la_katz4": _q_katz,
        "lp_neighborhood_jaccard": _q_neighborhood_jaccard,
        "g_assortativity": _q_assortativity,
        "g_reciprocity": _q_reciprocity,
        "g_node_reciprocity": _q_node_reciprocity,
        "g_avg_nn_degree": _q_avg_nn_degree,
        "la_coupling_pairs": _q_coupling,
        "smp_random_walks": _q_random_walks,
        "smp_ego_network": _q_ego_network,
        "dedup_clusters": _q_dedup_clusters,
        "tri_clustering_coef": _q_clustering_coef,
        "s4_host_edges": _q_host_edges,
        "smp_stratified_sample": _q_stratified_sample,
        "dedup_survivors": _q_dedup_survivors,
        "s4_anchor_summary": _q_anchor_summary,
        "text_url_normalize": _q_url_normalize,
        "g_kcore16": _q_kcore16,
        "g_coreness": _q_coreness,
        "s_rmat_edges": _q_rmat,
        "host_rank4": _q_host_rank4,
        "host_crawl_budget": _q_host_budget,
        "e2e_crawl_plan": _q_crawl_plan,
        "e2e_crawl_plan_polite": _q_crawl_plan_polite,
        "g_scc_components": _q_scc_components,
        "g_bowtie_parts": _q_bowtie,
        "lp_adamic_adar": _q_adamic_adar,
        "text_repeated_ngrams": _q_repeated_ngrams,
        "text_quality_filter": _q_quality_filter,
        "tr_spam_mass": _q_spam_mass,
        "g_rich_club": _q_rich_club,
        "la_eigenvector4": _q_eigenvector4,
        "g_mis": _q_mis,
        "g_condensation_depth": _q_condensation_depth,
        "text_contamination": _q_contamination,
        "smp_mixture_weights": _q_mixture_weights,
        "pii_scan_docs": _q_pii_scan,
        "g_coloring": _q_coloring,
        "text_zipf_fit": _q_zipf_fit,
        "e2e_training_mix": _q_training_mix,
        "s4_latest_capture": _q_latest_capture,
        "s4_capture_changes": _q_capture_changes,
        "text_length_quantiles": _q_length_quantiles,
        "g_attack_robustness": _q_attack_robustness,
        "emb_outlier_filter": _q_embedding_outliers,
        "text_boilerplate_lines": _q_boilerplate_lines,
        "text_c4_clean": _q_c4_clean,
        "pack_doc_spans": _q_pack_spans,
        "pack_summary": _q_pack_summary,
        "dedup_overlap_pairs": _q_overlap_pairs,
        "dedup_span_stats": _q_dup_span_stats,
        "dedup_span_clean": _q_dup_span_clean,
        "lp_simrank2": _q_simrank,
        "smp_corpus_diversity": _q_corpus_diversity,
        "s4_mirror_hosts": _q_mirror_hosts,
        "text_readability": _q_readability,
        "s4_crawler_traps": _q_trap_hosts,
        "text_lang_quantiles": _q_grouped_quantiles,
        "text_ngram_novelty": _q_ngram_novelty,
        "s_warc_roundtrip": _q_warc_roundtrip,
        "s_warc_stats": _q_warc_stats,
        "s_sitemap_parse": _q_sitemap_parse,
        "s_sitemap_recrawl": _q_sitemap_recrawl,
        "text_doc_bm25": _q_doc_bm25,
        "r_rank_churn": _q_rank_churn,
        "g_rewired_edges": _q_rewired_edges,
        "g_motif_significance": _q_motif_significance,
        "url_spam_features": _q_url_spam_features,
        "e2e_search_rank": _q_search_rank,
        "g_random_failure": _q_random_failure,
        "text_lm_stupid_backoff": _q_stupid_backoff,
        "e2e_frontier_plan": _q_frontier_plan,
        "g_transitivity": _q_transitivity,
        # --- driver-verified green in at least one of rounds 1-4 ---
        "g1_node_ids": _q_node_ids,
        "g2_out_degrees": _q_out_degrees,
        "g4_sinks": _q_sinks,
        "s3_tripled_edges": _q_tripled,
        "p_pagerank_fixed4": _q_pagerank_fixed4,
        "p_opic4": _q_opic4,
        "r1_total_rank": _q_pagerank_total,
        "r3_pagerank_top10": _q_pagerank_top10,
        "p_pagerank_converged_top20": _q_pagerank_converged_top20,
        "hits4": _q_hits4,
        "salsa4": _q_salsa4,
        "ppr_fixed4": _q_ppr_fixed4,
        "r_degree_dist": _q_degree_dist,
        "cc_components": _q_components,
        "cc_star_components": _q_components_star,
        "cc_size_hist": _q_cc_size_hist,
        "cc_summary": _q_cc_summary,
        "g_modularity_lp": _q_modularity_lp,
        "g_bfs_dist4": _q_bfs_distances,
        "g_bfs_hopplot": _q_bfs_hopplot,
        "g_eff_diameter": _q_eff_diameter,
        "g_closeness": _q_closeness,
        "g_sssp_weighted4": _q_sssp_weighted,
        "g_betweenness": _q_betweenness,
        "g_ktruss3": _q_ktruss3,
        "g_truss_decomp": _q_truss_decomp,
        "g_wl_colors": _q_wl_colors,
        "g_wl_histogram": _q_wl_histogram,
        "ppr_batch3": _q_ppr_batch,
        "g_edge_report": _q_edge_report,
        "smp_top_docs_per_lang": _q_top_docs_per_lang,
        "events_trending": _q_events_trending,
        "s4_anchor_postings": _q_anchor_postings,
        "s4_anchor_search": _q_anchor_search,
        "s4_anchor_bm25": _q_anchor_bm25,
        "walk_skipgrams": _q_skipgram_pairs,
        "dedup_leakage_safe_split": _q_leakage_safe_split,
        "url_robots_rules": _q_robots_rules,
        "url_crawl_allowed": _q_crawl_allowed,
        "url_redirects_resolved": _q_resolve_redirects,
        "url_crawl_schedule": _q_crawl_schedule,
        "dedup_chunk_stats": _q_chunk_dup_stats,
        "dedup_semdedup": _q_semdedup,
        "text_dsir_weights": _q_dsir_weights,
        "url_bloom_seen": _q_bloom_seen,
        "text_cms_heavy_hitters": _q_cms_heavy_hitters,
        "text_textrank_keywords": _q_textrank_keywords,
        "text_bpe_fertility": _q_bpe_fertility,
        "dedup_winnow_pairs": _q_winnow_pairs,
        "g_landmark_dists": _q_landmark_dists,
        "smp_weighted_sample": _q_weighted_sample,
        "emb_quantize_int8": _q_quantize_embeddings,
        "emb_cluster_stats": _q_cluster_stats,
        "text_lm_surprisal": _q_lm_surprisal,
        "text_lm_bigram_surprisal": _q_lm_bigram_surprisal,
        "text_tfidf_top5": _q_tfidf_top5,
        "e2e_corpus_filter": _q_corpus_pipeline,
        "text_pmi_bigrams": _q_pmi_bigrams,
        "text_vocab_fm": _q_vocab_fm,
        "smp_corpus_splits": _q_corpus_splits,
        "text_vocab_by_lang_fm": _q_vocab_by_lang_fm,
        "text_vocab_coverage": _q_vocab_coverage,
        "lp_labels": _q_labelprop,
        "tri_total": _q_triangles,
        "tri_per_node": _q_triangles_per_node,
        "r4_order_agreement": _q_order_agreement,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_sigs": _q_minhash_sigs,
        "dedup_minhash_pairs": _q_minhash_pairs,
        "dedup_token_jaccard": _q_token_jaccard,
        "dedup_simhash": _q_simhash,
        "dedup_simhash_pairs": _q_simhash_pairs,
        "dedup_embedding_pairs": _q_embedding_neardup,
        "knn_top5": _q_knn,
        "knn_lsh_top5": _q_knn_lsh,
        "knn_ivf_top5": _q_knn_ivf,
        "text_token_stats": _q_token_stats,
        "text_lang_id": _q_lang_id,
        "text_fingerprint": _q_fingerprint,
        "s4_extract_text": _q_extract_text,
        "s4_extract_edges": _q_extract_edges,
        "events_5min_agg": _q_events_agg,
        "events_sessions": _q_events_sessions,
        "events_props_json": _q_events_props,
        "mm_decode_image": _q_multimodal_decode,
        "mm_frame_sample": _q_frame_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_WEB = D.WEB_EDGES_SQL
_MIS_ROUNDS = 5  # measured
_COLOR_ROUNDS = 10  # measured JP fixpoint on the sf0.01 ring fixture fixpoint, re-checked by tests/test_mis.py
_BLOCK = D.BLOCK_EDGES_SQL
_SPARSE = D.SPARSE_EDGES_SQL

_EN = ", ".join(f"'{w}'" for w in tx.EN_STOPWORDS)
_SL = ", ".join(f"'{w}'" for w in tx.SL_STOPWORDS)

from ps_projekt_pagerank_spark.oracle.twins import (  # noqa: F401
    _DOCS_DUPS,
    _DOCS_DUPS_Q,
    _HOST_MULTISET,
    _anf_sql,
    _bowtie_sql,
    _cocite_sql,
    _dedup_clusters_sql,
    _dedup_survivors_sql,
    _ego_sql,
    _harmonic_sql,
    _ivf_assign_ctes,
    _kcore_sql,
    _kmeans_cents_ctes,
    _knn_lsh_sql,
    _label_prop_sql,
    _minhash_sigs_sql,
    _pagerank_fixed_sql,
    _pagerank_frozen_sql,
    _pq_ctes,
    _ppr_fixed_sql,
    _scc_sql,
    _simhash_hex_sql,
    _simhash_pairs_sql,
    _skipgrams_sql,
    _toks_sql,
    _walks_sql,
)

# hoisted from function bodies (round-4 verdict task 8): every
# gate query/twin import lives here once instead of per-def
from ps_projekt_pagerank_spark.functions import (
    bloom as bl,
    cms as cm,
    robots as rb,
)
from ps_projekt_pagerank_spark.functions.bloom import bloom_seen_sql
from ps_projekt_pagerank_spark.functions.bpe import (
    bpe_encode,
    bpe_encode_learned_sql,
    bpe_learn_merges,
    bpe_learn_merges_sql,
)
from ps_projekt_pagerank_spark.functions.cms import cms_heavy_hitters_sql
from ps_projekt_pagerank_spark.functions.contamination import (
    contamination_sql,
    ngram_contamination,
)
from ps_projekt_pagerank_spark.functions.diversity import (
    corpus_diversity,
    corpus_diversity_sql,
)
from ps_projekt_pagerank_spark.functions.embeddings import (
    cluster_stats,
    cluster_stats_sql,
    embedding_outliers,
    embedding_outliers_sql,
    pc_projection,
    pc_projection_sql,
    principal_component,
    principal_component_sql,
    quantize_embeddings,
    quantize_embeddings_sql,
)
from ps_projekt_pagerank_spark.functions.lines import (
    boilerplate_lines,
    boilerplate_lines_sql,
    c4_clean,
    c4_clean_sql,
)
from ps_projekt_pagerank_spark.functions.pii import pii_scan, pii_scan_sql
from ps_projekt_pagerank_spark.functions.quality_model import (
    hashed_linear_score,
    hashed_linear_score_sql,
)
from ps_projekt_pagerank_spark.functions.readability import (
    readability,
    readability_sql,
)
from ps_projekt_pagerank_spark.functions.robots import (
    crawl_allowed_sql,
    robots_rules_sql,
)
from ps_projekt_pagerank_spark.functions.search import (
    doc_bm25_search,
    doc_bm25_sql,
)
from ps_projekt_pagerank_spark.functions.sitemaps import (
    parse_sitemaps,
    sitemap_recrawl_stats,
)
from ps_projekt_pagerank_spark.functions.sketches import (
    fm_count_distinct,
    fm_count_distinct_by_key,
    fm_count_distinct_by_key_sql,
    fm_count_distinct_sql,
    hll_count_distinct,
    hll_count_distinct_by_key,
    hll_count_distinct_by_key_sql,
    hll_count_distinct_sql,
)
from ps_projekt_pagerank_spark.functions.urls import (
    normalize_url,
    normalize_url_sql,
    resolve_redirects,
    resolve_redirects_sql,
    url_spam_features,
    url_spam_features_sql,
)
from ps_projekt_pagerank_spark.functions.zipf import zipf_fit, zipf_fit_sql
from ps_projekt_pagerank_spark.operators.anf import harmonic_centrality
from ps_projekt_pagerank_spark.operators.betweenness import (
    betweenness_sampled,
    betweenness_sampled_sql,
)
from ps_projekt_pagerank_spark.operators.bfs import (
    bfs_distances,
    bfs_distances_sql,
    closeness_sampled,
    closeness_sampled_sql,
    distance_histogram,
    effective_diameter_sampled,
    effective_diameter_sql,
    sssp_weighted,
    sssp_weighted_sql,
)
from ps_projekt_pagerank_spark.operators.coarsen import (
    coarsen_edges,
    coarsen_edges_sql,
    coarsen_map,
    coarsen_map_sql,
)
from ps_projekt_pagerank_spark.operators.cocitation import neighborhood_jaccard
from ps_projekt_pagerank_spark.operators.coloring import (
    coloring_sql,
    graph_coloring,
)
from ps_projekt_pagerank_spark.operators.components import (
    component_size_histogram,
    component_summary,
    connected_components_star,
)
from ps_projekt_pagerank_spark.operators.dedup import chunk_dup_stats_sql
from ps_projekt_pagerank_spark.operators.eigenvector import (
    eigenvector_fixed,
    eigenvector_sql,
)
from ps_projekt_pagerank_spark.operators.graph import (
    build_graph,
    degree_assortativity,
    degree_assortativity_sql,
    edge_table_report,
    edge_table_report_sql,
)
from ps_projekt_pagerank_spark.operators.hits import hits, hits_sql
from ps_projekt_pagerank_spark.operators.hostgraph import (
    crawl_plan,
    crawl_schedule,
    crawler_trap_hosts,
    crawler_trap_hosts_sql,
    host_crawl_budget,
    host_crawl_budget_sql,
    host_pagerank,
    mirror_hosts,
    mirror_hosts_sql,
)
from ps_projekt_pagerank_spark.operators.katz import katz_fixed, katz_sql
from ps_projekt_pagerank_spark.operators.kcore import (
    coreness,
    coreness_sql,
    k_core,
)
from ps_projekt_pagerank_spark.operators.landmarks import (
    landmark_distances,
    landmark_distances_sql,
)
from ps_projekt_pagerank_spark.operators.linkpredict import (
    adamic_adar_pairs,
    adamic_adar_sql,
)
from ps_projekt_pagerank_spark.operators.louvain import (
    louvain_moves,
    louvain_moves_sql,
)
from ps_projekt_pagerank_spark.operators.matching import (
    maximal_matching,
    maximal_matching_sql,
)
from ps_projekt_pagerank_spark.operators.mis import (
    maximal_independent_set,
    mis_sql,
)
from ps_projekt_pagerank_spark.operators.modularity import (
    modularity,
    modularity_sql,
)
from ps_projekt_pagerank_spark.operators.opic import opic, opic_sql
from ps_projekt_pagerank_spark.operators.packing import (
    pack_sequences,
    pack_sequences_sql,
    packing_summary,
    packing_summary_sql,
)
from ps_projekt_pagerank_spark.operators.pagerank import (
    pagerank_personalized_batch,
    pagerank_personalized_batch_sql,
    pagerank_personalized_fixed,
)
from ps_projekt_pagerank_spark.operators.quantiles import (
    exact_quantiles,
    exact_quantiles_sql,
    grouped_quantiles,
    grouped_quantiles_sql,
)
from ps_projekt_pagerank_spark.operators.rewire import (
    motif_significance,
    rewire_configuration,
    rewire_configuration_sql,
)
from ps_projekt_pagerank_spark.operators.richclub import (
    rich_club,
    rich_club_sql,
)
from ps_projekt_pagerank_spark.operators.robustness import (
    attack_robustness,
    attack_robustness_sql,
    random_failure_robustness,
    random_failure_robustness_sql,
)
from ps_projekt_pagerank_spark.operators.salsa import salsa, salsa_sql
from ps_projekt_pagerank_spark.operators.sampling import (
    corpus_splits,
    mixture_weights,
    mixture_weights_sql,
    skipgram_pairs,
    top_k_per_group,
    weighted_bernoulli_sample,
)
from ps_projekt_pagerank_spark.operators.scc import (
    bow_tie,
    condensation_depth,
    condensation_depth_sql,
    strongly_connected_components,
)
from ps_projekt_pagerank_spark.operators.simrank import simrank, simrank_sql
from ps_projekt_pagerank_spark.operators.structure import (
    avg_neighbor_degree,
    avg_neighbor_degree_sql,
    node_reciprocity,
    node_reciprocity_sql,
)
from ps_projekt_pagerank_spark.operators.textrank import (
    textrank_keywords,
    textrank_keywords_sql,
)
from ps_projekt_pagerank_spark.operators.triangles import (
    global_transitivity,
    k_truss,
    k_truss_sql,
    triangles_per_node,
    truss_decomposition,
    truss_decomposition_sql,
)
from ps_projekt_pagerank_spark.operators.trustrank import (
    spam_mass,
    spam_mass_sql,
)
from ps_projekt_pagerank_spark.operators.winnow import (
    winnow_pairs,
    winnow_pairs_sql,
)
from ps_projekt_pagerank_spark.operators.wl import (
    wl_color_histogram,
    wl_colors,
    wl_colors_sql,
)
from ps_projekt_pagerank_spark.plans.corpus import (
    corpus_pipeline,
    corpus_pipeline_sql,
)
from ps_projekt_pagerank_spark.plans.frontier import (
    sitemap_frontier_plan,
    sitemap_frontier_plan_sql,
)
from ps_projekt_pagerank_spark.plans.positions import global_positions
from ps_projekt_pagerank_spark.plans.reporting import (
    degree_distribution,
    rank_churn,
)
from ps_projekt_pagerank_spark.plans.serving import (
    search_with_authority,
    search_with_authority_sql,
)
from ps_projekt_pagerank_spark.plans.trainmix import (
    training_mix,
    training_mix_sql,
)
from ps_projekt_pagerank_spark.sources.extraction import (
    anchor_bm25,
    anchor_postings,
    anchor_search,
    anchor_summary,
    anchor_texts,
    capture_change_stats,
    extract_text,
    latest_capture,
    pages_to_graph,
)
from ps_projekt_pagerank_spark.sources.rmat import rmat_edges, rmat_edges_sql
from ps_projekt_pagerank_spark.sources.snap import read_snap_edges
from ps_projekt_pagerank_spark.sources.warc import (
    warc_roundtrip,
    warc_segment_stats,
)
from ps_projekt_pagerank_spark.streaming.events import (
    sessionized,
    trending_event_types,
)


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["g1_node_ids"] = (
        f"WITH e AS ({_WEB}) SELECT DISTINCT id FROM "
        f"(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)"
    )
    sqls["g2_out_degrees"] = (
        f"WITH e AS ({_WEB}) SELECT src AS id, count(*) AS outdeg "
        f"FROM e GROUP BY src"
    )
    sqls["g4_sinks"] = (
        f"WITH e AS ({_WEB}) SELECT DISTINCT dst AS id FROM e "
        f"WHERE dst NOT IN (SELECT src FROM e)"
    )
    sqls["s3_tripled_edges"] = (
        f"WITH e AS ({_WEB}), m AS (SELECT max(greatest(src, dst)) AS m FROM e) "
        f"SELECT src, dst FROM e "
        f"UNION ALL SELECT m.m + dst + 1 AS src, src AS dst FROM e, m "
        f"UNION ALL SELECT m.m + src + 1 AS src, m.m + dst AS dst FROM e, m"
    )
    sqls["p_pagerank_fixed4"] = _pagerank_fixed_sql(4)

    sqls["p_opic4"] = (
        "SELECT id, round(cash, 9) AS cash, round(history, 9) AS history, "
        f"round(importance, 9) AS importance FROM ({opic_sql(_WEB, 4)})"
    )
    # 5 sweeps to convergence on the sf0.01 gate graph + 3 identity-sweep
    # margin (frozen state makes extra sweeps no-ops)
    sqls["p_pagerank_converged_top20"] = _pagerank_frozen_sql(8)
    sqls["r1_total_rank"] = (
        f"SELECT round(sum(rank), 6) AS total_rank FROM "
        f"({_pagerank_fixed_sql(4)})"
    )
    sqls["r3_pagerank_top10"] = (
        f"SELECT id, rank FROM ({_pagerank_fixed_sql(4)}) "
        f"ORDER BY rank DESC, id ASC LIMIT 10"
    )

    sqls["hits4"] = hits_sql(_WEB, 4)

    sqls["salsa4"] = salsa_sql(_WEB, 4)
    sqls["ppr_fixed4"] = _ppr_fixed_sql(_PPR_SEEDS, 4)

    sqls["tr_spam_mass"] = spam_mass_sql(
        _pagerank_fixed_sql(4), _ppr_fixed_sql(_PPR_SEEDS, 4)
    )
    sqls["r_degree_dist"] = (
        f"WITH e AS ({_WEB}), "
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e "
        "UNION ALL SELECT dst AS id FROM e)), "
        "deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY src) "
        "SELECT outdeg, count(*) AS n_nodes FROM (SELECT "
        "coalesce(deg.outdeg, 0) AS outdeg FROM nodes "
        "LEFT JOIN deg ON nodes.id = deg.id) GROUP BY outdeg"
    )
    sqls["cc_components"] = (
        f"WITH RECURSIVE e AS ({_BLOCK}), "
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e "
        "UNION ALL SELECT dst AS id FROM e)), "
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst), "
        "sym(a, b) AS (SELECT a, b FROM und UNION SELECT b, a FROM und), "
        "reach(a, b) AS (SELECT a, b FROM sym "
        "UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a) "
        "SELECT n.id, least(n.id, coalesce(min(r.b), n.id)) AS component "
        "FROM nodes n LEFT JOIN reach r ON r.a = n.id GROUP BY n.id"
    )
    sqls["cc_star_components"] = sqls["cc_components"]
    sqls["cc_size_hist"] = (
        f"WITH cc AS ({sqls['cc_components']}) "
        "SELECT size, count(*) AS n_components FROM "
        "(SELECT component, count(*) AS size FROM cc GROUP BY component) "
        "GROUP BY size"
    )
    sqls["cc_summary"] = (
        f"WITH cc AS ({sqls['cc_components']}), "
        "sz AS (SELECT component, count(*) AS size FROM cc GROUP BY component) "
        "SELECT CAST(sum(size) AS BIGINT) AS n_nodes, "
        "count(*) AS n_components, max(size) AS giant_size, "
        "CAST(max(size) AS DOUBLE) / CAST(sum(size) AS DOUBLE) "
        "AS giant_fraction FROM sz"
    )

    sqls["g_modularity_lp"] = modularity_sql(_BLOCK, _label_prop_sql(5))

    sqls["g_bfs_dist4"] = bfs_distances_sql(_SPARSE, _BFS_SEEDS, 4)
    sqls["g_bfs_hopplot"] = (
        f"WITH d AS ({bfs_distances_sql(_SPARSE, _BFS_SEEDS, 4)}) "
        "SELECT dist, count(*) AS n_nodes FROM d GROUP BY dist"
    )

    sqls["g_eff_diameter"] = effective_diameter_sql(
        _SPARSE, _DIAM_SEEDS, 5
    )

    sqls["g_closeness"] = closeness_sampled_sql(_SPARSE, _DIAM_SEEDS, 5)

    sqls["g_sssp_weighted4"] = sssp_weighted_sql(
        "SELECT l_orderkey % 4999 AS src, l_partkey % 4999 AS dst, "
        "(l_suppkey % 7) + 1 AS w FROM lineitem",
        _BFS_SEEDS,
        4,
    )

    sqls["g_betweenness"] = betweenness_sampled_sql(
        _SPARSE, _DIAM_SEEDS, 4
    )

    # rounds=3: the gate graph's peel fixpoint is after round 1 (measured
    # in DuckDB: 12162 edges at rounds 1 and 2); extra rounds are identity
    sqls["g_ktruss3"] = k_truss_sql(_SPARSE, 3, rounds=3)

    sqls["g_truss_decomp"] = truss_decomposition_sql(_SPARSE, rounds=5)

    sqls["g_wl_colors"] = wl_colors_sql(_SPARSE, rounds=2)
    sqls["g_wl_histogram"] = (
        f"WITH w AS ({wl_colors_sql(_SPARSE, rounds=2)}) "
        "SELECT wl_color, count(*) AS n_nodes FROM w GROUP BY wl_color"
    )

    sqls["ppr_batch3"] = pagerank_personalized_batch_sql(
        _WEB, _PPR_BATCH_SEEDS, 3
    )

    sqls["g_edge_report"] = edge_table_report_sql(_WEB)
    sqls["events_trending"] = (
        "WITH c AS (SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) "
        "* 3600 AS window_start, event_type, count(*) AS n_events "
        "FROM events GROUP BY 1, 2) "
        "SELECT window_start, event_type, n_events, rank_in_group FROM ("
        "SELECT *, row_number() OVER (PARTITION BY window_start "
        "ORDER BY n_events DESC, event_type ASC) AS rank_in_group FROM c) "
        "WHERE rank_in_group <= 3"
    )
    sqls["smp_top_docs_per_lang"] = (
        "SELECT doc_id, lang, n_chars, rank_in_group FROM ("
        "SELECT doc_id, lang, n_chars, row_number() OVER ("
        "PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) "
        "AS rank_in_group FROM documents) WHERE rank_in_group <= 3"
    )

    sqls["dedup_chunk_stats"] = chunk_dup_stats_sql(
        "SELECT doc_id, text FROM documents", 16
    )
    sqls["smp_weighted_sample"] = (
        "WITH d AS (SELECT doc_id, least(1.0, CAST(n_chars AS DOUBLE) / "
        "500.0) AS keep_p FROM documents) "
        "SELECT doc_id, keep_p FROM d WHERE "
        "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix1'), "
        "1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 < keep_p"
    )

    sqls["emb_quantize_int8"] = quantize_embeddings_sql(
        "SELECT vec_id, embedding FROM embeddings"
    )

    sqls["emb_cluster_stats"] = cluster_stats_sql(
        "SELECT label, embedding FROM embeddings"
    )
    sqls["text_lm_surprisal"] = tx.lm_surprisal_sql(
        "SELECT doc_id, text FROM documents"
    )
    sqls["text_lm_bigram_surprisal"] = tx.lm_bigram_surprisal_sql(
        "SELECT doc_id, text FROM documents"
    )
    sqls["text_perplexity_buckets"] = tx.perplexity_buckets_sql(
        "SELECT doc_id, text FROM documents"
    )

    _ESQL = "SELECT vec_id, embedding FROM embeddings"
    sqls["emb_principal_component"] = principal_component_sql(_ESQL, 3)
    sqls["emb_pc_projection"] = pc_projection_sql(_ESQL, 3)
    sqls["text_tfidf_top5"] = tx.tfidf_top_terms_sql(
        "SELECT doc_id, text FROM documents", 5
    )

    sqls["smp_corpus_splits"] = (
        "WITH u AS (SELECT doc_id, "
        "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
        "'#split1'), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u "
        "FROM documents) "
        "SELECT doc_id, CASE WHEN u < 0.5 THEN 'train' "
        "WHEN u < 0.75 THEN 'val' ELSE 'test' END AS split FROM u"
    )
    sqls["text_pmi_bigrams"] = tx.pmi_collocations_sql(
        "SELECT doc_id, text FROM documents", min_count=3, min_pmi_bits=1
    )

    sqls["text_vocab_fm"] = fm_count_distinct_sql(
        "SELECT v FROM (SELECT unnest(string_split(lower(text), ' ')) AS v "
        "FROM documents) WHERE v <> ''",
    )


    sqls["text_quality_model"] = hashed_linear_score_sql(
        "SELECT doc_id, text FROM documents"
    )


    sqls["text_bpe_merges"] = bpe_learn_merges_sql(
        "SELECT doc_id, text FROM documents", N_BPE_MERGES
    )
    sqls["text_bpe_tokens"] = bpe_encode_learned_sql(
        "SELECT doc_id, text FROM documents", N_BPE_MERGES
    )
    sqls["text_vocab_hll"] = hll_count_distinct_sql(
        "SELECT v FROM (SELECT unnest(string_split(lower(text), ' ')) AS v "
        "FROM documents) WHERE v <> ''",
    )
    sqls["text_vocab_by_lang_hll"] = hll_count_distinct_by_key_sql(
        "SELECT key, v FROM (SELECT lang AS key, "
        "unnest(string_split(lower(text), ' ')) AS v FROM documents) "
        "WHERE v <> ''",
    )
    sqls["text_vocab_coverage"] = tx.vocab_coverage_sql(
        "SELECT doc_id, text FROM documents", 100
    )

    sqls["text_vocab_by_lang_fm"] = fm_count_distinct_by_key_sql(
        "SELECT key, v FROM (SELECT lang AS key, "
        "unnest(string_split(lower(text), ' ')) AS v FROM documents) "
        "WHERE v <> ''",
    )
    sqls["e2e_corpus_filter"] = corpus_pipeline_sql(
        _DOCS_DUPS_Q,
        quality_sql_of=lambda d: (
            "SELECT doc_id, n_tokens, "
            "(n_tokens >= 10 AND n_tokens <= 100000 AND "
            "dup_ratio_2gr <= 0.6 AND dup_ratio_3gr <= 0.4) AS keep "
            f"FROM ({tx.repeated_ngram_sql(d)})"
        ),
        chunk_sql_of=lambda d: chunk_dup_stats_sql(d, 16),
    )
    sqls["e2e_corpus_filter_neardup"] = corpus_pipeline_sql(
        D.NEAR_DUP_DOCS_SQL,
        quality_sql_of=lambda d: (
            "SELECT doc_id, n_tokens, "
            "(n_tokens >= 10 AND n_tokens <= 100000 AND "
            "dup_ratio_2gr <= 0.6 AND dup_ratio_3gr <= 0.4) AS keep "
            f"FROM ({tx.repeated_ngram_sql(d)})"
        ),
        chunk_sql_of=lambda d: chunk_dup_stats_sql(d, 16),
        keep_p_scale=600.0,
        salt="corpusnd",
        near_dup_sql_of=_dedup_survivors_sql,
    )
    sqls["tri_total"] = (
        f"WITH e AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({_SPARSE}) WHERE src <> dst) "
        f"SELECT count(*) AS triangles FROM e e1 "
        f"JOIN e e2 ON e1.b = e2.a "
        f"JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    sqls["tri_per_node"] = (
        f"WITH e AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({_SPARSE}) WHERE src <> dst), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 "
        "JOIN e e2 ON e1.b = e2.a "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        f"nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM ({_SPARSE}) "
        f"UNION ALL SELECT dst AS id FROM ({_SPARSE}))), "
        "cnt AS (SELECT id, count(*) AS c FROM (SELECT x AS id FROM tri "
        "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY id) "
        "SELECT n.id, coalesce(cnt.c, 0) AS triangles FROM nodes n "
        "LEFT JOIN cnt ON cnt.id = n.id"
    )
    sqls["r4_order_agreement"] = (
        f"WITH ra AS ({_pagerank_fixed_sql(3)}), rb AS ({_pagerank_fixed_sql(4)}), "
        "pa AS (SELECT id AS id_a, row_number() OVER "
        "(ORDER BY round(rank, 9) DESC, id ASC) AS pos FROM ra), "
        "pb AS (SELECT id AS id_b, row_number() OVER "
        "(ORDER BY round(rank, 9) DESC, id ASC) AS pos FROM rb) "
        "SELECT round(avg(CASE WHEN id_a = id_b THEN 1.0 ELSE 0.0 END), 6) "
        "AS agreement FROM pa JOIN pb ON pa.pos = pb.pos"
    )
    sqls["dedup_exact"] = (
        f"SELECT md5(text) AS text_hash, count(*) AS n_docs, "
        f"min(doc_id) AS keep_id FROM ({_DOCS_DUPS}) GROUP BY md5(text)"
    )
    sqls["dedup_minhash_sigs"] = _minhash_sigs_sql("SELECT doc_id, text FROM documents")
    sqls["dedup_minhash_pairs"] = (
        f"WITH sigs AS ({_minhash_sigs_sql(_DOCS_DUPS)}) "
        f"SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        f"FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND "
        f"((a.s0 = b.s0 AND a.s1 = b.s1) OR (a.s2 = b.s2 AND a.s3 = b.s3))"
    )
    # candidate-driven twin: same minhash band predicate as the Spark gate
    # query (num_hashes=4, rows_per_band=2), intersections only per
    # candidate pair — mirrors dd.token_jaccard_pairs(candidates=...)
    sqls["dedup_token_jaccard"] = (
        f"WITH toks AS ({_toks_sql('SELECT doc_id, text FROM documents WHERE doc_id < 120')}), "
        "sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id), "
        f"sigs AS ({_minhash_sigs_sql('SELECT doc_id, text FROM documents WHERE doc_id < 120')}), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND "
        "((a.s0 = b.s0 AND a.s1 = b.s1) OR (a.s2 = b.s2 AND a.s3 = b.s3))), "
        "inter AS (SELECT c.id_a, c.id_b, count(*) AS i FROM cand c "
        "JOIN toks ta ON ta.doc_id = c.id_a "
        "JOIN toks tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok "
        "GROUP BY c.id_a, c.id_b) "
        "SELECT id_a, id_b, jaccard FROM ("
        "SELECT id_a, id_b, round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) "
        "AS jaccard FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b) "
        "WHERE jaccard >= 0.5"
    )
    sqls["dedup_simhash"] = _simhash_hex_sql(
        "SELECT doc_id, text FROM documents"
    )
    sqls["dedup_simhash_pairs"] = _simhash_pairs_sql(_DOCS_DUPS, 3)
    sqls["knn_lsh_top5"] = _knn_lsh_sql(4, 64, 5)
    # IVF-bucketed twin (k-means cells, nprobe 2) — replays
    # dd.embedding_neardup_pairs' candidate generation exactly; never
    # all-pairs (the Spark plan has no cartesian join either)
    km_ctes, km_fin = _kmeans_cents_ctes(8, 2)
    sqls["dedup_embedding_pairs"] = (
        "WITH "
        + ", ".join(
            km_ctes
            + _ivf_assign_ctes(km_fin, 2)
            + [
                "cand AS (SELECT DISTINCT a.nid AS id_a, b.nid AS id_b "
                "FROM vcell a JOIN vcell b ON a.cell = b.cell "
                "AND a.nid < b.nid)",
                "pc AS (SELECT c.id_a, c.id_b, "
                "CAST(unnest(x.embedding) AS DOUBLE) AS x, "
                "CAST(unnest(y.embedding) AS DOUBLE) AS y FROM cand c "
                "JOIN embeddings x ON x.vec_id = c.id_a "
                "JOIN embeddings y ON y.vec_id = c.id_b)",
            ]
        )
        + " SELECT id_a, id_b FROM pc GROUP BY id_a, id_b "
        "HAVING sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) > 0.35"
    )
    sqls["knn_top5"] = (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
        "WHERE vec_id < 3), "
        "pr AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.qv, "
        "c.embedding AS cv FROM q JOIN embeddings c ON c.vec_id <> q.query_id), "
        "comps AS (SELECT query_id, neighbor_id, CAST(unnest(qv) AS DOUBLE) AS x, "
        "CAST(unnest(cv) AS DOUBLE) AS y FROM pr), "
        "scored AS (SELECT query_id, neighbor_id, "
        "round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS score "
        "FROM comps GROUP BY query_id, neighbor_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS knn_rank "
        "FROM scored) "
        "SELECT query_id, neighbor_id, knn_rank FROM ranked WHERE knn_rank <= 5"
    )
    # trained-k-means twin: candidate vectors live in their single nearest
    # cell (vcell rn=1), queries probe their 2 nearest cells
    ivf_ctes, ivf_fin = _kmeans_cents_ctes(8, 2)
    sqls["knn_ivf_top5"] = (
        "WITH "
        + ", ".join(
            ivf_ctes
            + _ivf_assign_ctes(ivf_fin, 1)
            + [
                "qcells AS (SELECT query_id, cell FROM (SELECT nid AS "
                "query_id, cent_id AS cell, row_number() OVER (PARTITION BY "
                "nid ORDER BY cs DESC, cent_id ASC) AS rn FROM vs "
                "WHERE nid < 3) WHERE rn <= 2)",
                "pairs AS (SELECT DISTINCT qc.query_id, v.nid AS neighbor_id "
                "FROM qcells qc JOIN vcell v ON v.cell = qc.cell "
                "WHERE v.nid <> qc.query_id)",
                "pc AS (SELECT p.query_id, p.neighbor_id, "
                "CAST(unnest(q.embedding) AS DOUBLE) AS x, "
                "CAST(unnest(n.embedding) AS DOUBLE) AS y FROM pairs p "
                "JOIN embeddings q ON q.vec_id = p.query_id "
                "JOIN embeddings n ON n.vec_id = p.neighbor_id)",
                "ps AS (SELECT query_id, neighbor_id, round(sum(x*y) / "
                "(sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS score FROM pc "
                "GROUP BY query_id, neighbor_id)",
                "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
                "(PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) "
                "AS knn_rank FROM ps)",
            ]
        )
        + " SELECT query_id, neighbor_id, knn_rank FROM ranked "
        "WHERE knn_rank <= 5"
    )
    # product quantization: the shared per-subspace k-means + encode chain,
    # closed two ways — ADC top-k and the raw code table
    pq_ctes = _pq_ctes(4, 8, 2, 64)
    sqls["knn_pq_top5"] = (
        "WITH "
        + ", ".join(
            pq_ctes
            + [
                "qp AS (SELECT q.sub, q.pid AS query_id, c.cent_id AS code, "
                "CAST(unnest(q.pvec) AS DOUBLE) AS x, unnest(c.cvec) AS y "
                "FROM subs q JOIN b2 c ON c.sub = q.sub WHERE q.pid < 3)",
                "dtab AS (SELECT sub, query_id, code, "
                "round(sum((x-y)*(x-y)), 6) AS d FROM qp "
                "GROUP BY sub, query_id, code)",
                "adc AS (SELECT t.query_id, c.neighbor_id, "
                "round(sum(t.d), 6) AS dist FROM codes c JOIN dtab t "
                "ON t.sub = c.sub AND t.code = c.code "
                "WHERE t.query_id != c.neighbor_id "
                "GROUP BY t.query_id, c.neighbor_id)",
                "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
                "(PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) "
                "AS knn_rank FROM adc)",
            ]
        )
        + " SELECT query_id, neighbor_id, knn_rank FROM ranked "
        "WHERE knn_rank <= 5"
    )
    sqls["pq_codes"] = (
        "WITH "
        + ", ".join(pq_ctes)
        + " SELECT neighbor_id AS vec_id, sub, code FROM codes"
    )
    # IVFADC: coarse m=1 chain (c_) -> residuals -> residual PQ chain (r_)
    # -> per-(query, probed cell) residual distance table -> one equi-join
    # on (cell, sub, code) = probe restriction + ADC lookup at once
    sqls["knn_ivfpq_top5"] = (
        "WITH "
        + ", ".join(
            _pq_ctes(1, 4, 2, 64, pfx="c_")
            + [
                "icells AS (SELECT neighbor_id AS vec_id, code AS cell "
                "FROM c_codes)",
                "resid AS MATERIALIZED (SELECT vec_id, cell, "
                "list(ex - cy ORDER BY dim) AS rvec FROM (SELECT e.vec_id, "
                "ce.cell, generate_subscripts(e.embedding, 1) AS dim, "
                "CAST(unnest(e.embedding) AS DOUBLE) AS ex, "
                "unnest(c.cvec) AS cy FROM embeddings e "
                "JOIN icells ce ON ce.vec_id = e.vec_id "
                "JOIN c_b2 c ON c.cent_id = ce.cell) GROUP BY vec_id, cell)",
            ]
            + _pq_ctes(4, 8, 2, 64, src="resid", vcol="rvec", pfx="r_")
            + [
                "qp0 AS (SELECT e.vec_id AS query_id, c.cent_id, "
                "CAST(unnest(e.embedding) AS DOUBLE) AS x, "
                "unnest(c.cvec) AS y FROM embeddings e, c_b2 c "
                "WHERE e.vec_id < 3)",
                "qs0 AS (SELECT query_id, cent_id, "
                "round(sum((x-y)*(x-y)), 6) AS d FROM qp0 "
                "GROUP BY query_id, cent_id)",
                "iprobe AS (SELECT query_id, cell FROM (SELECT query_id, "
                "cent_id AS cell, row_number() OVER (PARTITION BY query_id "
                "ORDER BY d ASC, cent_id ASC) AS rn FROM qs0) WHERE rn <= 2)",
                "qres AS MATERIALIZED (SELECT query_id, cell, "
                "list(ex - cy ORDER BY dim) AS rqvec FROM (SELECT "
                "p.query_id, p.cell, generate_subscripts(e.embedding, 1) "
                "AS dim, CAST(unnest(e.embedding) AS DOUBLE) AS ex, "
                "unnest(c.cvec) AS cy FROM iprobe p "
                "JOIN embeddings e ON e.vec_id = p.query_id "
                "JOIN c_b2 c ON c.cent_id = p.cell) "
                "GROUP BY query_id, cell)",
                "qrs AS (SELECT query_id, cell, s.sub, "
                "rqvec[s.sub*16+1 : s.sub*16+16] AS pvec FROM qres, "
                "(VALUES (0), (1), (2), (3)) s(sub))",
                "dp AS (SELECT q.query_id, q.cell, q.sub, "
                "c.cent_id AS code, unnest(q.pvec) AS x, "
                "unnest(c.cvec) AS y FROM qrs q "
                "JOIN r_b2 c ON c.sub = q.sub)",
                "dtab AS (SELECT query_id, cell, sub, code, "
                "round(sum((x-y)*(x-y)), 6) AS d FROM dp "
                "GROUP BY query_id, cell, sub, code)",
                "candc AS (SELECT r.neighbor_id, ce.cell, r.sub, r.code "
                "FROM r_codes r JOIN icells ce ON ce.vec_id = r.neighbor_id)",
                "adc AS (SELECT t.query_id, c.neighbor_id, "
                "round(sum(t.d), 6) AS dist FROM candc c JOIN dtab t "
                "ON t.cell = c.cell AND t.sub = c.sub AND t.code = c.code "
                "WHERE t.query_id != c.neighbor_id "
                "GROUP BY t.query_id, c.neighbor_id)",
                "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
                "(PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) "
                "AS knn_rank FROM adc)",
            ]
        )
        + " SELECT query_id, neighbor_id, knn_rank FROM ranked "
        "WHERE knn_rank <= 5"
    )
    sqls["text_token_stats"] = (
        "WITH base AS (SELECT doc_id, text, length(text) AS n_chars_m, "
        "len(string_split(text, ' ')) AS n_tokens, "
        "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) "
        "AS n_punct FROM documents), "
        "hits AS (SELECT doc_id, sum(CASE WHEN tok IN (" + _EN + ") THEN 1 "
        "ELSE 0 END) AS en FROM (SELECT doc_id, "
        "unnest(string_split(lower(text), ' ')) AS tok FROM documents) "
        "GROUP BY doc_id) "
        "SELECT base.doc_id, n_chars_m, n_tokens, n_punct, "
        "round(hits.en / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio, "
        "round(n_chars_m / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len "
        "FROM base JOIN hits ON base.doc_id = hits.doc_id"
    )
    # CAST: DuckDB types sum(CASE...) as HUGEINT (int128) while Spark emits
    # LONG; the driver's value hash is type-sensitive, so pin both to BIGINT
    sqls["text_lang_id"] = (
        "WITH hits AS (SELECT doc_id, "
        "CAST(sum(CASE WHEN tok IN (" + _EN + ") THEN 1 ELSE 0 END) AS BIGINT) AS en_hits, "
        "CAST(sum(CASE WHEN tok IN (" + _SL + ") THEN 1 ELSE 0 END) AS BIGINT) AS sl_hits "
        "FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok "
        "FROM documents) GROUP BY doc_id) "
        "SELECT doc_id, en_hits, sl_hits, "
        "CASE WHEN sl_hits > en_hits THEN 'sl' ELSE 'en' END AS lang_pred "
        "FROM hits"
    )
    sqls["text_fingerprint"] = (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) "
        "AS fp FROM documents"
    )
    # S4 extraction twins: documents.text is verified clean (single-spaced,
    # trimmed, [a-z0-9 ]) at all SFs, so the byte-identical extracted text
    # has the closed form 'Doc {id} {text} x y'; edges are the two modular
    # hrefs dictionary-encoded by url sort order (row_number-1), identical
    # binary string collation in both engines.
    sqls["s4_extract_text"] = (
        "SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, "
        "'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text || ' x y' AS text "
        "FROM documents"
    )
    sqls["s4_extract_edges"] = (
        "WITH d AS (SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, "
        "row_number() OVER (ORDER BY 'u' || CAST(doc_id AS VARCHAR)) - 1 AS id "
        "FROM documents), "
        "hrefs AS (SELECT 'u' || CAST(doc_id AS VARCHAR) AS src_url, "
        "'u' || CAST(doc_id * 7 % 500 AS VARCHAR) AS dst_url FROM documents "
        "UNION ALL SELECT 'u' || CAST(doc_id AS VARCHAR), "
        "'u' || CAST(doc_id * 13 % 500 AS VARCHAR) FROM documents) "
        "SELECT s.id AS src, t.id AS dst FROM hrefs "
        "JOIN d s ON s.url = hrefs.src_url JOIN d t ON t.url = hrefs.dst_url"
    )
    sqls["s1_snap_roundtrip"] = (
        f"WITH e AS ({_WEB}) SELECT src, dst, count(*) AS multiplicity "
        f"FROM e GROUP BY src, dst"
    )
    # flagship end-to-end: extraction edges (same derivation as
    # s4_extract_edges, dict inlined so the CTE nests cleanly) feeding the
    # 4-sweep unrolled PageRank, top-10 joined back to urls
    e2e_dict = (
        "SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, "
        "row_number() OVER (ORDER BY 'u' || CAST(doc_id AS VARCHAR)) - 1 "
        "AS id FROM documents"
    )
    e2e_edges = (
        "SELECT s.id AS src, t.id AS dst FROM "
        "(SELECT 'u' || CAST(doc_id AS VARCHAR) AS src_url, "
        "'u' || CAST(doc_id * 7 % 499 AS VARCHAR) AS dst_url FROM documents "
        "UNION ALL SELECT 'u' || CAST(doc_id AS VARCHAR), "
        "'u' || CAST(doc_id % 25 AS VARCHAR) FROM documents) hrefs "
        f"JOIN ({e2e_dict}) s ON s.url = hrefs.src_url "
        f"JOIN ({e2e_dict}) t ON t.url = hrefs.dst_url"
    )
    sqls["e2e_extract_rank_top10"] = (
        f"SELECT d.url AS url, r.rank FROM "
        f"(SELECT id, rank FROM ({_pagerank_fixed_sql(4, edges_sql=e2e_edges)}) "
        f"ORDER BY rank DESC, id ASC LIMIT 10) r "
        f"JOIN ({e2e_dict}) d ON d.id = r.id"
    )
    sqls["events_5min_agg"] = (
        "SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS window_start, "
        "event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )
    sqls["events_sessions"] = (
        "WITH o AS (SELECT user_id, ts, value, event_id, "
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, "
        "event_id) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM events), "
        "g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
        "SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS "
        "session_start, count(*) AS n_events, round(sum(value), 6) AS "
        "sum_value FROM g GROUP BY user_id, sid"
    )
    sqls["events_props_json"] = (
        "SELECT event_type, count(*) AS n, "
        "round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) "
        "AS avg_k, max(CAST(json_extract_string(props, '$.k') AS INTEGER)) "
        "AS max_k FROM events GROUP BY event_type"
    )
    sqls["mm_decode_image"] = (
        "SELECT doc_id AS media_id, "
        "CAST(doc_id % 64 + 8 AS INTEGER) AS width, "
        "CAST(doc_id % 48 + 6 AS INTEGER) AS height, "
        "CAST(3 AS INTEGER) AS channels, "
        "CAST((doc_id % 64 + 8) * (doc_id % 48 + 6) AS BIGINT) AS n_pixels, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes "
        "FROM documents"
    )
    sqls["mm_frame_sample"] = (
        "SELECT doc_id AS media_id, unnest(generate_series(0, "
        "greatest(CAST(floor(octet_length(encode(text)) / 256.0) AS INTEGER) - 1, 0), "
        "10)) AS frame_no FROM documents"
    )
    # PPM decode twin: regenerate the generator's pixel bytes in SQL
    # (md5 hex repeated to w·h·3 bytes) and sum them byte-by-byte — the
    # Spark side decodes the BLOB, the oracle the closed form
    sqls["mm_decode_ppm"] = (
        "WITH m AS (SELECT doc_id, "
        "CAST(doc_id % 16 + 4 AS INTEGER) AS width, "
        "CAST(doc_id % 12 + 3 AS INTEGER) AS height, text FROM documents), "
        "px AS (SELECT doc_id, width, height, width * height * 3 AS n, "
        "substr(repeat(md5(text), CAST(ceil((width * height * 3 * 2) "
        "/ 32.0) AS INTEGER)), 1, width * height * 3 * 2) AS hx FROM m), "
        "b AS (SELECT doc_id, width, height, n, hx, "
        "unnest(range(0, n)) AS i FROM px), "
        "s AS (SELECT doc_id, width, height, n, "
        "CAST(sum(CAST('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2) "
        "AS INTEGER)) AS BIGINT) AS pixel_sum "
        "FROM b GROUP BY doc_id, width, height, n) "
        "SELECT doc_id AS media_id, width, height, "
        "CAST(3 AS INTEGER) AS channels, "
        "CAST(width * height AS BIGINT) AS n_pixels, pixel_sum FROM s"
    )
    # PNG decode twin: identical closed form at the PNG fixture's dims —
    # the compressed bytes never cross engines; the Spark side must
    # inflate + unfilter its way back to this plane
    sqls["mm_decode_png"] = (
        "WITH m AS (SELECT doc_id, "
        "CAST(doc_id % 13 + 5 AS INTEGER) AS width, "
        "CAST(doc_id % 9 + 4 AS INTEGER) AS height, text FROM documents), "
        "px AS (SELECT doc_id, width, height, width * height * 3 AS n, "
        "substr(repeat(md5(text), CAST(ceil((width * height * 3 * 2) "
        "/ 32.0) AS INTEGER)), 1, width * height * 3 * 2) AS hx FROM m), "
        "b AS (SELECT doc_id, width, height, n, hx, "
        "unnest(range(0, n)) AS i FROM px), "
        "s AS (SELECT doc_id, width, height, n, "
        "CAST(sum(CAST('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2) "
        "AS INTEGER)) AS BIGINT) AS pixel_sum "
        "FROM b GROUP BY doc_id, width, height, n) "
        "SELECT doc_id AS media_id, width, height, "
        "CAST(3 AS INTEGER) AS channels, "
        "CAST(width * height AS BIGINT) AS n_pixels, pixel_sum FROM s"
    )
    sqls["lp_labels"] = _label_prop_sql(5)


    sqls["lv_communities"] = louvain_moves_sql(_BLOCK, rounds=4)


    # 12 unrolled rounds: the sf0.01 block graph matches dry in <= 8
    # rounds (measured); extra rounds are empty no-ops by construction
    sqls["g_matching"] = maximal_matching_sql(_BLOCK, rounds=12)


    sqls["g_coarsen_map"] = coarsen_map_sql(_BLOCK, match_rounds=12)
    sqls["g_coarsen_edges"] = coarsen_edges_sql(_BLOCK, match_rounds=12)
    sqls["la_anf_reach"] = _anf_sql(_SPARSE, rounds=3)
    sqls["la_harmonic3"] = _harmonic_sql(_SPARSE, rounds=3)
    sqls["la_cocitation_pairs"] = _cocite_sql(
        _SPARSE, "src", "dst", max_fanout=16, min_count=2,
        out_col="cocitations",
    )
    sqls["la_coupling_pairs"] = _cocite_sql(
        _SPARSE, "dst", "src", max_fanout=16, min_count=1,
        out_col="couplings",
    )

    sqls["la_katz4"] = katz_sql(_WEB, 4)

    sqls["g_assortativity"] = degree_assortativity_sql(_SPARSE)

    sqls["g_node_reciprocity"] = node_reciprocity_sql(_WEB)
    sqls["g_avg_nn_degree"] = avg_neighbor_degree_sql(_SPARSE)
    sqls["lp_neighborhood_jaccard"] = (
        f"WITH e0 AS (SELECT DISTINCT src, dst FROM ({_SPARSE})), "
        "keep AS (SELECT src FROM e0 GROUP BY src HAVING count(*) <= 16), "
        "ek AS (SELECT e0.src, e0.dst FROM e0 JOIN keep USING (src)), "
        "p AS (SELECT a.dst AS a, b.dst AS b, count(*) AS common "
        "FROM ek a JOIN ek b ON a.src = b.src AND a.dst < b.dst "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "d AS (SELECT dst AS id, count(*) AS indeg FROM ek GROUP BY dst) "
        "SELECT p.a, p.b, p.common, round(p.common / "
        "CAST(da.indeg + db.indeg - p.common AS DOUBLE), 6) AS jaccard "
        "FROM p JOIN d da ON p.a = da.id JOIN d db ON p.b = db.id"
    )
    sqls["smp_random_walks"] = _walks_sql(_SPARSE, walk_length=4)
    sqls["smp_ego_network"] = _ego_sql(_SPARSE, _EGO_SEEDS, hops=2)
    sqls["dedup_clusters"] = _dedup_clusters_sql()
    # cluster-keyed md5-uniform split over the same closure; hex->int via
    # CAST('0x'||… AS BIGINT) == Spark conv(…,16,10), /2^32 a pure
    # exponent shift so the < compare is engine-exact
    sqls["dedup_leakage_safe_split"] = (
        "SELECT doc_id, cluster_id, is_duplicate, CASE WHEN "
        "CAST('0x' || substr(md5(cluster_id::VARCHAR || '#split'), 1, 8) "
        "AS BIGINT) / CAST(4294967296.0 AS DOUBLE) < "
        f"CAST({0.2!r} AS DOUBLE) THEN 'test' ELSE 'train' END AS split "
        f"FROM ({_dedup_clusters_sql()})"
    )
    sqls["tri_clustering_coef"] = (
        f"WITH e AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({_SPARSE}) WHERE src <> dst), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 "
        "JOIN e e2 ON e1.b = e2.a "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        f"nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM ({_SPARSE}) "
        f"UNION ALL SELECT dst AS id FROM ({_SPARSE}))), "
        "cnt AS (SELECT id, count(*) AS c FROM (SELECT x AS id FROM tri "
        "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY id), "
        "deg AS (SELECT id, count(*) AS d FROM (SELECT a AS id FROM e "
        "UNION ALL SELECT b FROM e) GROUP BY id) "
        "SELECT n.id, coalesce(deg.d, 0) AS degree, "
        "coalesce(cnt.c, 0) AS triangles, "
        "CASE WHEN coalesce(deg.d, 0) < 2 THEN 0.0 ELSE "
        "round(2.0 * coalesce(cnt.c, 0) / (deg.d * (deg.d - 1)), 9) END "
        "AS coefficient "
        "FROM nodes n LEFT JOIN deg ON deg.id = n.id "
        "LEFT JOIN cnt ON cnt.id = n.id"
    )
    sqls["g_reciprocity"] = (
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({_WEB}) "
        "WHERE src <> dst) "
        "SELECT (SELECT count(*) FROM e JOIN e e2 "
        "ON e.src = e2.dst AND e.dst = e2.src) AS reciprocal_edges, "
        "count(*) AS total_edges, "
        "round((SELECT count(*) FROM e JOIN e e2 "
        "ON e.src = e2.dst AND e.dst = e2.src) "
        "/ CAST(count(*) AS DOUBLE), 9) AS reciprocity FROM e"
    )
    sqls["s4_host_edges"] = (
        f"WITH h AS (SELECT "
        "NULLIF(regexp_extract(src_url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') "
        "AS src_host, "
        "NULLIF(regexp_extract(dst_url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') "
        f"AS dst_host FROM ({D.URL_EDGES_SQL})) "
        "SELECT src_host, dst_host, count(*) AS weight FROM h "
        "WHERE src_host IS NOT NULL AND dst_host IS NOT NULL "
        "AND src_host <> dst_host GROUP BY src_host, dst_host"
    )
    sqls["dedup_survivors"] = _dedup_survivors_sql()
    # 5 peel rounds = the measured fixpoint for k=16 on the sf0.01 sparse
    # graph (round 5 deletes nothing; Spark's counted loop stops there too)
    sqls["g_kcore16"] = _kcore_sql(_SPARSE, k=16, rounds=5)

    sqls["g_coreness"] = coreness_sql(D.WEB_EDGES_SQL, rounds=25)

    sqls["s_rmat_edges"] = rmat_edges_sql(20000, 10)
    sqls["host_rank4"] = (
        f"SELECT id AS host, rank FROM ({_pagerank_fixed_sql(4, _HOST_MULTISET)})"
    )

    sqls["host_crawl_budget"] = host_crawl_budget_sql(
        sqls["host_rank4"], 100000
    )
    # composed crawl-plan twin: the budget and schedule twins verbatim,
    # joined on host and cut at rank_in_host <= budget (each stage's SQL
    # carries its own WITH, so both nest as subqueries)
    _CRAWL_BUDGET_500 = host_crawl_budget_sql(sqls["host_rank4"], 500)
    _CRAWL_SCHED = (
        "WITH f AS (SELECT dst_url AS url, count(*) AS inlinks "
        f"FROM ({D.URL_EDGES_SQL}) GROUP BY dst_url), "
        "h AS (SELECT url, NULLIF(regexp_extract(url, "
        "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') AS host, inlinks "
        "FROM f), "
        "r AS (SELECT url, host, row_number() OVER (PARTITION BY host "
        "ORDER BY inlinks DESC, url ASC) AS rank_in_host FROM h "
        "WHERE host IS NOT NULL) "
        "SELECT url, host, rank_in_host, "
        "CAST((rank_in_host - 1) // 2 + 1 AS INT) AS fetch_round FROM r"
    )
    sqls["e2e_crawl_plan"] = (
        f"SELECT s.url, s.host, s.rank_in_host, s.fetch_round, b.budget "
        f"FROM ({_CRAWL_SCHED}) s JOIN ({_CRAWL_BUDGET_500}) b "
        "ON s.host = b.host WHERE s.rank_in_host <= b.budget"
    )
    # politeness variant: the frontier drops robots-disallowed urls
    # BEFORE the per-host numbering (budget still from the full graph)

    _POLITE_ROBOTS = (
        "SELECT host, 'user-agent: *' || chr(10) || 'disallow: /p' || "
        "regexp_extract(host, '^h([0-9]+)\\.test$', 1) || '1' "
        "AS robots_txt FROM (SELECT DISTINCT "
        "NULLIF(regexp_extract(dst_url, "
        "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') AS host "
        f"FROM ({D.URL_EDGES_SQL})) WHERE host IS NOT NULL"
    )
    _POLITE_SCHED = (
        "WITH f0 AS (SELECT dst_url AS url, count(*) AS inlinks "
        f"FROM ({D.URL_EDGES_SQL}) GROUP BY dst_url), "
        "f AS (SELECT f0.url, f0.inlinks FROM f0 JOIN ("
        + crawl_allowed_sql("SELECT url FROM f0", _POLITE_ROBOTS, "*")
        + ") v ON v.url = f0.url AND v.allowed), "
        "h AS (SELECT url, NULLIF(regexp_extract(url, "
        "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') AS host, inlinks "
        "FROM f), "
        "r AS (SELECT url, host, row_number() OVER (PARTITION BY host "
        "ORDER BY inlinks DESC, url ASC) AS rank_in_host FROM h "
        "WHERE host IS NOT NULL) "
        "SELECT url, host, rank_in_host, "
        "CAST((rank_in_host - 1) // 2 + 1 AS INT) AS fetch_round FROM r"
    )
    sqls["e2e_crawl_plan_polite"] = (
        f"SELECT s.url, s.host, s.rank_in_host, s.fetch_round, b.budget "
        f"FROM ({_POLITE_SCHED}) s JOIN ({_CRAWL_BUDGET_500}) b "
        "ON s.host = b.host WHERE s.rank_in_host <= b.budget"
    )
    sqls["s4_anchor_summary"] = (
        "WITH a AS (SELECT 'u' || (doc_id * 7 % 500)::VARCHAR AS dst_url, "
        "'x' AS anchor FROM documents "
        "UNION ALL SELECT 'u' || (doc_id * 13 % 500)::VARCHAR, 'y' "
        "FROM documents), "
        "c AS (SELECT dst_url, anchor, count(*) AS n FROM a "
        "GROUP BY dst_url, anchor) "
        "SELECT dst_url, CAST(sum(n) AS BIGINT) AS n_anchors, "
        "count(*) AS n_unique_anchors, "
        "substr(min(printf('%010d#%s', 999999999 - n, anchor)), 12) "
        "AS top_anchor FROM c GROUP BY dst_url"
    )
    _ANCH = (
        "SELECT 'u' || (doc_id * 7 % 500)::VARCHAR AS dst_url, "
        "'x' AS term FROM documents "
        "UNION ALL SELECT 'u' || (doc_id * 13 % 500)::VARCHAR, 'y' "
        "FROM documents"
    )
    sqls["s4_anchor_postings"] = (
        f"WITH a AS ({_ANCH}), "
        "tf AS (SELECT term, dst_url, count(*) AS tf FROM a "
        "GROUP BY term, dst_url), "
        "dfq AS (SELECT term, count(*) AS df_term FROM tf GROUP BY term) "
        "SELECT tf.term, tf.dst_url, tf.tf, dfq.df_term "
        "FROM tf JOIN dfq ON tf.term = dfq.term"
    )
    sqls["s4_anchor_search"] = (
        f"WITH a AS ({_ANCH}), "
        "tf AS (SELECT term, dst_url, count(*) AS tf FROM a "
        "GROUP BY term, dst_url), "
        "hits AS (SELECT dst_url, CAST(sum(tf) AS BIGINT) AS score, "
        "count(*) AS n_terms_hit FROM tf WHERE term IN ('x', 'y') "
        "GROUP BY dst_url) "
        "SELECT dst_url, score, n_terms_hit FROM hits "
        "ORDER BY printf('%019d', 1000000000000000000 - score) || '#' || "
        "dst_url LIMIT 10"
    )
    # DeepWalk skip-gram pairs over the smp_random_walks corpus
    sqls["walk_skipgrams"] = _skipgrams_sql(_SPARSE, walk_length=4, window=2)
    # BM25 twin: idf via the integer bin-length chain, saturation factor
    # as the identical IEEE expression; every float constant CAST AS
    # DOUBLE (bare literals parse as DECIMAL in DuckDB), k1+1 injected
    # via repr() so both engines share the exact double
    _k1, _b = 1.2, 0.75
    _BM25_ANCH = (
        "SELECT 'u' || (doc_id * 7 % 211)::VARCHAR AS dst_url, "
        "'t' || (doc_id % 97)::VARCHAR || ' ' || "
        "array_to_string(string_split(text, ' ')[1:2], ' ') AS anchor "
        "FROM documents"
    )
    sqls["s4_anchor_bm25"] = (
        f"WITH anch AS ({_BM25_ANCH}), "
        "a AS (SELECT dst_url, unnest(string_split(lower(anchor), ' ')) "
        "AS term FROM anch), "
        "a2 AS (SELECT dst_url, term FROM a WHERE term <> ''), "
        "tf AS (SELECT term, dst_url, count(*) AS tf FROM a2 "
        "GROUP BY term, dst_url), "
        "dfq AS (SELECT term, count(*) AS df_term FROM tf GROUP BY term), "
        "dlt AS (SELECT dst_url, CAST(sum(tf) AS BIGINT) AS dl FROM tf "
        "GROUP BY dst_url), "
        "st AS (SELECT count(DISTINCT dst_url) AS n_docs, "
        "CAST(sum(tf) AS BIGINT) AS total_terms FROM tf), "
        "hits AS (SELECT t.dst_url, t.tf, q.df_term, d.dl, s.n_docs, "
        "s.total_terms FROM tf t JOIN dfq q ON q.term = t.term "
        "JOIN dlt d ON d.dst_url = t.dst_url CROSS JOIN st s "
        "WHERE t.term IN ('join', 't13', 't42')), "
        "sc AS (SELECT dst_url, round(sum("
        "CAST(length(bin(n_docs // df_term)) - 1 AS DOUBLE) * "
        f"((tf * CAST({_k1 + 1.0!r} AS DOUBLE)) / "
        f"(tf + CAST({_k1!r} AS DOUBLE) * (CAST(1.0 AS DOUBLE) - "
        f"CAST({_b!r} AS DOUBLE) + CAST({_b!r} AS DOUBLE) * "
        "(dl / (total_terms / n_docs)))))), 6) AS bm25, "
        "count(*) AS n_terms_hit FROM hits GROUP BY dst_url) "
        "SELECT dst_url, bm25, n_terms_hit FROM sc "
        "ORDER BY bm25 DESC, dst_url ASC LIMIT 10"
    )

    sqls["url_crawl_schedule"] = (
        "WITH f AS (SELECT dst_url AS url, count(*) AS inlinks "
        f"FROM ({D.URL_EDGES_SQL}) GROUP BY dst_url), "
        "h AS (SELECT url, NULLIF(regexp_extract(url, "
        "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '') AS host, inlinks "
        "FROM f), "
        "r AS (SELECT url, host, row_number() OVER (PARTITION BY host "
        "ORDER BY inlinks DESC, url ASC) AS rank_in_host FROM h "
        "WHERE host IS NOT NULL) "
        "SELECT url, host, rank_in_host, "
        "CAST((rank_in_host - 1) // 2 + 1 AS INT) AS fetch_round FROM r"
    )

    _ROBOTS_SQL = (
        "SELECT 'h' || g::VARCHAR || '.com' AS host, "
        "'# synthetic robots' || chr(10) || 'user-agent: *' || chr(10) || "
        "'disallow: /p' || g::VARCHAR || chr(10) || "
        "'allow: /p' || g::VARCHAR || '/ok' || chr(10) || "
        "'user-agent: testbot' || chr(10) || 'disallow: /q' || g::VARCHAR "
        "AS robots_txt "
        "FROM (SELECT DISTINCT doc_id % 7 AS g FROM documents)"
    )
    _RURLS_SQL = (
        "SELECT DISTINCT 'http://h' || (doc_id % 7)::VARCHAR || '.com' || "
        "CASE WHEN doc_id % 3 = 0 THEN '/p' || (doc_id % 7)::VARCHAR "
        "WHEN doc_id % 3 = 1 THEN '/p' || (doc_id % 7)::VARCHAR || '/ok/x' "
        "ELSE '/free' END AS url FROM documents"
    )
    sqls["url_robots_rules"] = robots_rules_sql(_ROBOTS_SQL)
    sqls["url_crawl_allowed"] = crawl_allowed_sql(_RURLS_SQL, _ROBOTS_SQL, "*")
    sqls["url_redirects_resolved"] = resolve_redirects_sql(
        "SELECT DISTINCT src, src - 1 AS dst FROM "
        "(SELECT l_orderkey % 4999 AS src FROM lineitem) "
        "WHERE src % 7 <> 0"
    )

    sqls["text_url_normalize"] = (
        f"SELECT url, {normalize_url_sql('url')} AS norm_url "
        f"FROM ({D.MESSY_URLS_SQL})"
    )
    _mix_case = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_FRACTIONS.items())
    )
    sqls["smp_stratified_sample"] = (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE CAST('0x' || substr(md5(doc_id::VARCHAR || '#mix1'), 1, 8) "
        "AS BIGINT) / 4294967296.0 "
        f"< CASE lang {_mix_case} END"
    )
    sqls["g_scc_components"] = _scc_sql(D.FUNNEL_EDGES_SQL)
    sqls["g_bowtie_parts"] = _bowtie_sql(D.FUNNEL_EDGES_SQL)

    sqls["lp_adamic_adar"] = adamic_adar_sql(
        _SPARSE, min_common=2, max_fanout=16
    )
    _ngr = tx.repeated_ngram_sql("SELECT doc_id, text FROM documents")
    sqls["text_repeated_ngrams"] = _ngr
    sqls["text_quality_filter"] = (
        f"SELECT doc_id, n_tokens, dup_ratio_2gr, dup_ratio_3gr, "
        "(n_tokens >= 10 AND n_tokens <= 100000 AND dup_ratio_2gr <= 0.6 "
        f"AND dup_ratio_3gr <= 0.4) AS keep FROM ({_ngr})"
    )

    sqls["g_rich_club"] = rich_club_sql(_WEB)
    sqls["la_eigenvector4"] = eigenvector_sql(_WEB, 4)
    # 6 rounds = the measured MIS fixpoint on the sf0.01 web graph (the
    # Spark counted loop stops at the same round — same deterministic
    # greedy; see tests/test_mis.py round-count assertion)
    sqls["g_mis"] = mis_sql(_WEB, rounds=_MIS_ROUNDS)
    sqls["g_condensation_depth"] = condensation_depth_sql(
        D.FUNNEL_EDGES_SQL
    )
    _ndd = "SELECT doc_id, text FROM (" + D.NEAR_DUP_DOCS_SQL + ")"
    _bench_pred = (
        f"(doc_id % {D.NEAR_DUP_PLANT_MOD} = 0 "
        f"AND doc_id < {D.NEAR_DUP_ID_OFFSET})"
    )
    sqls["text_contamination"] = contamination_sql(
        f"{_ndd} WHERE NOT {_bench_pred}",
        f"{_ndd} WHERE {_bench_pred}",
        n=8,
        threshold=0.5,
    )
    sqls["smp_mixture_weights"] = mixture_weights_sql(
        "SELECT doc_id, lang FROM documents", group_col="lang", budget=10_000
    )
    sqls["pii_scan_docs"] = pii_scan_sql(D.DIRTY_DOCS_SQL)

    # 10 rounds = the measured Jones-Plassmann fixpoint on the sf0.01
    # ring fixture (tests/test_round4_ops.py asserts the contract)
    sqls["g_coloring"] = coloring_sql(D.RING_EDGES_SQL, rounds=_COLOR_ROUNDS)

    sqls["text_zipf_fit"] = zipf_fit_sql("SELECT text FROM documents")

    _mix_lang = (
        "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'de' "
        "WHEN 2 THEN 'fr' ELSE 'sl' END AS lang"
    )
    sqls["e2e_training_mix"] = training_mix_sql(
        f"SELECT doc_id, text, {_mix_lang} FROM "
        f"({_ndd} WHERE NOT {_bench_pred})",
        f"{_ndd} WHERE {_bench_pred}",
        budget=120,
    )
    sqls["s4_latest_capture"] = (
        f"WITH p AS ({D.CRAWL_PAGES_SQL}), "
        "w AS (SELECT url, max(warc_ts) AS warc_ts FROM p GROUP BY url) "
        "SELECT p.url, CAST(floor(epoch(p.warc_ts)) AS BIGINT) "
        "AS warc_epoch, p.lang, md5(p.text) AS text_md5 "
        "FROM p JOIN w ON w.url = p.url AND w.warc_ts = p.warc_ts"
    )
    sqls["s4_capture_changes"] = (
        f"WITH p AS ({D.CRAWL_PAGES_SQL}) "
        "SELECT url, count(*) AS n_captures, "
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_versions, "
        "count(DISTINCT md5(text)) > 1 AS changed FROM p GROUP BY url"
    )

    sqls["text_length_quantiles"] = exact_quantiles_sql(
        "SELECT doc_id, n_chars FROM documents",
        "n_chars",
        qs=(0.5, 0.9, 0.99),
        key_col="doc_id",
    )

    sqls["g_attack_robustness"] = attack_robustness_sql(
        _BLOCK, ks=(0, 5, 25)
    )

    sqls["emb_outlier_filter"] = embedding_outliers_sql(
        "SELECT vec_id, label, embedding FROM embeddings", q=0.9
    )

    sqls["text_boilerplate_lines"] = boilerplate_lines_sql(
        D.PAGED_DOCS_SQL, min_docs=3
    )
    sqls["text_c4_clean"] = c4_clean_sql(D.PAGED_DOCS_SQL)

    _DOCS_PLAIN = "SELECT doc_id, text FROM documents"
    sqls["pack_doc_spans"] = pack_sequences_sql(_DOCS_PLAIN, seq_len=512)
    sqls["pack_summary"] = packing_summary_sql(_DOCS_PLAIN, seq_len=512)
    sqls["dedup_overlap_pairs"] = dd.token_overlap_pairs_sql(
        D.QUOTE_DOCS_SQL, threshold=0.9
    )
    sqls["dedup_span_stats"] = dd.duplicated_span_stats_sql(
        D.QUOTE_DOCS_SQL, k=8, min_count=2
    )
    sqls["dedup_span_clean"] = dd.remove_duplicated_spans_sql(
        D.QUOTE_DOCS_SQL, k=8, min_count=2
    )

    sqls["lp_simrank2"] = simrank_sql(D.SIMRANK_EDGES_SQL, iterations=2)

    sqls["smp_corpus_diversity"] = corpus_diversity_sql(
        "SELECT doc_id, lang, source FROM documents"
    )

    sqls["s4_mirror_hosts"] = mirror_hosts_sql(
        D.MIRROR_PAGES_SQL, threshold=0.5
    )

    sqls["text_readability"] = readability_sql(D.PAGED_DOCS_SQL)

    sqls["s4_crawler_traps"] = crawler_trap_hosts_sql(D.TRAP_PAGES_SQL)

    sqls["text_ngram_novelty"] = tx.ngram_novelty_sql(
        "SELECT doc_id, text FROM documents", n=3
    )
    sqls["text_lang_quantiles"] = grouped_quantiles_sql(
        "SELECT doc_id, lang, n_chars FROM documents",
        "n_chars",
        "lang",
        qs=(0.25, 0.5, 0.9),
        key_col="doc_id",
    )
    # SemDeDup: the dedup_embedding_pairs candidate chain (trained cells,
    # nprobe 2) + recursive closure + farthest-from-centroid survivor via
    # the printf arg-min key on the nano-int home-cell cosine
    sd_ctes, sd_fin = _kmeans_cents_ctes(8, 2)
    sqls["dedup_semdedup"] = (
        "WITH RECURSIVE "
        + ", ".join(
            sd_ctes
            + _ivf_assign_ctes(sd_fin, 2)
            + [
                "scand AS (SELECT DISTINCT a.nid AS id_a, b.nid AS id_b "
                "FROM vcell a JOIN vcell b ON a.cell = b.cell "
                "AND a.nid < b.nid)",
                "spc AS (SELECT c.id_a, c.id_b, "
                "CAST(unnest(x.embedding) AS DOUBLE) AS x, "
                "CAST(unnest(y.embedding) AS DOUBLE) AS y FROM scand c "
                "JOIN embeddings x ON x.vec_id = c.id_a "
                "JOIN embeddings y ON y.vec_id = c.id_b)",
                "spairs AS (SELECT id_a, id_b FROM spc "
                "GROUP BY id_a, id_b HAVING sum(x*y) / "
                "(sqrt(sum(x*x)) * sqrt(sum(y*y))) > 0.35)",
                "ssym(a, b) AS (SELECT id_a, id_b FROM spairs "
                "UNION SELECT id_b, id_a FROM spairs)",
                "sreach(a, b) AS (SELECT a, b FROM ssym UNION "
                "SELECT r.a, s.b FROM sreach r JOIN ssym s ON r.b = s.a)",
                "scomp AS (SELECT a AS doc_id, least(a, min(b)) AS "
                "component FROM sreach GROUP BY a)",
                "shome AS (SELECT v.nid AS doc_id, s.cs AS centroid_sim "
                "FROM vcell v JOIN vs s ON s.nid = v.nid "
                "AND s.cent_id = v.cell WHERE v.rn = 1)",
                "sassign AS (SELECT e.vec_id AS doc_id, "
                "coalesce(c.component, e.vec_id) AS cluster_id, "
                "h.centroid_sim FROM embeddings e "
                "LEFT JOIN scomp c ON c.doc_id = e.vec_id "
                "JOIN shome h ON h.doc_id = e.vec_id)",
                "ssurv AS (SELECT cluster_id, CAST(substr(min(printf("
                "'%07d#%020d', CAST(round(centroid_sim * 1e6, 0) AS BIGINT)"
                " + 1000000, doc_id)), 9, 20) AS BIGINT) AS survivor_id "
                "FROM sassign GROUP BY cluster_id)",
            ]
        )
        + " SELECT a.doc_id, a.cluster_id, s.survivor_id, a.centroid_sim, "
        "a.doc_id <> s.survivor_id AS is_duplicate "
        "FROM sassign a JOIN ssurv s ON s.cluster_id = a.cluster_id"
    )
    sqls["text_dsir_weights"] = tx.dsir_weights_sql(
        "SELECT doc_id, text FROM documents",
        "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0",
    )

    sqls["url_bloom_seen"] = (
        "WITH bp AS (SELECT * FROM ("
        + bloom_seen_sql(
            f"SELECT src AS id FROM ({_WEB})",
            f"SELECT dst AS id FROM ({_WEB})",
            m_bits=4096,
            num_hashes=3,
        )
        + ") _b), "
        f"sn AS (SELECT DISTINCT src AS id FROM ({_WEB})) "
        "SELECT bp.id, bp.maybe_present AS maybe_seen, "
        "sn.id IS NOT NULL AS actually_seen "
        "FROM bp LEFT JOIN sn USING (id)"
    )
    sqls["text_cms_heavy_hitters"] = cms_heavy_hitters_sql(
        "SELECT unnest(string_split(text, ' ')) AS v FROM documents",
        top_k=20,
        depth=3,
        width=256,
    )
    sqls["text_textrank_keywords"] = textrank_keywords_sql(
        "SELECT doc_id, text FROM documents", top_k=3
    )
    sqls["text_bpe_fertility"] = tx.bpe_ish_token_stats_sql(
        "SELECT doc_id, text FROM documents"
    )

    sqls["dedup_winnow_pairs"] = winnow_pairs_sql(
        "SELECT doc_id, text FROM documents"
    )

    sqls["g_landmark_dists"] = landmark_distances_sql(
        _WEB,
        "SELECT a.id AS src, b.id AS dst FROM "
        f"(SELECT DISTINCT src AS id FROM ({_WEB}) WHERE src % 100 = 0) a, "
        f"(SELECT DISTINCT dst AS id FROM ({_WEB}) WHERE dst % 100 = 1) b",
        num_landmarks=4,
        max_depth=6,
    )
    # WARC round-trip: the parsed records must equal the pages the builder
    # serialized, so the twin reconstructs the pages directly (same
    # construction as CRAWL_PAGES_SQL) — parse(build(x)) == x is the claim
    _wh1 = "'<html><body><p>' || text || '</p></body></html>'"
    _wh2 = "'<html><body><p>' || text || ' updated</p></body></html>'"
    sqls["s_warc_roundtrip"] = (
        "SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, "
        "1704067200 + (doc_id % 97) * 3600 AS warc_epoch, "
        f"octet_length(CAST({_wh1} AS BLOB)) AS content_length, "
        f"{_wh1} AS payload_text FROM documents "
        "UNION ALL "
        "SELECT 'u' || CAST(doc_id AS VARCHAR), "
        "1704067200 + (doc_id % 97) * 3600 + 720000, "
        f"octet_length(CAST({_wh2} AS BLOB)), {_wh2} "
        "FROM documents WHERE doc_id % 3 = 0"
    )
    sqls["s_warc_stats"] = (
        "WITH rec AS ("
        "SELECT doc_id % 16 AS segment_id, "
        "'u' || CAST(doc_id AS VARCHAR) AS url, "
        f"octet_length(CAST({_wh1} AS BLOB)) AS len FROM documents "
        "UNION ALL "
        "SELECT doc_id % 16, 'u' || CAST(doc_id AS VARCHAR), "
        f"octet_length(CAST({_wh2} AS BLOB)) FROM documents "
        "WHERE doc_id % 3 = 0) "
        "SELECT segment_id, COUNT(*) AS n_records, "
        "CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls, "
        "SUM(len) AS payload_bytes FROM rec GROUP BY segment_id"
    )
    # sitemap parse: the XML never crosses engines — the twin reconstructs
    # the parsed rows from documents, so the Spark side proves its regexp
    # extraction inverts the builder exactly (incl. NULL optional fields)
    sqls["s_sitemap_parse"] = D.SITEMAP_PARSED_SQL
    sqls["s_sitemap_recrawl"] = (
        f"WITH p AS ({D.SITEMAP_PARSED_SQL}) "
        "SELECT host, COUNT(*) AS n_urls, "
        "SUM(CASE WHEN lastmod < DATE '2024-01-15' THEN 1 ELSE 0 END) "
        "AS n_stale, "
        "round(avg(CASE WHEN changefreq = 'daily' THEN 1 ELSE 0 END), 6) "
        "AS frac_daily FROM p GROUP BY host"
    )
    sqls["g_transitivity"] = (
        "WITH simple AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({_SPARSE}) WHERE src <> dst), "
        "deg AS (SELECT id, count(*) AS d FROM (SELECT a AS id FROM simple "
        "UNION ALL SELECT b AS id FROM simple) GROUP BY id), "
        "w AS (SELECT CAST(coalesce(sum(d * (d - 1)), 0) // 2 AS BIGINT) "
        "AS n_wedges FROM deg), "
        "t AS (SELECT count(*) AS n_triangles FROM simple e1 "
        "JOIN simple e2 ON e1.b = e2.a "
        "JOIN simple e3 ON e3.a = e1.a AND e3.b = e2.b) "
        "SELECT n_wedges, n_triangles, "
        "CASE WHEN n_wedges > 0 THEN round(3.0 * "
        "CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 9) END "
        "AS transitivity FROM w CROSS JOIN t"
    )

    sqls["e2e_frontier_plan"] = sitemap_frontier_plan_sql(
        D.SITEMAP_PARSED_SQL, urls_per_round=4, max_spam_score=2
    )
    sqls["text_lm_stupid_backoff"] = tx.lm_stupid_backoff_sql(
        "SELECT doc_id, text FROM documents",
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
    )

    sqls["g_random_failure"] = random_failure_robustness_sql(
        _BLOCK, fracs=(0.0, 0.3, 0.6)
    )

    sqls["url_spam_features"] = url_spam_features_sql(
        D.FRONTIER_URLS_SQL
    )

    def _tri_total_sql(edges_sql: str, out_col: str) -> str:
        return (
            "SELECT count(*) AS " + out_col + " FROM ("
            "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
            f"FROM ({edges_sql}) WHERE src <> dst) e1 "
            "JOIN (SELECT DISTINCT least(src, dst) AS a, "
            f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst) "
            "e2 ON e1.b = e2.a "
            "JOIN (SELECT DISTINCT least(src, dst) AS a, "
            f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst) "
            "e3 ON e3.a = e1.a AND e3.b = e2.b"
        )

    sqls["g_rewired_edges"] = rewire_configuration_sql(_SPARSE)
    _rw = rewire_configuration_sql(_SPARSE)
    sqls["g_motif_significance"] = (
        f"WITH obs AS ({_tri_total_sql(_SPARSE, 'observed_triangles')}), "
        f"nul AS ({_tri_total_sql(_rw, 'null_triangles')}) "
        "SELECT observed_triangles, null_triangles, "
        "CASE WHEN null_triangles > 0 THEN "
        "round(CAST(observed_triangles AS DOUBLE) / "
        "CAST(null_triangles AS DOUBLE), 6) END AS excess_ratio "
        "FROM obs CROSS JOIN nul"
    )
    _churn_edges = f"SELECT src, dst FROM ({_WEB}) WHERE (src + dst) % 13 <> 0"
    sqls["r_rank_churn"] = (
        f"WITH o0 AS ({_pagerank_fixed_sql(3)}), "
        f"n0 AS ({_pagerank_fixed_sql(4, edges_sql=_churn_edges)}), "
        "o AS (SELECT id, round(rank, 9) AS rank_old FROM o0), "
        "n AS (SELECT id, round(rank, 9) AS rank_new FROM n0), "
        "c AS (SELECT o.id, rank_old, rank_new FROM o JOIN n USING (id)), "
        "po AS (SELECT id, row_number() OVER "
        "(ORDER BY rank_old DESC, id ASC) AS pos_old FROM c), "
        "pn AS (SELECT id, row_number() OVER "
        "(ORDER BY rank_new DESC, id ASC) AS pos_new FROM c), "
        "sp AS (SELECT count(*) AS n_common, CAST(sum((pos_old - pos_new) "
        "* (pos_old - pos_new)) AS BIGINT) AS sum_d2 "
        "FROM po JOIN pn USING (id)), "
        "tko AS (SELECT id FROM o ORDER BY rank_old DESC, id LIMIT 10), "
        "tkn AS (SELECT id FROM n ORDER BY rank_new DESC, id LIMIT 10), "
        "ov AS (SELECT count(*) AS k_common FROM tko JOIN tkn USING (id)), "
        "nw AS (SELECT count(*) AS n_new FROM n "
        "WHERE id NOT IN (SELECT id FROM o)), "
        "dr AS (SELECT count(*) AS n_dropped FROM o "
        "WHERE id NOT IN (SELECT id FROM n)), "
        "dl AS (SELECT round(max(abs(rank_new - rank_old)), 9) "
        "AS max_abs_delta FROM c) "
        "SELECT n_common, n_new, n_dropped, "
        "CASE WHEN n_common > 1 THEN round(1.0 - (6.0 * sum_d2) / "
        "(CAST(n_common AS DOUBLE) * (CAST(n_common AS DOUBLE) * "
        "CAST(n_common AS DOUBLE) - 1.0)), 6) END AS spearman_rho, "
        "round(k_common / 10.0, 6) AS topk_overlap, max_abs_delta "
        "FROM sp CROSS JOIN ov CROSS JOIN nw CROSS JOIN dr CROSS JOIN dl"
    )

    sqls["text_doc_bm25"] = doc_bm25_sql(
        "SELECT doc_id, text FROM documents",
        ["window", "shuffle", "hash"],
        k=15,
    )

    sqls["e2e_search_rank"] = search_with_authority_sql(
        doc_bm25_sql(
            "SELECT doc_id, text FROM documents", _SEARCH_TERMS, k=20
        ),
        _pagerank_fixed_sql(4),
        "b.doc_id % 1400",
        k=10,
    )
    # every queries() key has a SQL twin (round-3 state: the former
    # rows-only four gained md5-variant / unrolled-frozen twins in round 3)
    return sqls
