#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "pagerank": {"iterations": n, "edges": m, "edges_per_sec_per_iter": x}}

--scaling mode: run the identical PageRank job at two parallelism levels
(local[8] vs local[32] — the sandbox proxy for N vs 4N executors, per
BASELINE.md) via subprocesses and write BENCH/BASELINE.md with both
throughputs and the scaling efficiency (T_8/T_32)/4.

--pagerank-only N: internal helper for --scaling (one timed run at N cores,
prints one JSON line).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:  # noqa: BLE001
        return -1.0


def _pagerank_run(spark, sf_dir):
    """The headline job: converged frozen-node PageRank on the derived web
    graph. Returns (seconds_of_iterative_phase, iterations, edges)."""
    from ps_projekt_pagerank_spark import NORTH_EPSILON
    from ps_projekt_pagerank_spark.operators.graph import build_graph
    from ps_projekt_pagerank_spark.operators.pagerank import pagerank
    from ps_projekt_pagerank_spark.sources.derived import web_edges

    g = build_graph(web_edges(spark, sf_dir))
    t0 = time.perf_counter()
    res = pagerank(web_edges(spark, sf_dir), epsilon=NORTH_EPSILON,
                   max_iterations=200, graph=g)
    dt = time.perf_counter() - t0
    res.ranks.count()
    g.unpersist()
    return dt, res.iterations, g.num_edges


def run_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from ps_projekt_pagerank_spark.operators.components import (
        connected_components,
    )
    from ps_projekt_pagerank_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from ps_projekt_pagerank_spark.operators.labelprop import label_propagation
    from ps_projekt_pagerank_spark.operators.pagerank import pagerank_fixed
    from ps_projekt_pagerank_spark.operators.similarity import knn_bruteforce
    from ps_projekt_pagerank_spark.operators.triangles import triangles_total
    from ps_projekt_pagerank_spark.sources import derived as D
    from ps_projekt_pagerank_spark.sources.extraction import extract_text_udf

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: converged PageRank (iterative phase only)
    dt, iters, edges = _pagerank_run(spark, sf_dir)
    timings["pagerank_converged"] = round(dt, 3)
    extras["pagerank"] = {
        "iterations": iters,
        "edges": edges,
        "seconds": round(dt, 3),
        "edges_per_sec_per_iter": round(edges * iters / dt, 1),
    }

    timed(
        "pagerank_fixed4",
        lambda: pagerank_fixed(D.web_edges(spark, sf_dir), 4).count(),
    )
    timed(
        "connected_components",
        lambda: connected_components(D.block_edges(spark, sf_dir)).count(),
    )
    timed(
        "label_propagation",
        lambda: label_propagation(D.block_edges(spark, sf_dir), rounds=5).count(),
    )
    timed(
        "triangles",
        lambda: triangles_total(D.sparse_edges(spark, sf_dir)).collect(),
    )
    timed(
        "dedup_minhash_pairs",
        lambda: minhash_lsh_pairs(
            D.documents(spark, sf_dir).select("doc_id", "text")
        ).count(),
    )

    vecs = D.embeddings(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    timed("knn_bruteforce", lambda: knn_bruteforce(vecs, queries, 5).count())

    # Arrow-vectorized text extraction over synthesized html
    docs = D.documents(spark, sf_dir)
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
    ).cast("binary")
    timed(
        "extract_text_arrow",
        lambda: docs.select(extract_text_udf(html).alias("t"))
        .agg(F.sum(F.length("t")))
        .collect(),
    )
    return timings, extras


def main_bench():
    from ps_projekt_pagerank_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    timings, extras = run_suite(spark, SF_DIR)
    out = {
        "metric": "headline suite wall-clock (converged PageRank + graph "
        "algorithms + dedup/knn/extraction) at local[%d]" % CPUS,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        **extras,
    }
    print(json.dumps(out))


def main_pagerank_only(cores: int):
    from ps_projekt_pagerank_spark.session import get_spark

    spark = get_spark(f"bench-pr-{cores}", cores=cores, shuffle_partitions=cores)
    dt, iters, edges = _pagerank_run(spark, SF_DIR)
    print(
        json.dumps(
            {
                "cores": cores,
                "seconds": round(dt, 3),
                "iterations": iters,
                "edges": edges,
                "edges_per_sec_per_iter": round(edges * iters / dt, 1),
            }
        )
    )


def main_scaling():
    """local[8] vs local[32] on identical input → BENCH/BASELINE.md."""
    results = []
    for cores in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, __file__, "--pagerank-only", str(cores)],
            capture_output=True, text=True, env=env, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    r8, r32 = results
    t8, t32 = r8["seconds"], r32["seconds"]
    eff = (t8 / t32) / 4
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — two-parallelism scaling run (north rule)\n\n"
            "Same job (converged frozen-node PageRank, d=0.85, eps=1e-6, "
            "derived web graph), same input (`%s`), two parallelism levels — "
            "the sandbox proxy for N vs 4N executors per BASELINE.md.\n\n"
            "| config | wall sec (iterative phase) | iterations | edges | "
            "edges/sec/iteration |\n|---|---|---|---|---|\n" % SF_DIR
        )
        for r in results:
            f.write(
                "| local[%d] | %.3f | %d | %d | %.0f |\n"
                % (
                    r["cores"], r["seconds"], r["iterations"], r["edges"],
                    r["edges_per_sec_per_iter"],
                )
            )
        f.write(
            "\nScaling efficiency (T_8/T_32)/4 = **%.3f** "
            "(north-rule target ≥ 0.8 — see BASELINE.md; note a single-JVM "
            "local-mode proxy includes fixed per-iteration driver/JVM "
            "latency that a real 4x-executor cluster amortizes).\n" % eff
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "runs": results}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--pagerank-only" in sys.argv:
        main_pagerank_only(int(sys.argv[sys.argv.index("--pagerank-only") + 1]))
    else:
        main_bench()
