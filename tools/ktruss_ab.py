"""Same-window A/B: k-truss DELTA peeling vs FULL-recount peeling.

Round-4 verdict task 2: the delta-peeling rewrite landed in r4 but its
graded bench sample regressed 31.7 -> 41.3 s with no clean-window
evidence that delta actually wins. This harness races the two
implementations in ONE session, interleaved A B B A (min of the two
legs each) so host steal drift cancels, with cpu_probe steal context
printed before/after. The full-recount loop below is the r3-era
algorithm: recompute ``_edge_support`` over the surviving subgraph every
round, drop under-supported edges, repeat.

    python tools/ktruss_ab.py [sf_dir] [k]

Appends a markdown record to BENCH/BASELINE.md (same convention as
bench.py --scaling) and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from ps_projekt_pagerank_spark.operators.triangles import (  # noqa: E402
    _edge_support,
    canonical_edges,
    k_truss,
)
from ps_projekt_pagerank_spark.session import get_spark  # noqa: E402
from ps_projekt_pagerank_spark.sources import derived as D  # noqa: E402
from tools.cpu_probe import steal_context  # noqa: E402


def k_truss_full_recount(edges, k: int, max_rounds: int = 50):
    """The r3-era peeling: FULL support recount per round (the most
    expensive join in the operator times the round count). Kept here as
    the A/B adversary; `_edge_support` is also the per-round oracle the
    pytest suite checks delta peeling against."""
    e = canonical_edges(edges).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        sup = _edge_support(e)
        keep = (
            e.join(sup, ["a", "b"], "left")
            .where(F.coalesce("support", F.lit(0)) >= k - 2)
            .select("a", "b")
        )
        nxt = keep.localCheckpoint(eager=True)
        if nxt.count() == e.count():
            return nxt
        e = nxt
    return e


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ktruss-ab", cores=32, shuffle_partitions=32)
    edges = D.sparse_edges(spark, sf_dir)
    edges.persist(StorageLevel.MEMORY_AND_DISK).count()  # warm input

    before = steal_context()

    def leg_delta():
        stats: list = []
        t0 = time.perf_counter()
        n = k_truss(edges, k, stats=stats).count()
        return time.perf_counter() - t0, n, stats

    def leg_full():
        t0 = time.perf_counter()
        n = k_truss_full_recount(edges, k).count()
        return time.perf_counter() - t0, n

    # interleave A B B A so linear steal drift cancels
    d1, nd, stats = leg_delta()
    f1, nf = leg_full()
    f2, nf2 = leg_full()
    d2, nd2, _ = leg_delta()
    after = steal_context()
    assert nd == nf == nf2 == nd2, (nd, nf, nf2, nd2)

    rec = {
        "metric": "ktruss delta-peeling vs full-recount A/B (same window)",
        "sf_dir": sf_dir,
        "k": k,
        "truss_edges": nd,
        "delta_seconds": round(min(d1, d2), 3),
        "full_seconds": round(min(f1, f2), 3),
        "delta_legs": [round(d1, 3), round(d2, 3)],
        "full_legs": [round(f1, 3), round(f2, 3)],
        "speedup": round(min(f1, f2) / min(d1, d2), 3),
        "rounds": [
            {kk: s[kk] for kk in ("round", "removed_edges",
                                  "dead_triangles", "live_triangles")}
            for s in stats
        ],
        "steal_context": {"before": before, "after": after},
    }
    print(json.dumps(rec))
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n\n## ktruss A/B (delta vs full recount) — "
            f"{time.strftime('%Y-%m-%d %H:%M')}\n\n"
            f"```json\n{json.dumps(rec, indent=1)}\n```\n"
        )


if __name__ == "__main__":
    main()
