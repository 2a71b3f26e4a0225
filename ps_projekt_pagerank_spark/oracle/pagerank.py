"""Sequential PageRank oracle.

Replicates the reference's sequential algorithm (``src/Graph.cpp:118-173``;
formula Naloga4.pdf p.1: R(p) = (1-d)/N + d * sum(R(q)/L(q)) with sink-mass
redistribution folded into a per-iteration scalar) with its exact frozen-node
Jacobi semantics:

- init rank = 1/N for every node, all nodes active (Graph.cpp:124-128);
- per iteration (Graph.cpp:130-170):
  * ``iterations += 1`` BEFORE the stop check, so the final all-frozen
    sweep is counted (Graph.cpp:133,158);
  * sink_sum = ((1-d) + d * sum of CURRENT ranks of sinks) / N — frozen
    sinks keep contributing (Graph.cpp:135-140);
  * for each still-active node: new = sink_sum + d * sum over in-edges of
    rank[src]/outdeg[src]; frozen sources contribute their frozen rank
    (Graph.cpp:142-155); nodes with no in-links get plain sink_sum;
  * commit: active nodes take the new value; those with |new-old| < delta
    freeze and are skipped in all later sweeps (Graph.cpp:160-169).

Multigraph semantics: every duplicate edge contributes separately and
self-loops are legal (reference reader, Graph.cpp:94-97).

Validated this session: reproduces the reference binary's 25/29/44
iterations and per-vertex ranks on the mini/small/sink-test fixtures.
"""

from __future__ import annotations

import numpy as np

from .. import DAMPING, REFERENCE_DELTA


def pagerank(
    edges: list[tuple[int, int]],
    damping: float = DAMPING,
    delta: float = REFERENCE_DELTA,
    max_iterations: int = 10_000,
) -> tuple[dict[int, float], int]:
    """Return ({node_id: rank}, iteration_count).

    Node set and dense order = first appearance in the edge list, exactly
    like the reference reader (Graph.cpp:60-91). Ranks are keyed by the
    original ids.
    """
    order: list[int] = []
    index: dict[int, int] = {}
    for s, d in edges:
        for v in (s, d):
            if v not in index:
                index[v] = len(order)
                order.append(v)
    n = len(order)
    if n == 0:
        return {}, 0

    src = np.fromiter((index[s] for s, _ in edges), dtype=np.int64, count=len(edges))
    dst = np.fromiter((index[d] for _, d in edges), dtype=np.int64, count=len(edges))
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    is_sink = outdeg == 0.0

    rank = np.full(n, 1.0 / n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    iterations = 0

    while iterations < max_iterations:
        iterations += 1
        sink_sum = ((1.0 - damping) + damping * rank[is_sink].sum()) / n
        if not active.any():
            break  # counted final empty sweep (Graph.cpp:133,158)

        # scatter: every edge contributes rank[src]/outdeg[src] to dst
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, rank[src] / outdeg[src])
        new_rank = sink_sum + damping * contrib

        # commit only active nodes; freeze those within delta
        converged = np.abs(new_rank - rank) < delta
        rank = np.where(active, new_rank, rank)
        active = active & ~converged

    return {order[i]: float(rank[i]) for i in range(n)}, iterations
