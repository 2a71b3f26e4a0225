"""Sequential oracles for the north-rule graph extensions.

No reference counterpart exists (the reference implements only PageRank), so
these definitions ARE the contract the Spark operators must match exactly
(BASELINE.json north_star: "component/label assignments must match exactly").

All three treat the graph as undirected and SIMPLE for their purposes:
self-loops dropped, duplicate edges collapsed (PageRank keeps multigraph
semantics; see oracle.pagerank).
"""

from __future__ import annotations

from collections import Counter


def _undirected_simple(edges: list[tuple[int, int]]) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set())
        adj.setdefault(d, set())
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def connected_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """{node_id: component_id} where component_id = min node id reachable
    over undirected edges (weakly connected components)."""
    adj = _undirected_simple(edges)
    comp: dict[int, int] = {}
    for start in adj:
        if start in comp:
            continue
        # BFS; label whole component with its minimum id afterwards
        stack, seen = [start], {start}
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        label = min(seen)
        for v in seen:
            comp[v] = label
    return comp


def label_propagation(
    edges: list[tuple[int, int]], rounds: int = 5
) -> dict[int, int]:
    """Synchronous label propagation, deterministic by construction.

    init label(v) = v; each round every node simultaneously takes the most
    frequent label among its (deduplicated, undirected) neighbors, breaking
    count-ties by the SMALLEST label; isolated nodes keep their label.
    Runs exactly ``rounds`` synchronous rounds (synchronous LP can
    oscillate on bipartite structures, so a fixed round count is the
    deterministic contract; early-exits if a round changes nothing).
    """
    adj = _undirected_simple(edges)
    label = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, neigh in adj.items():
            if not neigh:
                new[v] = label[v]
                continue
            counts = Counter(label[w] for w in neigh)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def triangle_count(
    edges: list[tuple[int, int]],
) -> tuple[int, dict[int, int]]:
    """(total_triangles, {node_id: triangles_through_node}).

    Over the canonicalized simple undirected graph (src<dst, distinct,
    self-loops dropped).
    """
    adj = _undirected_simple(edges)
    per_node = {v: 0 for v in adj}
    total = 0
    canon = {(min(a, b), max(a, b)) for a in adj for b in adj[a]}
    for a, b in canon:
        common = adj[a] & adj[b]
        for c in common:
            if c > b:  # each triangle counted once with a < b < c
                total += 1
                per_node[a] += 1
                per_node[b] += 1
                per_node[c] += 1
    return total, per_node
