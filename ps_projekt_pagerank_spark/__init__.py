"""PySpark-native link-graph analytics engine.

A brand-new engine (NOT a port) with the query semantics of the reference
``jkenda/ps-projekt-pagerank`` (C++/OpenMP/OpenCL PageRank over SNAP web
graphs): damping-0.85 PageRank with sink-mass redistribution and frozen-node
convergence, plus connected components, label propagation and triangle
counting, over edge tables derived from Common-Crawl-style web pages — all
expressed as DataFrame gather/scatter joins and two-stage aggregations so
Catalyst/AQE pick the physical plan.

Layout
------
- ``oracle/``     pure-Python/NumPy sequential reference implementations
                  (the correctness contract; no Spark imports)
- ``sources/``    SNAP edge-list scan, synthetic pages generator,
                  pages→edges Arrow extraction, graph tripler, checkpoints
- ``operators/``  graph construction (degrees/sinks/adjacency), PageRank,
                  connected components, label propagation, triangles,
                  dedup family, similarity search, multimodal plumbing
- ``functions/``  scalar/vector column function library (text stats,
                  vector math) — built-in `pyspark.sql.functions` only
- ``plans/``      reporting queries (rank sum, top-k, order agreement)
- ``streaming/``  Structured Streaming variants (windowed event aggs)
"""

DAMPING = 0.85
"""Damping factor d (reference: src/Graph.hpp:9, src/god-kernel.cl:1)."""

REFERENCE_DELTA = 1e-16
"""Reference convergence delta (src/Graph.hpp:8) — FP-order nondeterministic."""

NORTH_EPSILON = 1e-6
"""Convergence epsilon used for all golden tests (BASELINE.md north rule)."""

__version__ = "0.1.0"
