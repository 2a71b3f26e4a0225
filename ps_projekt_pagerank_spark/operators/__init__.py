"""Operators (SURVEY.md §2.2-§2.3 + north-rule extensions).

- graph:       G1-G5 node discovery, out-degree, sinks, adjacency build
- pagerank:    P1-P7 frozen-node PageRank driver loop (+ fixed-k variant)
- components:  connected components (iterative min-label, DataFrame-only)
- labelprop:   synchronous label propagation
- triangles:   triangle counting over canonicalized simple edges
- dedup:       exact / minhash-LSH / simhash / ngram-jaccard / embedding near-dup
- similarity:  brute-force + LSH-bucketed cosine top-k
- multimodal:  binary-column decode/feature plumbing (stubbed codecs)
"""
