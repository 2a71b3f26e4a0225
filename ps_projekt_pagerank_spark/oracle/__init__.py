"""Sequential reference implementations (the correctness contract).

Pure Python + NumPy, no Spark imports. ``pagerank`` replicates the
reference's sequential algorithm (``src/Graph.cpp:118-173``) exactly —
validated against the reference binary's iteration counts (25/29/44) and
printed ranks on the three committed fixture graphs. ``graph_algos`` and
``extract`` are sequential oracles for the north-rule extensions (connected
components, label propagation, triangle counting, HTML text/href
extraction) which have no reference counterpart.
"""

from .pagerank import pagerank  # noqa: F401
from .graph_algos import (  # noqa: F401
    connected_components,
    label_propagation,
    triangle_count,
)
from .extract import extract_text, extract_hrefs  # noqa: F401
