"""Deterministic test fixtures (FIXTURES.md).

The three graphs committed in the reference repo (``web-Google/*.txt``,
reader semantics at reference ``src/Graph.cpp:32-101``) are inlined here as
edge lists **in file order** — order matters because the reference assigns
dense ids by first appearance and our pages generator emits hrefs in edge
order. Duplicates and self-loops would be preserved (multigraph semantics,
reference ``src/Graph.cpp:94-97``); these fixtures happen to contain none.

Also: the deterministic ``tripled()`` scale-up generator (reference
``prepleti.cpp:44-74``) and the synthetic ``pages`` row generator whose html
encodes a fixture topology (so extraction output is checkable against the
known graph).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

# --- fixture edge lists (FIXTURES.md §3, reference web-Google/*.txt) -------

SINK_TEST_EDGES: list[tuple[int, int]] = [(0, 1)]

MINI_EDGES: list[tuple[int, int]] = [
    (0, 3), (0, 2), (0, 4), (0, 5),
    (3, 0), (3, 7), (3, 8), (3, 6), (3, 1), (3, 4), (3, 5),
    (2, 0), (2, 1), (2, 4), (2, 5),
    (4, 0), (4, 3), (4, 5),
    (5, 0), (5, 3), (5, 4), (5, 9),
]

SMALL_EDGES: list[tuple[int, int]] = [
    (0, 3), (0, 2), (0, 4), (0, 5),
    (3, 0), (3, 7), (3, 8), (3, 9), (3, 10), (3, 11), (3, 13), (3, 14),
    (3, 15), (3, 16), (3, 17), (3, 18), (3, 4), (3, 5),
    (2, 0), (2, 19), (2, 10), (2, 11), (2, 12), (2, 20), (2, 21), (2, 22),
    (2, 23), (2, 4), (2, 5),
    (4, 0), (4, 3), (4, 24), (4, 25), (4, 21), (4, 26), (4, 17), (4, 5),
    (5, 0), (5, 3), (5, 27), (5, 28), (5, 29), (5, 12), (5, 4),
    (1, 30), (1, 6), (1, 31), (1, 32), (1, 33), (1, 34), (1, 35), (1, 36),
    (1, 37), (1, 38),
    (6, 1), (6, 30), (6, 39), (6, 40), (6, 41), (6, 31), (6, 42), (6, 32),
    (6, 33), (6, 34), (6, 35), (6, 36),
]

FIXTURE_GRAPHS: dict[str, list[tuple[int, int]]] = {
    "sink-test": SINK_TEST_EDGES,
    "mini": MINI_EDGES,
    "small": SMALL_EDGES,
}

# golden iteration counts at the reference's delta=1e-16 (BASELINE.md)
GOLDEN_ITERATIONS_1E16 = {"sink-test": 44, "mini": 25, "small": 29}


def tripled(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Graph tripler (reference ``prepleti.cpp:44-74``).

    From edge set E with max id M emit E ∪ {(M+dst+1, src)} ∪
    {(M+src+1, M+dst)} — a deterministic 3x scale-up used for bench graphs.
    """
    m = max(max(s, d) for s, d in edges)
    out = list(edges)
    out += [(m + d + 1, s) for s, d in edges]
    out += [(m + s + 1, m + d) for s, d in edges]
    return out


def tripled_k(edges: list[tuple[int, int]], k: int) -> list[tuple[int, int]]:
    for _ in range(k):
        edges = tripled(edges)
    return edges


# --- synthetic pages rows (FIXTURES.md §1) ---------------------------------

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def node_url(node_id: int) -> str:
    return f"https://node{node_id}.example.test/"


def page_body_text(node_id: int, topology: str) -> str:
    return f"Page {node_id} of the {topology} fixture graph."


def page_html(node_id: int, out_edges: list[int], topology: str) -> bytes:
    """html with one <a href> per out-edge, in edge-list order."""
    links = "".join(
        f'<a href="{node_url(dst)}">link {k}</a>'
        for k, dst in enumerate(out_edges)
    )
    html = (
        f"<html><head><title>Page {node_id}</title></head>"
        f"<body><p>{page_body_text(node_id, topology)}</p>{links}</body></html>"
    )
    return html.encode("utf-8")


def pages_rows(topology: str) -> list[dict]:
    """One row per node of a fixture topology: url, warc_ts, html, text, lang.

    ``text`` is written from the same template the sequential extractor
    produces, so Spark-extracted text can be compared column-to-column
    byte-identically (north-rule invariant).
    """
    from .oracle.extract import extract_text

    edges = FIXTURE_GRAPHS[topology]
    node_ids: list[int] = []
    seen: set[int] = set()
    for s, d in edges:  # first-appearance order, like the reference reader
        for v in (s, d):
            if v not in seen:
                seen.add(v)
                node_ids.append(v)

    out_by_src: dict[int, list[int]] = {}
    for s, d in edges:
        out_by_src.setdefault(s, []).append(d)

    rows = []
    for nid in node_ids:
        html = page_html(nid, out_by_src.get(nid, []), topology)
        rows.append(
            {
                "url": node_url(nid),
                "warc_ts": _EPOCH + timedelta(seconds=nid),
                "html": html,
                "text": extract_text(html.decode("utf-8")),
                "lang": "en" if nid % 10 != 0 else "sl",
            }
        )
    return rows
