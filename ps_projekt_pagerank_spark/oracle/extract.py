"""Sequential reference HTML extractor (the byte-identical contract).

The reference repo ingests pre-extracted edge lists; the north rule extends
the pipeline upstream to Common-Crawl-style pages, requiring extracted
``text`` to be byte-identical per url against "a sequential reference
extractor" — this module is that extractor. It is deliberately small and
exactly specified so the vectorized Spark implementation
(ps_projekt_pagerank_spark.sources.extraction) can be verified
byte-for-byte against it:

- ``extract_hrefs``: every ``href="..."`` attribute value of an ``<a>`` tag,
  in document order, duplicates preserved (multigraph semantics).
- ``extract_text``: drop <script>/<style> elements including their content,
  strip all remaining tags, decode the five standard HTML entities,
  collapse every whitespace run to one space, strip ends.
"""

from __future__ import annotations

import re

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")
_AHREF = re.compile(r"<a\b[^>]*\bhref=\"([^\"]*)\"[^>]*>", re.IGNORECASE)

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; -> &lt; (single-pass semantics)
]


def extract_text(html: str) -> str:
    s = _SCRIPT_STYLE.sub(" ", html)
    s = _TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip()


def extract_hrefs(html: str) -> list[str]:
    return _AHREF.findall(html)
