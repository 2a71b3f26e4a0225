"""WARC container build + parse — the Common Crawl ingestion shape.

The north-rule input is "Common-Crawl-style web pages"; Common Crawl's
on-disk container is WARC (ISO 28500): a sequential stream of records,
each an ASCII header block (``WARC/1.0`` version line + ``Name: value``
headers, terminated by CRLF CRLF) followed by exactly ``Content-Length``
payload octets and a CRLF CRLF record separator. The reference repo
ingests pre-extracted edge lists (``Graph.cpp:32-101``), so this stage —
like S4 extraction — has no reference counterpart; its contract is the
WARC spec plus the round-trip invariant (parse(build(pages)) == pages).

Scale shape: ONE ROW = ONE WARC FILE SEGMENT (real crawls ship ~1 GiB
``.warc.gz`` files; here a segment is the deterministic fixture analogue).
Segments are the unit of parallelism — a 100 TB crawl is ~10^5 segments
spread over executors, each parsed independently with zero shuffle. The
parser is ``mapInPandas`` over segment batches: per-segment sequential
scanning is inherent to the format (records are length-prefixed, so the
stream cannot be split mid-segment without an index), and one Python
iteration handles a whole multi-megabyte segment — this is Arrow-batched
coarse-grained work, not a per-row UDF on small rows.

Framing is by ``Content-Length``, never by searching for the next
``WARC/1.0`` marker — a payload that *contains* ``WARC/1.0\\r\\n`` bytes
(e.g. a crawled page ABOUT warc files) parses correctly; the regex-split
shortcut would shear such records (test_warc.py plants exactly that).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"

WARC_PARSED_SCHEMA = (
    "segment_id LONG, url STRING, rec_type STRING, warc_date STRING, "
    "content_length LONG, payload BINARY"
)


def warc_record_expr(url, warc_ts, payload):
    """One WARC/1.0 response record as a STRING Column (header block +
    payload + CRLF CRLF separator), built JVM-side from column
    expressions. ``payload`` must be a STRING column (fixture payloads
    are ASCII html; binary-unsafe only for the *builder* — the parser is
    byte-exact)."""
    date = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("Content-Type: text/html" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
        payload,
        F.lit(_CRLF + _CRLF),
    )


def build_warc_segments(
    pages: DataFrame,
    segment_col=None,
    payload_col: str = "html",
) -> DataFrame:
    """(segment_id LONG, data BINARY, n_records LONG) — serialize a
    pages(url, warc_ts, html, ...) table into WARC file segments.

    ``segment_col`` assigns each page to a segment (default: xxhash64 of
    url — uniform, shuffle-once). Records within a segment concatenate in
    (url, warc_date) sort order so the segment bytes are deterministic
    for any engine; at crawl scale the per-segment collect_list holds one
    WARC file's worth of records (the same memory a .warc writer buffers).
    """
    if segment_col is None:
        segment_col = F.pmod(F.xxhash64("url"), F.lit(64))
    rec = warc_record_expr(
        F.col("url"), F.col("warc_ts"), F.col(payload_col).cast("string")
    )
    date = F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return (
        pages.select(
            segment_col.cast("long").alias("segment_id"),
            F.struct(
                F.col("url"), date.alias("d"), rec.alias("rec")
            ).alias("r"),
        )
        .groupBy("segment_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.sort_array(F.collect_list("r")), lambda s: s["rec"])
            ).cast("binary").alias("data"),
            F.count("*").alias("n_records"),
        )
    )


def parse_warc_segments(segments: DataFrame) -> DataFrame:
    """(segment_id, url, rec_type, warc_date, content_length, payload) —
    one row per WARC record, parsed byte-exactly by Content-Length
    framing (never by scanning for the next version marker)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "segment_id": [], "url": [], "rec_type": [],
                "warc_date": [], "content_length": [], "payload": [],
            }
            for seg_id, blob in zip(pdf["segment_id"], pdf["data"]):
                buf = bytes(blob)
                pos, n = 0, len(buf)
                while pos < n:
                    hdr_end = buf.find(b"\r\n\r\n", pos)
                    if hdr_end < 0:
                        raise ValueError(
                            f"warc: unterminated header block, segment "
                            f"{seg_id} offset {pos}"
                        )
                    lines = buf[pos:hdr_end].split(b"\r\n")
                    if not lines[0].startswith(b"WARC/"):
                        raise ValueError(
                            f"warc: bad version line {lines[0]!r}, "
                            f"segment {seg_id} offset {pos}"
                        )
                    hdrs = {}
                    for ln in lines[1:]:
                        k, _, v = ln.partition(b":")
                        hdrs[k.strip().lower()] = v.strip()
                    clen = int(hdrs[b"content-length"])
                    body_start = hdr_end + 4
                    if body_start + clen > n:
                        raise ValueError(
                            f"warc: truncated payload, segment {seg_id} "
                            f"offset {pos}"
                        )
                    out["segment_id"].append(seg_id)
                    out["url"].append(
                        hdrs.get(b"warc-target-uri", b"").decode("utf-8")
                    )
                    out["rec_type"].append(
                        hdrs.get(b"warc-type", b"").decode("ascii")
                    )
                    out["warc_date"].append(
                        hdrs.get(b"warc-date", b"").decode("ascii")
                    )
                    out["content_length"].append(clen)
                    out["payload"].append(buf[body_start : body_start + clen])
                    pos = body_start + clen
                    if buf[pos : pos + 4] == b"\r\n\r\n":
                        pos += 4
            yield pd.DataFrame(out)

    return segments.mapInPandas(batches, schema=WARC_PARSED_SCHEMA)


def warc_roundtrip(pages: DataFrame, segment_col=None) -> DataFrame:
    """(url, warc_ts, content_length, payload_text) — build segments from
    a pages table, parse them back, and type the parsed records; the gate
    query proving parse(build(x)) == x on real byte framing."""
    parsed = parse_warc_segments(build_warc_segments(pages, segment_col))
    return parsed.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "warc_ts"
        ),
        "content_length",
        F.col("payload").cast("string").alias("payload_text"),
    )


def warc_segment_stats(pages: DataFrame, segment_col=None) -> DataFrame:
    """(segment_id, n_records, n_urls, payload_bytes) — per-segment crawl
    accounting off the parsed records (the fetch-manifest report a crawl
    coordinator reads)."""
    parsed = parse_warc_segments(build_warc_segments(pages, segment_col))
    return parsed.groupBy("segment_id").agg(
        F.count("*").alias("n_records"),
        F.countDistinct("url").alias("n_urls"),
        F.sum("content_length").alias("payload_bytes"),
    )
