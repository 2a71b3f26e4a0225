"""WARC container build/parse (sources/warc.py).

The load-bearing claim is Content-Length framing: a payload that CONTAINS
the bytes "WARC/1.0\r\n" (a crawled page about warc files) must survive
the round trip — a marker-scanning splitter shears it.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.sources.warc import (
    build_warc_segments,
    parse_warc_segments,
    warc_roundtrip,
)

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("u1", dt.datetime(2024, 1, 1, 5, 0, 0, tzinfo=UTC),
         "<html><p>plain page</p></html>"),
        # adversarial payload: contains a fake record header AND the
        # \r\n\r\n separator — only length-framing parses this correctly
        ("u2", dt.datetime(2024, 1, 2, 6, 30, 0, tzinfo=UTC),
         "about warc:\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"),
        ("u3", dt.datetime(2024, 1, 3, 7, 0, 0, tzinfo=UTC), ""),  # empty payload
        ("u4", dt.datetime(2024, 1, 3, 8, 0, 0, tzinfo=UTC), "x" * 5000),
    ]
    return spark.createDataFrame(
        rows, "url STRING, warc_ts TIMESTAMP, html STRING"
    )


def test_roundtrip_exact(spark, pages):
    got = {
        r["url"]: r
        for r in warc_roundtrip(pages, segment_col=F.lit(0)).collect()
    }
    want = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        assert g["payload_text"] == w["html"], url
        assert g["content_length"] == len(w["html"].encode()), url
        assert g["warc_ts"] == w["warc_ts"], url  # both collected via Spark


def test_multi_segment_partition(spark, pages):
    segs = build_warc_segments(
        pages, segment_col=F.when(F.col("url") < "u3", 0).otherwise(1)
    )
    assert segs.count() == 2
    parsed = parse_warc_segments(segs)
    by_seg = {
        r["segment_id"]: r["n"]
        for r in parsed.groupBy("segment_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_seg == {0: 2, 1: 2}
    assert parsed.where(F.col("rec_type") != "response").count() == 0


def test_truncated_segment_raises(spark, pages):
    segs = build_warc_segments(pages, segment_col=F.lit(0))
    cut = segs.select(
        "segment_id",
        F.expr("substring(data, 1, octet_length(data) - 10)").alias("data"),
    )
    with pytest.raises(Exception, match="truncated|unterminated"):
        parse_warc_segments(cut).collect()
