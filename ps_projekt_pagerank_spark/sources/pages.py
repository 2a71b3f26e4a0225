"""Synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Generation is seed-free deterministic (pure function of node id + topology)
so Spark-side regeneration reproduces rows exactly. For fixtures the html
hrefs encode a known graph topology, making extraction output checkable
against the fixture edge list. ``write_pages_parquet`` materializes the
table as parquet (the Iceberg stand-in for this sandbox — scale deployments
would ``writeTo(catalog.table).append()`` instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..fixtures import pages_rows

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def fixture_pages(spark: SparkSession, topology: str) -> DataFrame:
    """pages DataFrame whose html encodes a fixture graph topology."""
    rows = pages_rows(topology)
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=PAGES_SCHEMA,
    )


def write_pages_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
