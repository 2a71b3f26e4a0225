"""Windowed event aggregation — batch and streaming forms — plus stateful
streaming dedup.

``windowed_event_agg`` is the batch DataFrame form (5-minute tumbling
windows keyed by epoch bucket so the DuckDB oracle agrees exactly);
``stream_windowed_event_agg`` is the same logical query as a Structured
Streaming job with a watermark for late data, driven to completion in
tests via the memory sink + processAllAvailable (no external bus in the
sandbox; on a cluster the source/sink become Kafka/Iceberg).
``stream_dedup_first_seen`` is the stateful-streaming form of exact dedup:
first occurrence per key wins, state bounded by the watermark horizon —
the streaming twin of operators.dedup.exact_duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW_SECONDS = 300


def windowed_event_agg(events: DataFrame) -> DataFrame:
    """(window_start BIGINT epoch-secs, event_type, n_events, sum_value)."""
    bucket = (
        (F.unix_timestamp("ts").cast("long") / WINDOW_SECONDS).cast("long")
        * WINDOW_SECONDS
    )
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def stream_windowed_event_agg(
    spark: SparkSession, parquet_dir: str, queryName: str = "events_agg"
) -> DataFrame:
    """Run the same aggregation as a streaming query over the parquet dir
    and return the completed result from the memory sink."""
    schema = spark.read.parquet(parquet_dir).schema
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


SESSION_GAP = "30 minutes"


def sessionized(events: DataFrame) -> DataFrame:
    """(user_id, session_start BIGINT, n_events, sum_value) — gap-based
    session windows: events of a user belong to one session while each gap
    is at most 30 minutes (Spark's session_window merges gap <= 30m; only a
    strictly larger gap splits — the SQL oracle's islands condition uses
    > gap for a new session to match exactly). Works unchanged as a streaming agg with a watermark."""
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start"))
            .cast("long")
            .alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_first_seen(
    spark: SparkSession,
    parquet_dir: str,
    key_cols: list[str],
    queryName: str = "events_dedup",
) -> DataFrame:
    """Streaming exact-dedup: emit only the first event per key.

    ``dropDuplicates`` over a keyed stream keeps per-key state in the
    state store; the watermark bounds that state (keys older than the
    horizon are evicted — at web scale this is what keeps a dedup over an
    unbounded crawl feed finite). Returns the completed memory-sink result
    for the bounded test corpus."""
    schema = spark.read.parquet(parquet_dir).schema
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(key_cols)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


TRENDING_WINDOW_SECONDS = 3600


def trending_event_types(events: DataFrame, k: int = 3) -> DataFrame:
    """(window_start BIGINT epoch-secs, event_type, n_events,
    rank_in_group) — the top-``k`` event types per tumbling hour: the
    "what's trending" dashboard query. Counts are exact; ranking ties
    break by event_type ascending (engine-exact ordering on integers +
    strings).

    Scale: one windowed hash agg, then ONE window partitioned by the
    time bucket — each partition is a single hour's type table (tiny),
    never a global sort.
    """
    from ps_projekt_pagerank_spark.operators.sampling import top_k_per_group

    bucket = (
        (F.unix_timestamp("ts").cast("long") / TRENDING_WINDOW_SECONDS)
        .cast("long")
        * TRENDING_WINDOW_SECONDS
    )
    counts = events.groupBy(
        bucket.alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    return top_k_per_group(
        counts, "window_start", "n_events", k, "event_type"
    )


def stream_trending_event_types(
    spark: SparkSession,
    parquet_dir: str,
    k: int = 3,
    queryName: str = "events_trending",
) -> DataFrame:
    """Streaming variant: the windowed counts run as a watermark-bounded
    streaming aggregation; the per-window top-k runs on the completed
    memory-sink table (in production the sink is a table the dashboard
    ranks at read time — ranking inside the stream would need complete-
    mode state for every window ever seen)."""
    from ps_projekt_pagerank_spark.operators.sampling import top_k_per_group

    schema = spark.read.parquet(parquet_dir).schema
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("window.start").cast("long").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return top_k_per_group(
        spark.sql(f"SELECT * FROM {queryName}"),
        "window_start",
        "n_events",
        k,
        "event_type",
    )
