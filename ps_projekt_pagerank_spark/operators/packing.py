"""Sequence packing — the concat-and-chunk layout an LLM trainer applies
to a cleaned corpus: token streams are concatenated in a deterministic
document order and cut into fixed-length training sequences; each
document therefore spans a contiguous range of sequence slots, and the
fraction of documents cut by a sequence boundary is the fragmentation
the packer wants to minimise.

The cumulative token offset is a global prefix sum over the document
order. A partitionless window would funnel the corpus through one task,
so the offsets reuse the distributed numbering trick from
``plans.positions``: range-partition on the order key, window-cumsum
locally per partition, add per-partition sums as offsets (one
|partitions|-row driver pass). Every heavy stage is parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_cumsum(
    df: DataFrame, order_col: str, val_col: str, out_col: str
) -> DataFrame:
    """df + ``out_col`` = exclusive prefix sum of ``val_col`` under
    ``order_col`` (distributed: range partition + local window + offsets)."""
    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    local = (
        df.repartitionByRange(p, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local_cum",
            F.sum(val_col)
            .over(Window.partitionBy("_pid").orderBy(order_col))
            .cast("long"),
        )
        .localCheckpoint(eager=True)  # pin range boundaries across jobs
    )
    parts = (
        local.groupBy("_pid")
        .agg(F.sum(val_col).cast("long").alias("s"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = [], 0
    for r in parts:
        offsets.append((int(r["_pid"]), acc))
        acc += int(r["s"])
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid INT, _off LONG")
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col, F.col("_off") + F.col("_local_cum") - F.col(val_col)
        )
        .drop("_pid", "_local_cum", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, start_tok, start_seq, end_seq, n_seqs) — the
    packing layout: tokens (single-space split) are concatenated in
    ``order_col`` order and cut every ``seq_len`` tokens; start_tok is
    the document's 0-based offset in the global token stream, and
    [start_seq, end_seq] the training sequences it lands in (n_seqs > 1
    means the document is cut by a boundary). Zero-token documents are
    assigned the sequence containing their offset with n_seqs = 0."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sized = docs.select(
        order_col,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    off = _global_cumsum(sized, order_col, "n_tokens", "start_tok")
    start_seq = F.floor(F.col("start_tok") / seq_len).cast("long")
    end_seq = F.floor(
        (F.col("start_tok") + F.col("n_tokens") - 1) / seq_len
    ).cast("long")
    return off.select(
        order_col,
        "n_tokens",
        "start_tok",
        start_seq.alias("start_seq"),
        F.when(F.col("n_tokens") > 0, end_seq)
        .otherwise(start_seq)
        .alias("end_seq"),
        F.when(F.col("n_tokens") > 0, end_seq - start_seq + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def packing_summary(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """One row: (total_tokens, n_docs, n_seqs, n_cut_docs, frag_rate,
    fill_rate) — corpus-level packing quality: n_seqs = ceil(total/L),
    frag_rate = fraction of docs cut by a boundary, fill_rate = mean
    occupancy of the emitted sequences (only the last is partial)."""
    spans = pack_sequences(docs, seq_len, text_col, order_col)
    return spans.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_docs"),
        F.ceil(F.sum("n_tokens") / F.lit(seq_len)).cast("long").alias(
            "n_seqs"
        ),
        F.sum((F.col("n_seqs") > 1).cast("long")).alias("n_cut_docs"),
    ).select(
        "total_tokens",
        "n_docs",
        "n_seqs",
        "n_cut_docs",
        F.round(
            F.col("n_cut_docs").cast("double") / F.col("n_docs"), 6
        ).alias("frag_rate"),
        F.round(
            F.col("total_tokens").cast("double")
            / (F.col("n_seqs") * seq_len),
            6,
        ).alias("fill_rate"),
    )


def pack_sequences_sql(
    docs_sql: str, seq_len: int, order_col: str = "doc_id"
) -> str:
    """DuckDB twin of pack_sequences — the oracle may use a plain window
    cumsum (single-node engine; the Spark side is the distributed one)."""
    L = int(seq_len)
    return (
        "WITH sized AS (SELECT " + order_col + ", "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
        f"FROM ({docs_sql})), "
        "off AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER ("
        f"ORDER BY {order_col} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING), 0) AS BIGINT) AS start_tok FROM sized) "
        f"SELECT {order_col}, n_tokens, start_tok, "
        f"CAST(floor(start_tok / {L}) AS BIGINT) AS start_seq, "
        "CASE WHEN n_tokens > 0 THEN CAST(floor((start_tok + n_tokens - 1) "
        f"/ {L}) AS BIGINT) ELSE CAST(floor(start_tok / {L}) AS BIGINT) "
        "END AS end_seq, "
        "CASE WHEN n_tokens > 0 THEN CAST(floor((start_tok + n_tokens - 1) "
        f"/ {L}) - floor(start_tok / {L}) + 1 AS BIGINT) ELSE 0 "
        "END AS n_seqs FROM off"
    )


def packing_summary_sql(
    docs_sql: str, seq_len: int, order_col: str = "doc_id"
) -> str:
    """DuckDB twin of packing_summary."""
    L = int(seq_len)
    spans = pack_sequences_sql(docs_sql, seq_len, order_col)
    return (
        f"WITH spans AS ({spans}) "
        "SELECT total_tokens, n_docs, n_seqs, n_cut_docs, "
        "round(CAST(n_cut_docs AS DOUBLE) / n_docs, 6) AS frag_rate, "
        f"round(CAST(total_tokens AS DOUBLE) / (n_seqs * {L}), 6) "
        "AS fill_rate FROM (SELECT "
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(ceil(sum(n_tokens) / {L}.0) AS BIGINT) AS n_seqs, "
        "CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_cut_docs FROM spans)"
    )
