"""Model-based quality scoring with the hashing trick (north-rule /
training-pipeline extension) — the fastText-shaped linear classifier
every production corpus filter ends up running after the heuristic
stages: hash each token into a D-dim feature space, dot with a weight
vector, squash, threshold.

The interesting engineering question at 100 TB is not the model (a
linear scorer is one explode + one hash + one agg) but DETERMINISM: a
real deployment broadcasts a trained weight vector; this module derives
the weights from md5 of the feature index so tests and the DuckDB twin
replay bit-for-bit with no artifact file, while keeping the exact
compute shape of the real thing (swap `_weight_of` for a broadcast-join
against a trained table and nothing else changes).

Engine-exact by the repo's integer discipline: weights are INTEGER
milliunits in [-1000, 1000] (md5-derived), the per-document feature dot
product is an exact BIGINT sum (order-independent — no float-association
drift between engines), and the only floating-point ops are one division
(score = Σw / (1000·n_tokens)) and the rational squash
p = 0.5 + s/(2·(1+|s|)) — the "fast sigmoid", chosen over 1/(1+e^-s)
because exp() differs across libm implementations and this pipeline
refuses engine-divergent math in gated paths.

Scale: explode → two md5 hashes → one hash agg per doc_id. All JVM
built-ins, map-side combinable, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 1024


def _feature_of(tok, dim: int):
    """md5-derived feature index in [0, dim)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim


def _weight_of(feat):
    """md5-derived integer milliweight in [-1000, 1000]."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w#"), feat.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )


def hashed_linear_score(
    docs: DataFrame, dim: int = DEFAULT_DIM, threshold: float = 0.5
) -> DataFrame:
    """(doc_id, n_tokens BIGINT, weight_sum BIGINT, score DOUBLE,
    prob DOUBLE, keep BOOLEAN) — hashed bag-of-words linear quality
    score per document. ``weight_sum`` is the exact integer dot product;
    score = weight_sum / (1000·n_tokens) (0.0 for token-less docs);
    prob = 0.5 + score/(2·(1+|score|)); keep = prob > threshold (strict,
    so an empty document's neutral 0.5 never passes a 0.5 threshold)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    feat = _feature_of(F.col("tok"), dim)
    scored = (
        toks.select("doc_id", _weight_of(feat).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w").alias("weight_sum"),
        )
    )
    # left-join back so token-less documents still get a (neutral) row
    base = docs.select("doc_id").distinct()
    j = base.join(scored, "doc_id", "left")
    n = F.coalesce(F.col("n_tokens"), F.lit(0))
    ws = F.coalesce(F.col("weight_sum"), F.lit(0))
    score = F.when(n == 0, F.lit(0.0)).otherwise(
        ws.cast("double") / (F.lit(1000.0) * n.cast("double"))
    )
    prob = F.lit(0.5) + score / (F.lit(2.0) * (F.lit(1.0) + F.abs(score)))
    return j.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        ws.cast("long").alias("weight_sum"),
        score.alias("score"),
        prob.alias("prob"),
        (prob > F.lit(threshold)).alias("keep"),
    )


def hashed_linear_score_sql(
    docs_sql: str, dim: int = DEFAULT_DIM, threshold: float = 0.5
) -> str:
    """DuckDB twin — identical md5 feature hash, integer milliweights,
    exact BIGINT dot product, single division, rational squash.
    ``docs_sql`` must yield (doc_id, text)."""
    feat = f"(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {dim})"
    w = (
        f"(CAST('0x' || substr(md5('w#' || CAST({feat} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % 2001 - 1000)"
    )
    return (
        f"WITH docs AS ({docs_sql}), "
        "toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) "
        "AS tok FROM docs), "
        f"scored AS (SELECT doc_id, count(*) AS n_tokens, sum({w}) AS ws "
        "FROM toks WHERE tok <> '' GROUP BY doc_id), "
        "base AS (SELECT DISTINCT doc_id FROM docs), "
        "j AS (SELECT base.doc_id, coalesce(n_tokens, 0) AS n_tokens, "
        "coalesce(ws, 0) AS ws FROM base LEFT JOIN scored "
        "ON base.doc_id = scored.doc_id), "
        "sc AS (SELECT doc_id, n_tokens, ws, CASE WHEN n_tokens = 0 "
        "THEN CAST(0.0 AS DOUBLE) ELSE CAST(ws AS DOUBLE) / "
        "(1000.0 * CAST(n_tokens AS DOUBLE)) END AS score FROM j) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(ws AS BIGINT) AS weight_sum, score, "
        "0.5 + score / (2.0 * (1.0 + abs(score))) AS prob, "
        f"(0.5 + score / (2.0 * (1.0 + abs(score)))) > {threshold!r} AS keep "
        "FROM sc"
    )
