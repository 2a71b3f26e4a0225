"""Sitemap → frontier plan: discovery to fetch order in one plan.

Composes three engine pieces a crawler runs back-to-back:
``functions.sitemaps.parse_sitemaps`` (what each host advertises),
``functions.urls.url_spam_features`` (the pre-fetch quality prior), and
a per-host politeness schedule (one fetch batch per round per host, the
same contract as ``operators.hostgraph.crawl_schedule``). The output is
the work list a fetch fleet consumes: (host, url, round, slot).

Ordering within a host is quality-first and fully deterministic:
(spam_score asc, priority desc nulls-last, url asc) — advertise-priority
breaks ties among equally-clean urls, and the url string breaks the
rest. URLs above ``max_spam_score`` are cut, not demoted (the frontier
analogue of the budget cut in the crawl planner).

Scale shape: sitemap parse is a narrow explode; features are one
projection; the schedule is ONE window partitioned by host (never
global — hosts are the parallel unit, the partitionless-window grep
stays clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.sitemaps import parse_sitemaps
from ps_projekt_pagerank_spark.functions.urls import url_spam_features


def sitemap_frontier_plan(
    sitemaps: DataFrame,
    urls_per_round: int = 4,
    max_spam_score: int = 2,
) -> DataFrame:
    """(host, url, spam_score, round BIGINT, slot BIGINT) — the per-host
    fetch schedule over every sitemap-advertised url that clears the
    spam-prior cut."""
    if urls_per_round < 1:
        raise ValueError(
            f"urls_per_round must be >= 1, got {urls_per_round}"
        )
    parsed = parse_sitemaps(sitemaps)
    # a URL may legally appear in several of a host's sitemaps — dedup
    # the feature side (else the loc==url join fans out n×n) and the
    # candidate set (max priority across listings, deterministic), so a
    # repeated listing never claims extra schedule slots
    feats = url_spam_features(
        parsed.select(F.col("loc").alias("url")).distinct()
    ).select("url", "spam_score")
    cand = (
        parsed.join(feats, parsed["loc"] == feats["url"])
        .where(F.col("spam_score") <= max_spam_score)
        .select("host", F.col("loc").alias("url"), "spam_score", "priority")
        .groupBy("host", "url", "spam_score")
        .agg(F.max("priority").alias("priority"))
    )
    w = Window.partitionBy("host").orderBy(
        F.asc("spam_score"),
        F.desc_nulls_last("priority"),
        F.asc("url"),
    )
    rn = F.row_number().over(w).cast("long") - 1
    return cand.select(
        "host",
        "url",
        "spam_score",
        (rn / urls_per_round).cast("long").alias("round"),
        (rn % urls_per_round).alias("slot"),
    )


def sitemap_frontier_plan_sql(
    parsed_sql: str,
    urls_per_round: int = 4,
    max_spam_score: int = 2,
) -> str:
    """ANSI twin over a pre-parsed (host, loc, lastmod, changefreq,
    priority) relation (the sitemap XML never crosses engines)."""
    from ps_projekt_pagerank_spark.functions.urls import (
        url_spam_features_sql,
    )

    feats = url_spam_features_sql(
        f"SELECT DISTINCT loc AS url FROM ({parsed_sql})"
    )
    return (
        f"WITH p AS ({parsed_sql}), "
        f"f AS (SELECT url, spam_score FROM ({feats})), "
        "cand AS (SELECT p.host, p.loc AS url, f.spam_score, "
        "max(p.priority) AS priority "
        "FROM p JOIN f ON f.url = p.loc "
        f"WHERE f.spam_score <= {int(max_spam_score)} "
        "GROUP BY p.host, p.loc, f.spam_score), "
        "sched AS (SELECT host, url, spam_score, "
        "row_number() OVER (PARTITION BY host ORDER BY spam_score ASC, "
        "priority DESC NULLS LAST, url ASC) - 1 AS rn FROM cand) "
        f"SELECT host, url, spam_score, rn // {int(urls_per_round)} "
        f"AS round, rn % {int(urls_per_round)} AS slot FROM sched"
    )
