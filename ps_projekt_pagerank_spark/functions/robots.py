"""robots.txt parsing and crawl-permission verdicts.

The politeness layer of the crawl stack (REP, RFC 9309): parse each
host's robots.txt into (agent, allow/disallow, path-prefix) rules, then
decide per URL whether a given agent may fetch it — most-specific
(longest) path prefix wins, Allow beats Disallow on ties, and an exact
user-agent group shadows the ``*`` group entirely (RFC 9309 §2.2.1: a
crawler obeys the most specific matching group ONLY).

Documented simplifications (each a deterministic subset of the RFC):
- a rule line's group is the NEAREST User-agent line above it (consecutive
  UA lines sharing one group collapse to the last one);
- no ``$`` / ``*`` wildcards inside paths — plain prefix match;
- empty-path rules (``Disallow:`` = allow everything) are dropped.

Everything is string ops on line positions — both engines replay the
parse bit-for-bit (the chr(10) line-explode idiom of the C4 cleaner).
Scale: robots files are tiny and per-host; every join here is keyed by
host and the verdict window partitions by URL — nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"


def robots_rules(robots: DataFrame) -> DataFrame:
    """(host, agent, rule, path, pos) from (host, robots_txt).

    rule ∈ {'allow', 'disallow'}; agent is lowercased; pos is the rule's
    line number (unique per host — the deterministic tiebreak downstream).
    Comments (#…) are stripped, directives are case-insensitive, paths
    are case-sensitive, malformed lines are ignored.
    """
    lines = robots.select(
        "host", F.posexplode(F.split("robots_txt", "\n")).alias("pos", "raw")
    )
    clean = lines.select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("l"),
    ).where(F.col("l") != "")
    low = F.lower(F.col("l"))
    val = F.trim(F.expr("substring(l, instr(l, ':') + 1)"))
    kind = (
        F.when(low.rlike("^user-agent\\s*:"), F.lit("ua"))
        .when(low.rlike("^allow\\s*:"), F.lit("allow"))
        .when(low.rlike("^disallow\\s*:"), F.lit("disallow"))
    )
    tagged = clean.select(
        "host", "pos", kind.alias("kind"), val.alias("val")
    ).where(F.col("kind").isNotNull())
    uas = tagged.where(F.col("kind") == "ua").select(
        "host", F.col("pos").alias("uapos"), F.lower("val").alias("agent")
    )
    rules = tagged.where(
        (F.col("kind") != "ua") & (F.col("val") != "")
    ).select("host", "pos", F.col("kind").alias("rule"), F.col("val").alias("path"))
    # each rule belongs to the nearest UA line above it
    return (
        rules.join(uas, "host")
        .where(F.col("uapos") < F.col("pos"))
        .groupBy("host", "pos", "rule", "path")
        .agg(F.max_by("agent", "uapos").alias("agent"))
        .select("host", "agent", "rule", "path", "pos")
    )


def robots_rules_sql(robots_sql: str) -> str:
    """DuckDB twin of robots_rules — identical chr(10) line explode,
    comment strip, directive regexes, and nearest-UA-above arg_max."""
    return (
        f"WITH rb AS ({robots_sql}), "
        "rpx AS (SELECT host, string_split(robots_txt, chr(10)) AS parts "
        "FROM rb), "
        "rlx AS (SELECT host, parts, unnest(range(0, len(parts))) AS pos "
        "FROM rpx), "
        "rl AS (SELECT host, pos, "
        "trim(regexp_replace(parts[pos + 1], '#.*$', '')) AS l FROM rlx), "
        "rc AS (SELECT host, pos, l FROM rl WHERE l <> ''), "
        "tagged AS (SELECT host, pos, CASE "
        "WHEN regexp_matches(lower(l), '^user-agent\\s*:') THEN 'ua' "
        "WHEN regexp_matches(lower(l), '^allow\\s*:') THEN 'allow' "
        "WHEN regexp_matches(lower(l), '^disallow\\s*:') THEN 'disallow' "
        "END AS kind, trim(substr(l, strpos(l, ':') + 1)) AS val FROM rc), "
        "t2 AS (SELECT * FROM tagged WHERE kind IS NOT NULL), "
        "uas AS (SELECT host, pos AS uapos, lower(val) AS agent FROM t2 "
        "WHERE kind = 'ua'), "
        "rrules AS (SELECT host, pos, kind AS rule, val AS path FROM t2 "
        "WHERE kind <> 'ua' AND val <> '') "
        "SELECT r.host, arg_max(u.agent, u.uapos) AS agent, r.rule, "
        "r.path, CAST(r.pos AS INT) AS pos "
        "FROM rrules r JOIN uas u ON u.host = r.host AND u.uapos < r.pos "
        "GROUP BY r.host, r.pos, r.rule, r.path"
    )


def crawl_allowed_sql(urls_sql: str, robots_sql: str, agent: str = "*") -> str:
    """DuckDB twin of crawl_allowed over robots_rules_sql — same group
    shadowing, longest-prefix window, and default-allow left join."""
    agent = agent.lower()
    return (
        f"WITH uu AS (SELECT url, "
        f"regexp_extract(url, '{_HOST_RE}', 1) AS host, "
        f"coalesce(nullif(regexp_extract(url, '{_PATH_RE}', 1), ''), '/') "
        f"AS path FROM ({urls_sql})), "
        f"rules AS ({robots_rules_sql(robots_sql)}), "
        f"selr AS (SELECT host, rule, path AS rpath, pos, "
        f"CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END AS exact "
        f"FROM rules WHERE agent IN ('{agent}', '*')), "
        "hm AS (SELECT host, max(exact) AS hx FROM selr GROUP BY host), "
        "used AS (SELECT s.host, s.rule, s.rpath, s.pos FROM selr s "
        "JOIN hm ON hm.host = s.host AND s.exact = hm.hx), "
        "cand AS (SELECT u.url, r.rule, r.rpath, r.pos FROM uu u "
        "JOIN used r ON r.host = u.host AND starts_with(u.path, r.rpath)), "
        "best AS (SELECT url, rule AS matched_rule, rpath AS matched_path "
        "FROM (SELECT url, rule, rpath, row_number() OVER (PARTITION BY "
        "url ORDER BY length(rpath) DESC, rule ASC, pos ASC) AS rn "
        "FROM cand) WHERE rn = 1) "
        "SELECT u.url, u.host, "
        "coalesce(b.matched_rule <> 'disallow', TRUE) AS allowed, "
        "b.matched_rule, b.matched_path "
        "FROM uu u LEFT JOIN best b ON b.url = u.url"
    )


def crawl_allowed(
    urls: DataFrame, rules: DataFrame, agent: str = "*"
) -> DataFrame:
    """(url, host, allowed, matched_rule, matched_path) — the per-URL
    fetch verdict for ``agent`` against ``robots_rules`` output.

    Group selection first (exact agent group shadows '*'), then the
    longest matching path prefix, Allow winning length ties ('allow' <
    'disallow' sorts first), rule position as the final tiebreak. URLs
    with no parseable host, no rules for their host, or no matching
    prefix default to allowed (RFC 9309 §2.3.1.2: absence of rules means
    unrestricted).
    """
    agent = agent.lower()
    u = urls.select(
        "url",
        F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract("url", _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    sel = rules.where(F.col("agent").isin([agent, "*"])).withColumn(
        "exact", (F.col("agent") == agent).cast("int")
    )
    hostmax = sel.groupBy("host").agg(F.max("exact").alias("hx"))
    used = (
        sel.join(hostmax, "host")
        .where(F.col("exact") == F.col("hx"))
        # the rule's path column would collide with the url path — rename
        .select("host", "rule", F.col("path").alias("rpath"), "pos")
    )
    cand = u.join(used, "host").where(F.expr("startswith(path, rpath)"))
    w = Window.partitionBy("url").orderBy(
        F.length("rpath").desc(), F.asc("rule"), F.asc("pos")
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "url",
            F.col("rule").alias("matched_rule"),
            F.col("rpath").alias("matched_path"),
        )
    )
    return u.join(best, "url", "left").select(
        "url",
        "host",
        F.coalesce(F.col("matched_rule") != "disallow", F.lit(True)).alias(
            "allowed"
        ),
        "matched_rule",
        "matched_path",
    )
