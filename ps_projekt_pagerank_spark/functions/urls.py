"""URL canonicalization — the normalization pass every web-graph pipeline
runs before building the url dictionary, so that casing/port/fragment
variants of the same page collapse to one node (otherwise the link graph
fragments and PageRank mass splits across aliases).

Pure built-in column expressions (regexp_extract / lower / substring —
all JVM-side, whole-stage-codegen friendly), and every step is plain
POSIX-regex string surgery, so a DuckDB twin reproduces the output
byte-for-byte. Normalization steps, in order:

1. strip the fragment (``#...`` — client-side only, never a distinct page)
2. lowercase the scheme and authority (RFC 3986 §6.2.2.1: both are
   case-insensitive; paths are NOT touched — they are case-sensitive)
3. drop explicit default ports (``:80`` for http, ``:443`` for https)
4. give authority-only URLs the root path (``http://a.test`` →
   ``http://a.test/``)

URLs with no ``scheme://authority`` prefix (relative hrefs) pass through
with only the fragment stripped — resolution against a base URL is the
extractor's job, not the normalizer's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREFIX = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules."""
    u = F.regexp_replace(url, "#.*", "")  # 1. fragment
    pre = F.regexp_extract(u, _PREFIX, 1)  # scheme://authority (or '')
    rest = F.substring(u, F.length(pre) + 1, 1 << 20)
    pre = F.lower(pre)  # 2. scheme+authority casing
    pre = F.when(  # 3. default ports
        pre.startswith("http://"), F.regexp_replace(pre, ":80$", "")
    ).when(
        pre.startswith("https://"), F.regexp_replace(pre, ":443$", "")
    ).otherwise(pre)
    rest = F.when(  # 4. root path
        (pre != "") & (rest == ""), F.lit("/")
    ).otherwise(rest)
    return F.concat(pre, rest)


def normalize_url_sql(expr: str) -> str:
    """The DuckDB twin of ``normalize_url`` over SQL expression ``expr`` —
    identical step order, identical regexes."""
    u = f"regexp_replace({expr}, '#.*', '')"
    pre0 = f"regexp_extract({u}, '{_PREFIX}', 1)"
    rest0 = f"substr({u}, length({pre0}) + 1)"
    pre1 = f"lower({pre0})"
    pre = (
        f"(CASE WHEN {pre1} LIKE 'http://%' "
        f"THEN regexp_replace({pre1}, ':80$', '') "
        f"WHEN {pre1} LIKE 'https://%' "
        f"THEN regexp_replace({pre1}, ':443$', '') ELSE {pre1} END)"
    )
    rest = (
        f"(CASE WHEN {pre} <> '' AND {rest0} = '' THEN '/' "
        f"ELSE {rest0} END)"
    )
    return f"({pre} || {rest})"


def resolve_redirects(
    redirects: "DataFrame", max_rounds: int = 32
) -> "DataFrame":
    """(src, final) — follow redirect chains to their terminal target by
    POINTER DOUBLING: each round replaces every mapping src→t with
    src→(t's mapping, if t itself redirects), so chain length halves...
    no — DOUBLES in coverage: after r rounds every chain up to 2^r hops
    is fully resolved. O(log max-chain) rounds instead of O(max-chain) —
    the difference between 5 and 40 shuffles on pathological chains, and
    the same primitive Iceberg-scale dedup uses for union-find hooks.

    Input is a mapping table (src, dst) with at most one dst per src
    (duplicate rows collapse; CONFLICTING dsts for one src raise).
    Self-redirects (src == dst) are dropped up front — a page that
    redirects to itself is terminal by definition, and keeping the row
    would make the doubling oscillate forever. Members of longer cycles
    (a→b→a) never reach a terminal node: they are EXCLUDED from the
    output, exactly matching resolve_redirects_sql's terminal-node
    filter (the recursive twin only emits rows whose walk ends at a
    non-redirecting node).

    Scale: per round one self-join of the |R|-row mapping on the target
    key + one fixpoint count; state never exceeds the input mapping.
    Convergence: the non-terminal row count strictly decreases every
    round on acyclic input (the doubling at least halves the deepest
    remaining distance), so a PLATEAU in that count is a proof that only
    cycle members remain and the loop stops early instead of burning all
    max_rounds (ADVICE r3).
    """
    from pyspark.sql import functions as F

    m = (
        redirects.select("src", "dst")
        .distinct()
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    dup = (
        m.groupBy("src").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    )
    if not dup.isEmpty():
        raise ValueError(
            "resolve_redirects: conflicting targets for at least one src"
        )
    cur = m.select("src", F.col("dst").alias("final"))
    prev_nonterm = None
    for _ in range(max_rounds):
        nxt_map = cur.select(
            F.col("src").alias("_t"), F.col("final").alias("_tf")
        )
        stepped = (
            cur.join(nxt_map, cur["final"] == nxt_map["_t"], "left")
            .select(
                "src",
                F.coalesce("_tf", F.col("final")).alias("final"),
                # a row is non-terminal iff its current final still has an
                # outgoing mapping — this is the loop variant, not "moved"
                (F.col("_tf").isNotNull()).cast("long").alias("_nonterm"),
            )
        )
        from pyspark.sql import Observation

        obs = Observation()
        stepped = stepped.observe(obs, F.sum("_nonterm").alias("nonterm"))
        cur = stepped.select("src", "final").localCheckpoint(eager=True)
        nonterm = int(obs.get["nonterm"] or 0)
        if nonterm == 0 or nonterm == prev_nonterm:
            break
        prev_nonterm = nonterm
    # drop cycle members (their final still redirects) — matches the SQL
    # twin's NOT EXISTS terminal filter; a no-op on acyclic input
    return cur.join(
        m.select(F.col("src").alias("final")).distinct(),
        "final",
        "left_anti",
    ).select("src", "final")


def resolve_redirects_sql(redirects_sql: str) -> str:
    """DuckDB twin — recursive single-step following (the closed form the
    doubling must land on): final(src) = the first reachable node with no
    outgoing mapping. Assumes acyclic chains (the gate fixture is)."""
    return (
        f"WITH RECURSIVE m AS (SELECT DISTINCT src, dst FROM "
        f"({redirects_sql})), "
        "walk(src, cur) AS (SELECT src, dst FROM m "
        "UNION ALL SELECT w.src, m.dst FROM walk w JOIN m ON w.cur = m.src) "
        "SELECT src, cur AS final FROM walk w "
        "WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.src = w.cur)"
    )


def url_spam_features(urls, url_col: str = "url"):
    """Per-url crawl-prioritization features + a spam-prior score.

    The classic URL-only spam/quality signals (Fetterly et al. 2004;
    Ntoulas et al. 2006 — detectable before fetching, which is why
    frontiers use them): length, path depth, digit density, query-param
    count, subdomain depth, hyphen count, and session-id markers.
    ``spam_score`` (0-7) counts exceeded thresholds; a frontier demotes
    high scores rather than dropping them (priors, not verdicts).

    All JVM-side regexp/length algebra — one projection, no shuffle, no
    Python; DuckDB-twinnable (its regexp_replace needs the 'g' flag,
    Spark's is global by default).
    """
    from pyspark.sql import functions as F

    u = F.col(url_col)

    def count_ch(col, pattern):
        return F.length(col) - F.length(F.regexp_replace(col, pattern, ""))

    host = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    url_len = F.length(u)
    path_depth = count_ch(path, "/")
    n_digits = count_ch(u, "[0-9]")
    n_params = F.when(query == "", F.lit(0)).otherwise(
        count_ch(query, "&") + 1
    )
    subdomain_depth = count_ch(host, r"\.")
    n_hyphens = count_ch(u, "-")
    has_session = u.rlike("(?i)(phpsessid|jsessionid|sessionid|[?&]sid=)")
    digit_ratio = F.round(
        n_digits.cast("double") / url_len.cast("double"), 6
    )
    flags = [
        path_depth >= 6,
        digit_ratio > 0.2,
        n_params >= 3,
        has_session,
        subdomain_depth >= 3,
        n_hyphens >= 4,
        url_len >= 80,
    ]
    score = None
    for f in flags:
        term = f.cast("int")
        score = term if score is None else score + term
    return urls.select(
        u.alias("url"),
        url_len.cast("long").alias("url_len"),
        path_depth.cast("long").alias("path_depth"),
        n_digits.cast("long").alias("n_digits"),
        digit_ratio.alias("digit_ratio"),
        n_params.cast("long").alias("n_params"),
        subdomain_depth.cast("long").alias("subdomain_depth"),
        n_hyphens.cast("long").alias("n_hyphens"),
        has_session.alias("has_session"),
        score.cast("long").alias("spam_score"),
    )


def url_spam_features_sql(urls_sql: str) -> str:
    """ANSI twin of url_spam_features over a (url) relation."""
    return (
        f"WITH u AS ({urls_sql}), "
        "f AS (SELECT url, "
        "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) "
        "AS host, "
        "regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path, "
        "regexp_extract(url, '\\?([^#]*)', 1) AS query FROM u), "
        "g AS (SELECT url, CAST(length(url) AS BIGINT) AS url_len, "
        "CAST(length(path) - length(regexp_replace(path, '/', '', 'g')) "
        "AS BIGINT) AS path_depth, "
        "CAST(length(url) - length(regexp_replace(url, '[0-9]', '', 'g')) "
        "AS BIGINT) AS n_digits, "
        "CASE WHEN query = '' THEN CAST(0 AS BIGINT) ELSE "
        "CAST(length(query) - length(regexp_replace(query, '&', '', 'g')) "
        "+ 1 AS BIGINT) END AS n_params, "
        "CAST(length(host) - length(regexp_replace(host, '\\.', '', 'g')) "
        "AS BIGINT) AS subdomain_depth, "
        "CAST(length(url) - length(regexp_replace(url, '-', '', 'g')) "
        "AS BIGINT) AS n_hyphens, "
        "regexp_matches(url, "
        "'(?i)(phpsessid|jsessionid|sessionid|[?&]sid=)') AS has_session "
        "FROM f) "
        "SELECT url, url_len, path_depth, n_digits, "
        "round(CAST(n_digits AS DOUBLE) / CAST(url_len AS DOUBLE), 6) "
        "AS digit_ratio, n_params, subdomain_depth, n_hyphens, "
        "has_session, CAST("
        "(CASE WHEN path_depth >= 6 THEN 1 ELSE 0 END) + "
        "(CASE WHEN round(CAST(n_digits AS DOUBLE) / "
        "CAST(url_len AS DOUBLE), 6) > 0.2 THEN 1 ELSE 0 END) + "
        "(CASE WHEN n_params >= 3 THEN 1 ELSE 0 END) + "
        "(CASE WHEN has_session THEN 1 ELSE 0 END) + "
        "(CASE WHEN subdomain_depth >= 3 THEN 1 ELSE 0 END) + "
        "(CASE WHEN n_hyphens >= 4 THEN 1 ELSE 0 END) + "
        "(CASE WHEN url_len >= 80 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS spam_score FROM g"
    )
