"""URL/host policy operators — the source-level hygiene stage of a
web-scale corpus build (C4/RefinedWeb-style): normalize each document's
URL to a canonical host, drop blocklisted hosts, and cap the number of
documents any single host may contribute (host-level dedup pressure —
one mis-crawled forum must not dominate a training mix).

All three operators are row-local JVM expressions plus at most one
window; regexes stay inside the RE2 ∩ java.util.regex common subset so
the DuckDB oracle evaluates them identically (same discipline as
operators.pii).

Scale shape at 100 TB:

* host extraction / normalization — pure projections, zero shuffle;
* blocklist — a broadcast anti-join against the (small) blocklist;
* per-host cap — ONE hash-partition shuffle on host for the ranking
  window; only (host, doc_id) longs shuffle when callers project
  early, never document text. A skewed mega-host is exactly what the
  cap neutralizes: its partition ranks then drops rows; AQE skew-join
  handling covers the interim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "normalize_url",
    "surt_key",
    "filter_blocklist",
    "cap_per_host",
    "parse_robots",
    "robots_filter",
    "robots_sitemaps",
    "robots_crawl_delay",
    "robots_path_regex",
]

# scheme://authority — authority ends at /, ?, or #
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def url_host(url: Column | str = "url") -> Column:
    """Canonical host of ``url``: the authority, lowercased, with any
    userinfo@, :port, and one leading ``www.`` stripped. Non-URLs
    (no scheme://authority) yield NULL — callers drop or quarantine
    them explicitly rather than grouping them under ''."""
    c = F.col(url) if isinstance(url, str) else url
    raw = F.regexp_extract(c, _HOST_RE, 1)
    host = F.lower(raw)
    host = F.regexp_replace(host, "^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, ":[0-9]+$", "")  # port
    host = F.regexp_replace(host, "^www\\.", "")
    return F.when(raw != "", host)


# tracking query parameters dropped by normalize_url (the C4/CCNet
# canonicalization list: ad-click + analytics campaign keys)
# bare "ref" is deliberately NOT here: unlike the write-only
# analytics keys it is routinely FUNCTIONAL (?ref=<branch> on code
# hosts) and dropping it merges genuinely distinct resources — a
# false merge poisons URL-level dedup where a missed referral tag
# only costs one duplicate fetch
_TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)="


def normalize_url(url: Column | str = "url") -> Column:
    """Canonical form of ``url`` for URL-level dedup — two crawls of
    the same resource must collide:

    * scheme and host lowercased; userinfo@ stripped; default ports
      (``:80`` http, ``:443`` https) stripped; one leading ``www.``
      stripped (matching :func:`url_host`);
    * fragment dropped;
    * empty path becomes ``/``;
    * tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``mc_eid``), remaining params SORTED, the
      ``?`` dropped when nothing survives.

    Non-URLs (no scheme://authority) yield NULL, like
    :func:`url_host`. Row-local expressions only — zero shuffle; the
    identical chain evaluates in DuckDB (RE2 ∩ java.regex subset).
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth_raw = F.regexp_extract(c, _HOST_RE, 1)
    host = F.regexp_replace(F.lower(auth_raw), "^[^@]*@", "")
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(c, r"^[^#?]*\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        (auth_raw != "") & (scheme != ""),
        F.concat(scheme, F.lit("://"), host, path, qpart),
    )


def surt_key(url: Column | str = "url") -> Column:
    """SURT urlkey (Sort-friendly URI Reordering Transform — the CDX
    index key convention) as a JVM-side projection: host lowercased,
    userinfo@ / :80 / :443 / one leading ``www.`` stripped, host
    components REVERSED comma-joined, then ``)/path?query`` with query
    params sorted. One host's captures sort adjacently and
    http/https/www variants collide — the crawl-level grouping key.

    Semantics-identical to the python-side ``xkit.warc.surt`` used by
    ``warc_cdx`` inside the archive parse stage (fuzz-asserted in
    tests); this column version is for corpora that already carry a
    ``url`` column. Non-URLs yield NULL. Pure row-local expressions —
    zero shuffle; the identical chain evaluates in DuckDB.
    """
    c = F.col(url) if isinstance(url, str) else url
    auth_raw = F.regexp_extract(c, _HOST_RE, 1)
    host = F.regexp_replace(F.lower(auth_raw), "^[^@]*@", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(c, r"^[^#?]*\?([^#]*)", 1)
    kept = F.array_sort(F.filter(F.split(query, "&"), lambda p: p != ""))
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(auth_raw != "", F.concat(rev, F.lit(")"), path, qpart))


def filter_blocklist(
    df: DataFrame, blocked_hosts: list[str], host_col: str = "host"
) -> DataFrame:
    """Drop rows whose host is on the blocklist (broadcast anti-join —
    blocklists are small even in production; a million-host list is a
    few MB)."""
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(h,) for h in blocked_hosts], f"{host_col} string"
    )
    return df.join(F.broadcast(bl), host_col, "left_anti")


def cap_per_host(
    df: DataFrame,
    cap: int,
    host_col: str = "host",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per host, by ascending ``order_col``
    (deterministic — re-runs keep the same survivors). Adds the
    1-based ``host_rank`` column so callers can audit what the cap
    dropped."""
    w = Window.partitionBy(host_col).orderBy(F.asc(order_col))
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= cap)
    )


# regex metacharacters escaped when compiling a robots path pattern;
# backslash must go FIRST (later escapes insert backslashes), '*' is
# excluded (it becomes '.*') and '$' is handled separately (special
# only as the final character per Google REP)
_ROBOTS_ESCAPE = ["\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def robots_path_regex(pattern: Column) -> Column:
    """Compile a robots.txt path pattern into an anchored regex column
    (Google REP: ``*`` matches any character run including ``/``;
    ``$`` anchors end-of-path when it is the LAST character, and is a
    literal octet anywhere else). The output stays inside the
    RE2 ∩ java.util.regex subset — only literal escapes, ``.*``, and
    the ``^``/``$`` anchors — so the DuckDB oracle compiles the same
    pattern with the same string-replace chain."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    for ch in _ROBOTS_ESCAPE:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def _robots_kv_lines(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """Shared robots.txt line lexer: one row per directive line as
    ``(host, line_idx, key, value)`` — ``#`` comments stripped, key
    lowercased, the value keeping its own colons (sitemap URLs contain
    ``://``). Both parse_robots and robots_sitemaps consume this, so a
    lexing fix (e.g. CRLF handling) lands in exactly one place."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*", ""))
    return lines.select(
        "host",
        "line_idx",
        F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key") != "")


def _robots_star_kv(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """Directive lines belonging to the ``*`` user-agent's group(s):
    the Google-REP group machinery (consecutive User-agent lines form
    ONE group — a per-host running sum over line index, the only
    shuffle) shared by parse_robots and robots_crawl_delay."""
    kv = _robots_kv_lines(df, host_col, text_col)
    w = Window.partitionBy("host").orderBy("line_idx")
    is_ua = F.col("key") == "user-agent"
    prev_ua = F.lag(is_ua, 1, False).over(w)
    grouped = kv.withColumn(
        "group_id",
        F.sum((is_ua & ~prev_ua).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    star_groups = (
        grouped.where(is_ua & (F.col("value") == "*"))
        .select("host", "group_id")
        .distinct()
    )
    return grouped.join(star_groups, ["host", "group_id"])


def robots_crawl_delay(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``(host, crawl_delay)`` from the ``*`` group's ``Crawl-delay:``
    lines — the politeness interval a scheduler feeds into per-host
    rate limiting (Bing/Yandex semantics; Google ignores the
    directive, so emitting it is harmless there). Non-numeric values
    drop; when several values are in scope the most CONSERVATIVE
    (largest) delay wins, so a crawler never exceeds any stated limit.
    Same single host-keyed shuffle as parse_robots (shared group
    machinery)."""
    star = _robots_star_kv(df, host_col, text_col)
    # try_cast, not cast: ANSI mode (Spark 4 default) RAISES on a
    # non-numeric value — 'Crawl-delay: fast' must drop, not kill a job
    delays = star.where(F.col("key") == "crawl-delay").select(
        "host", F.col("value").try_cast("double").alias("crawl_delay")
    )
    return (
        delays.where(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse one robots.txt per host into ``(host, directive,
    path_prefix, path_regex)`` rules for the ``*`` user-agent.

    Subset implemented (the 1994 REP core, Google-REP group
    semantics): ``#`` comments stripped, blank lines ignored,
    consecutive ``User-agent`` lines form ONE group (a group
    containing ``*`` contributes its rules), ``Allow``/``Disallow``
    with a non-empty value become rules (an empty ``Disallow:`` means
    "allow everything" in REP — dropping it is equivalent here since
    no-match ⇒ allowed in :func:`robots_filter`). Google-REP wildcards
    are honored: ``*`` in a pattern matches any character run and a
    trailing ``$`` anchors end-of-path (``path_regex`` carries the
    compiled form; :func:`robots_path_regex` has the rules).

    Entirely window/filter expressions — the group structure is a
    per-host running sum over line index, so the only shuffle is one
    hash partition by host; robots files are KB-scale, so per-host
    line counts are tiny regardless of corpus size.
    """
    star = _robots_star_kv(df, host_col, text_col)
    rules = star.where(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    )
    return rules.select(
        "host",
        F.col("key").alias("directive"),
        F.col("value").alias("path_prefix"),
        robots_path_regex(F.col("value")).alias("path_regex"),
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``(host, sitemap_url)`` for every ``Sitemap:`` directive in a
    robots.txt — per the protocol these are GLOBAL (outside any
    user-agent group, applying regardless of agent), so unlike
    :func:`parse_robots` no group machinery is needed: a pure
    line-split projection, zero shuffle. Duplicate directives dedupe.
    Feeds :func:`xhtmlkit_spark.operators.harvest_stage.sitemap_entries`
    — robots.txt is how a crawler DISCOVERS the sitemap."""
    return (
        _robots_kv_lines(df, host_col, text_col)
        .where((F.col("key") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    key_col: str = "doc_id",
) -> DataFrame:
    """Google-REP decision per row: among the host's rules whose
    pattern matches the row's path (wildcards compiled by
    :func:`robots_path_regex`), the LONGEST pattern — most specific by
    octet length, Google's rule — wins; a length tie goes to
    ``allow``, then to the lexically-smallest pattern (with wildcards,
    two DISTINCT same-length patterns can both match, so the final
    tie-break must be deterministic for cross-engine equality); no
    matching rule (or no rules for the host at all) means allowed.
    Adds ``allowed`` plus the winning
    ``matched_directive``/``matched_prefix`` (NULL when nothing
    matched) for auditability.

    Shape: one equi-join on host (the regex test rides the join
    condition, so unmatched rows survive as NULL — a row is never
    lost), then a per-row window over its handful of matched rules.
    Rules-per-host is robots-file-bounded (~KBs), so the fan-out is a
    small constant; only (key, host, path) plus rule strings shuffle.
    """
    r = rules.select(
        F.col("host").alias("__r_host"),
        F.col("directive").alias("__r_dir"),
        F.col("path_prefix").alias("__r_prefix"),
        F.col("path_regex").alias("__r_regex"),
    )
    cond = (F.col(host_col) == F.col("__r_host")) & F.regexp_like(
        F.col(path_col), F.col("__r_regex")
    )
    j = df.join(r, cond, "left")
    w = Window.partitionBy(key_col).orderBy(
        F.length("__r_prefix").desc(),
        (F.col("__r_dir") == "allow").desc(),
        F.asc("__r_prefix"),
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *df.columns,
            (
                F.col("__r_prefix").isNull() | (F.col("__r_dir") == "allow")
            ).alias("allowed"),
            F.col("__r_dir").alias("matched_directive"),
            F.col("__r_prefix").alias("matched_prefix"),
        )
    )
