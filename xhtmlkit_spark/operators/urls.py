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

__all__ = ["url_host", "filter_blocklist", "cap_per_host"]

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
