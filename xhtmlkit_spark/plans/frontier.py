"""Crawl-frontier builder: harvested outlinks → the next crawl list.

The discovery side of a web-scale pipeline, composed from the
engine's own tiers the way production crawls chain them:

    corpus → doc_links (one Arrow parse pass, hrefs resolved)
           → canonical host + URL-level aggregation (dedupe)
           → blocklist anti-join
           → robots.txt allow/deny (Google-REP longest prefix)
           → per-host contribution cap
           → the frontier

Scale shape: the only document-sized pass is the harvest stage; from
there on everything shuffles (url, host, counts) tuples — one hash
aggregation on url for the dedupe, one host-keyed join for robots,
one host window for the cap. A mega-host exploding the frontier is
exactly what the cap bounds; the robots join fans out by
rules-per-host, which is robots-file-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xhtmlkit_spark.operators.harvest_stage import doc_links
from xhtmlkit_spark.operators.urls import (
    cap_per_host,
    filter_blocklist,
    parse_robots,
    robots_filter,
    url_host,
)
from xkit.options import DEFAULT_OPTIONS, ExtractOptions

__all__ = ["build_crawl_frontier"]


def build_crawl_frontier(
    spark: SparkSession,
    corpus_path: str,
    robots: DataFrame | None = None,
    blocklist: tuple = (),
    per_host_cap: int | None = None,
    options: ExtractOptions = DEFAULT_OPTIONS,
) -> DataFrame:
    """Frontier rows ``(url, host, path, n_refs, first_doc, allowed,
    matched_directive, matched_prefix[, host_rank])`` — every distinct
    resolvable outlink of the corpus that survives blocklist + robots,
    capped per host when asked.

    ``robots`` is a ``(host, robots_txt)`` DataFrame (usually the
    fetch table of a previous crawl round); None skips the robots tier
    (every URL ``allowed`` = true, audit columns NULL). ``n_refs`` is
    the in-corpus citation count — the usual frontier priority signal
    — and ``first_doc``/the cap's ascending-url order keep reruns
    deterministic.
    """
    corpus = spark.read.parquet(corpus_path)
    links = doc_links(corpus, options, passthrough=())

    urls = (
        links.withColumn("host", url_host("url"))
        .where(F.col("host").isNotNull())
        .groupBy("url", "host")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.min("doc_id").alias("first_doc"),
        )
    )
    # path for the robots decision: strip scheme://authority; an empty
    # remainder is the root path
    path = F.regexp_replace(F.col("url"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    urls = urls.withColumn(
        "path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    if blocklist:
        urls = filter_blocklist(urls, list(blocklist))
    if robots is not None:
        rules = parse_robots(robots)
        urls = robots_filter(urls, rules, key_col="url").where(F.col("allowed"))
    else:
        urls = urls.select(
            *urls.columns,
            F.lit(True).alias("allowed"),
            F.lit(None).cast("string").alias("matched_directive"),
            F.lit(None).cast("string").alias("matched_prefix"),
        )
    if per_host_cap is not None:
        urls = cap_per_host(urls, per_host_cap, order_col="url")
    return urls
