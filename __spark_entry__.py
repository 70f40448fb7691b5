"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship: generate the deterministic interleaved
                       corpus (FIXTURES.md §1) at smoke scale, run the
                       mapInArrow extraction stage, return flat spans.
``queries()``        — one entry per implemented operator (SURVEY.md §2);
                       each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()``     — DuckDB-runnable ANSI SQL twin per query (same
                       column names/aliases). Extraction queries have no
                       SQL equivalent → rows-only check, by design.

Column-name parity rule: every computed column is aliased identically
in the DataFrame code and the SQL string; doubles are rounded on both
sides so partial-aggregation order can't flip the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

# corpus size by driver scale: smoke / correctness / bench
_SF_DOCS = {"sf0.001": 500, "sf0.01": 2000, "sf0.1": 20000}


def _corpus_path(sf_dir: str) -> str:
    from xhtmlkit_spark.datagen import generate_corpus

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    n_docs = _SF_DOCS.get(tag, 500)
    path = os.path.join(DATA_DIR, f"corpus_{tag}_{n_docs}.parquet")
    return generate_corpus(path, n_docs, seed=42)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved corpus → ordered main-content spans."""
    return _q_extract_spans(spark, "/root/testdata/sf0.001")


def _q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xhtmlkit_spark.operators.extract_stage import extract_spans
    from xhtmlkit_spark.plans.pipeline import with_size_salt

    df = spark.read.parquet(_corpus_path(sf_dir))
    df = with_size_salt(df, spark.sparkContext.defaultParallelism * 2)
    out = extract_spans(df)
    # flat, stable schema for the driver's smoke/row checks
    return out.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


# ------------------------------------------------- relational operators (B*)


def _q01_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q03_top_unshipped(spark, sf_dir):
    c = _read(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def _q05_region_revenue(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def _q06_revenue_forecast(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


def _q_anti_customers_without_orders(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_semi_customers_with_big_orders(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


def _q_topk_acctbal_per_segment(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_acctbal")
    )


def _q_running_user_value(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def _q_rollup_order_stats(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def _q_except_custkeys(spark, sf_dir):
    o = _read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _read(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


def _q_json_event_props(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k_val", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k_val"), 4).alias("avg_k"),
            F.max("k_val").alias("max_k"),
        )
    )


def _q_hourly_event_stats(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def _q_string_part_features(spark, sf_dir):
    p = _read(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
    )


def _q_math_lineitem_features(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("ln_price"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dist"),
        F.ceil(F.col("l_quantity")).alias("qty_ceil"),
    )


def _q_distinct_counts(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def _q_embedding_explode(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 5).alias("val_r"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_spans": _q_extract_spans,
        "q01_pricing_summary": _q01_pricing_summary,
        "q03_top_unshipped": _q03_top_unshipped,
        "q05_region_revenue": _q05_region_revenue,
        "q06_revenue_forecast": _q06_revenue_forecast,
        "anti_customers_without_orders": _q_anti_customers_without_orders,
        "semi_customers_with_big_orders": _q_semi_customers_with_big_orders,
        "topk_acctbal_per_segment": _q_topk_acctbal_per_segment,
        "running_user_value": _q_running_user_value,
        "rollup_order_stats": _q_rollup_order_stats,
        "except_custkeys": _q_except_custkeys,
        "json_event_props": _q_json_event_props,
        "hourly_event_stats": _q_hourly_event_stats,
        "string_part_features": _q_string_part_features,
        "math_lineitem_features": _q_math_lineitem_features,
        "distinct_counts": _q_distinct_counts,
        "embedding_explode": _q_embedding_explode,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # extract_spans: no SQL equivalent (Arrow-stage extraction) → rows-only
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)       AS sum_qty,
                   round(sum(l_extendedprice), 2)  AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4)       AS avg_qty,
                   count(*)                        AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_top_unshipped": """
            SELECT o_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q05_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        "q06_revenue_forecast": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "anti_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        """,
        "semi_customers_with_big_orders": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        """,
        "topk_acctbal_per_segment": """
            SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
                FROM customer) t
            WHERE rnk <= 3
        """,
        "running_user_value": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                         AS running_value
            FROM events
        """,
        "rollup_order_stats": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "except_custkeys": """
            SELECT o_custkey AS custkey FROM orders
            EXCEPT ALL
            SELECT c_custkey AS custkey FROM customer
        """,
        "json_event_props": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events
            GROUP BY event_type
        """,
        "hourly_event_stats": """
            SELECT date_trunc('hour', ts) AS hour_start, event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "string_part_features": """
            SELECT p_partkey,
                   lower(p_name) AS name_lc,
                   length(p_name) AS name_len,
                   substring(p_type, 1, 5) AS type_prefix,
                   concat_ws('|', p_brand, p_type) AS brand_type,
                   coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word
            FROM part
        """,
        "math_lineitem_features": """
            SELECT l_orderkey, l_linenumber,
                   round(ln(l_extendedprice + 1.0), 6) AS ln_price,
                   l_orderkey % 7 AS key_mod7,
                   round(abs(l_discount - 0.05), 4) AS disc_dist,
                   CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil
            FROM lineitem
        """,
        "distinct_counts": """
            SELECT o_orderstatus,
                   count(DISTINCT o_custkey) AS n_customers,
                   count(*) AS n_orders
            FROM orders
            GROUP BY o_orderstatus
        """,
        "embedding_explode": """
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS pos,
                   round(CAST(unnest(embedding) AS DOUBLE), 5) AS val_r
            FROM embeddings
        """,
    }
