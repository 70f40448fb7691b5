"""Spark ≡ DuckDB parity on planted degenerate inputs.

The driver's tables contain no NULL text, NULL/zero embeddings, or
NULL event fields at any scale factor, so the oracle gate can never
see a NULL-handling divergence — these fixtures plant them and run the
SAME queries()/oracle_sql() pairs the driver runs. This suite has
caught real bugs: the [''] NULL-shingle bucket, ELSE-fallthrough lang
guesses, fp_roll seed leakage, an ANSI DIVIDE_BY_ZERO job-killer on
all-zero embeddings, NULLS FIRST/LAST window divergence, and DuckDB's
NULL empty-array join.
"""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.spark

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

QUERIES = [
    "minhash_signatures",
    "lsh_candidates",
    "jaccard_candidates",
    "dedup_groups",
    "dedup_exact",
    "simhash",
    "token_counts",
    "quality_scores",
    "lang_guess",
    "fingerprints",
    "pii_redaction",
    "line_dedup_stats",
    "size_bucket_histogram",
    "c4_line_stats",
    "quality_ensemble",
    "dsir_weights",
    "snapshot_diff",
]


@pytest.fixture(scope="session")
def spark():
    from xhtmlkit_spark.session import get_spark

    return get_spark("local[2]", shuffle_partitions=4, app_name="null-contract")


def _assert_parity(spark, fixture_dir: str, table: str, name: str) -> None:
    """ONE Spark-vs-DuckDB comparison protocol for every planted
    fixture (text / embeddings / events): run the real queries() entry
    and its oracle against the fixture table, compare canonical row
    multisets."""
    import duckdb

    import __spark_entry__ as entry
    from check_contract import row_multiset

    sdf = entry.queries()[name](spark, fixture_dir)
    spark_ms = row_multiset(sdf.columns, sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{fixture_dir}/{table}.parquet/*.parquet')"
    )
    cur = con.execute(entry.oracle_sql()[name])
    oracle_ms = row_multiset([c[0] for c in cur.description], cur.fetchall())
    assert spark_ms == oracle_ms, (
        f"{name}: planted-NULL divergence\nspark={spark_ms}\noracle={oracle_ms}"
    )


@pytest.fixture(scope="session")
def null_sf_dir(spark, tmp_path_factory):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        (2, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        (3, None, "en", "web", 0),
        (4, None, "en", "web", 0),
        (5, "", "en", "web", 0),
        (6, "   ", "en", "web", 3),
        (7, "entirely different words in this one", "en", "web", 36),
        # NULL n_chars: greatest(NULL, 1) must agree across engines
        # (size_bucket_histogram is the only consumer of n_chars)
        (8, "histogram null chars probe", "en", "web", None),
    ]
    d = tmp_path_factory.mktemp("nulldocs")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_null_text_parity(spark, null_sf_dir, name):
    _assert_parity(spark, null_sf_dir, "documents", name)


EMB_QUERIES = [
    "embedding_explode",
    "cosine_topk",
    "ann_lsh_topk",
    "ivf_topk",
    "embedding_neardup",
]


@pytest.fixture(scope="session")
def null_emb_dir(spark, tmp_path_factory):
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(6)
    ]
    rows.append((6, None))  # NULL embedding
    rows.append((7, [0.0] * 64))  # zero vector: norm 0 → division by zero
    d = tmp_path_factory.mktemp("nullemb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_null_and_zero_embedding_parity(spark, null_emb_dir, name):
    _assert_parity(spark, null_emb_dir, "embeddings", name)


EVENT_QUERIES = [
    "running_user_value",
    "user_sessions",
    "hourly_event_stats",
    "range_join_event_pairs",
    "json_event_props",
    "map_event_props",
    "value_percentiles",
]


@pytest.fixture(scope="session")
def null_events_dir(spark, tmp_path_factory):
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(12):
        rows.append(
            (i, base + datetime.timedelta(minutes=7 * i), i % 3, "click", float(i), '{"k": %d}' % i)
        )
    rows += [
        (100, None, 1, "click", 5.0, "{}"),          # NULL ts
        (101, base, 1, "click", None, "{}"),          # NULL value
        (102, base, None, "click", 1.0, "{}"),        # NULL user
        (103, base, 2, None, 1.0, None),              # NULL type + props
    ]
    d = tmp_path_factory.mktemp("nullevents")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_null_event_fields_parity(spark, null_events_dir, name):
    _assert_parity(spark, null_events_dir, "events", name)
