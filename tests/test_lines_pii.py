"""Behavioral tests for the line-level (RefinedWeb/C4-style) and PII
operators — planted duplicates, punctuation rules, and PII strings
that the synthetic corpus lacks. Engine parity for the same operators
is pinned by scripts/check_contract.py and the planted-NULL fixtures
(test_contract_nulls.py)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from xhtmlkit_spark.session import get_spark

    return get_spark("local[2]", shuffle_partitions=4, app_name="lines-pii-tests")


# --------------------------------------------------------------- segmentation


def test_word_chunk_lines_shapes(spark):
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.lines import word_chunk_lines

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(17))),  # 8 + 8 + 1
            (2, "one two"),  # single short chunk
            (3, ""),  # no lines
            (4, "   "),  # whitespace only → no lines
            (5, None),  # NULL text → NULL lines
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["lines"]
        for r in df.select("doc_id", word_chunk_lines("text", 8).alias("lines")).collect()
    }
    assert [len(c.split(" ")) for c in rows[1]] == [8, 8, 1]
    assert " ".join(rows[1]) == " ".join(f"w{i}" for i in range(17))
    assert rows[2] == ["one two"]
    assert rows[3] == [] and rows[4] == []
    assert rows[5] is None
    # k is honored
    r3 = df.where(F.col("doc_id") == 1).select(
        word_chunk_lines("text", 3).alias("l")
    ).collect()[0]["l"]
    assert [len(c.split(" ")) for c in r3] == [3, 3, 3, 3, 3, 2]


def test_split_text_lines(spark):
    from xhtmlkit_spark.operators.lines import split_text_lines

    df = spark.createDataFrame(
        [(1, "first line\n  second line  \n\n\nthird\n")], "doc_id long, text string"
    )
    assert df.select(split_text_lines("text").alias("l")).collect()[0]["l"] == [
        "first line",
        "second line",
        "third",
    ]


# ---------------------------------------------------------------- line dedup


def test_line_dedup_keeps_first_occurrence(spark):
    from xhtmlkit_spark.operators.lines import line_dedup, split_text_lines

    rows = [
        (1, "alpha beta\nshared boilerplate line\nunique one"),
        (2, "shared boilerplate line\ngamma delta"),  # loses the shared line
        (3, "Shared  Boilerplate   Line"),  # normalized dup → keeps NOTHING
        (4, "alpha beta\nalpha beta"),  # intra-doc dup: 2nd copy dropped...
    ]
    # ...and doc 4's "alpha beta" already appeared in doc 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, split_text_lines("text")).collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["kept_text"] == "alpha beta\nshared boilerplate line\nunique one"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "gamma delta"
    # every line of doc 3 was seen earlier → NULL kept_text, still reported
    assert out[3]["n_kept"] == 0 and out[3]["kept_text"] is None
    assert out[4]["n_lines"] == 2 and out[4]["n_kept"] == 0


def test_line_dedup_deterministic_across_parallelism(spark):
    """Keep-first must not depend on partitioning: same result at 1
    and 8 partitions (min(struct) is order-free by construction)."""
    from xhtmlkit_spark.operators.lines import line_dedup, word_chunk_lines

    words = ["red", "blue", "green", "gold"]
    rows = [
        (i, " ".join(words[(i + j) % 4] for j in range(12))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, line_dedup(df.coalesce(1), word_chunk_lines("text", 4)).collect())
    )
    b = sorted(
        map(tuple, line_dedup(df.repartition(8), word_chunk_lines("text", 4)).collect())
    )
    assert a == b
    assert any(r[2] < r[1] for r in a)  # duplication actually happened


# ------------------------------------------------------------ C4 line filter


def test_c4_line_filter_rules(spark):
    from xhtmlkit_spark.operators.lines import c4_line_filter, split_text_lines

    rows = [
        (1, "This line has enough words to survive.\ntoo short.\nno terminal punctuation here at all\nAnother good sentence with plenty of words!"),
        (2, "Lorem Ipsum dolor { } { filler.\nGood line with five words."),
        (3, None),  # dropped
        (4, ""),  # no lines → ratio 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in c4_line_filter(
            df, split_text_lines("text"), min_words=5, require_terminal_punct=True
        ).collect()
    }
    assert 3 not in out
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == (
        "This line has enough words to survive.\n"
        "Another good sentence with plenty of words!"
    )
    assert out[1]["has_lorem"] is False and out[1]["n_braces"] == 0
    assert out[2]["has_lorem"] is True and out[2]["n_braces"] == 2
    assert out[4]["n_lines"] == 0 and out[4]["kept_ratio_u"] == 0
    assert out[4]["kept_text"] is None
    # punctuation rule off: the bare line now passes
    loose = {
        r["doc_id"]: r
        for r in c4_line_filter(
            df, split_text_lines("text"), min_words=5, require_terminal_punct=False
        ).collect()
    }
    assert loose[1]["n_kept"] == 3


# ----------------------------------------------------------------------- PII


def test_pii_redaction_values(spark):
    from xhtmlkit_spark.operators.pii import with_pii_redaction

    rows = [
        (1, "mail bob.smith+x@sub.example.co.uk or call 555-123-4567 from 192.168.0.1"),
        (2, "no pii here, just 1234 and 12.5 percent"),
        (3, "two mails a@b.io c@d.org and dotted phone 800.555.0199"),
        (4, None),
        (5, "edge 999.999.999.999 still matches the ipv4 shape"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_pii_redaction(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 1)
    assert out[1]["redacted"] == "mail <EMAIL> or call <PHONE> from <IP>"
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 0)
    assert out[2]["redacted"] == rows[1][1]
    assert out[3]["n_emails"] == 2 and out[3]["n_phones"] == 1
    assert out[3]["redacted"] == "two mails <EMAIL> <EMAIL> and dotted phone <PHONE>"
    # NULL propagates
    assert out[4]["n_emails"] is None and out[4]["redacted"] is None
    # the pattern is a shape detector, not a validator (documented)
    assert out[5]["n_ips"] == 1
