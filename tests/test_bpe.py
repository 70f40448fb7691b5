"""Merges-table BPE gate: hand-verified training, encode properties,
determinism, and Spark-stage ≡ pure-Python equality."""

from __future__ import annotations

import pytest

from xkit.bpe import BPE, END, train_bpe


def test_train_hand_verified():
    # vocab: (a,b,</w>) x3, (a,b,c,</w>) x1
    # pair counts: (a,b)=4 -> merge; then (ab,</w>)=3 -> merge; then
    # every remaining pair is hapax -> stop
    merges = train_bpe(["ab ab ab", "abc"], n_merges=10)
    assert merges == [("a", "b"), ("ab", END)]
    enc = BPE(merges)
    assert enc.encode_word("ab") == ["ab" + END]
    assert enc.encode_word("abc") == ["ab", "c", END]
    assert enc.encode_word("xyz") == ["x", "y", "z", END]
    assert enc.count_tokens("ab abc xyz") == 1 + 3 + 4


def test_merge_order_is_rank_greedy():
    # rank 0 must win over rank 1 even when rank 1 appears first in
    # the word
    enc = BPE([("b", "c"), ("a", "b")])
    assert enc.encode_word("abc") == ["a", "bc", END]


def test_roundtrip_property():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "çà et là über naïve 東京 🙂",
    ]
    enc = BPE(train_bpe(texts, n_merges=50))
    for t in texts:
        for w in t.split():
            assert "".join(enc.encode_word(w)) == w + END


def test_training_deterministic_across_order():
    a = train_bpe(["one two three two one", "three three one"], 30)
    b = train_bpe(["three three one", "one two three two one"], 30)
    assert a == b


def test_empty_and_null_safe():
    assert train_bpe(["", None, "   "], 10) == []
    enc = BPE([])
    assert enc.encode("") == []
    assert enc.count_tokens("  ") == 0


def test_merges_survive_list_roundtrip():
    # merges cross process boundaries as JSON-ish lists of lists
    merges = train_bpe(["ab ab ab", "abc"], 10)
    as_lists = [list(m) for m in merges]
    assert BPE(as_lists).encode_word("abc") == BPE(merges).encode_word("abc")


@pytest.mark.spark
def test_spark_bpe_stage_matches_pure_python():
    from xhtmlkit_spark.operators.bpe_stage import (
        bpe_token_counts,
        train_bpe_on_sample,
    )
    from xhtmlkit_spark.session import get_spark

    spark = get_spark("local[2]", shuffle_partitions=4, app_name="bpe-tests")
    rows = [
        (1, "the quick brown fox the quick brown fox"),
        (2, "the lazy dog sleeps"),
        (3, None),
        (4, ""),
        (5, "quick quick quick brown"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_on_sample(df, sample_rows=3, n_merges=20)
    # sample = 3 smallest ids with non-null text -> 1, 2, 4
    assert merges == train_bpe([rows[0][1], rows[1][1], rows[3][1]], 20)
    got = {r["doc_id"]: r["n_bpe_real"] for r in bpe_token_counts(df, merges).collect()}
    enc = BPE(merges)
    expect = {i: (enc.count_tokens(t) if t is not None else None) for i, t in rows}
    assert got == expect
