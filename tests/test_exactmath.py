"""The exactmath contract (functions/exactmath.py): BIGINT fixed-point
scores that are bit-identical across Spark and DuckDB.

Three layers, matching VERDICT r04 asks #1-2:
1. the helpers compute exact round-half-up rationals (vs Fraction);
2. check_contract's canon() is driver-grade — a planted 1-ulp float
   divergence must NOT canonicalize equal (the %.6f gate that let
   three driver-red queries ship locally-green);
3. every ln-quantization the contract relies on sits far from a
   half-integer at sf0.01 — a cross-engine 1-ulp ln disagreement
   cannot flip any quantized value (the module docstring's promise).
"""

import math
import os
import sys
from fractions import Fraction

import pytest

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "scripts"))
)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from xhtmlkit_spark.session import get_spark

    return get_spark("local[2]", shuffle_partitions=4, app_name="exactmath-tests")


# ---------------------------------------------------------------- helpers


def _half_up(fr: Fraction) -> int:
    """Round-half-up of a non-negative rational, exactly."""
    return (2 * fr.numerator + fr.denominator) // (2 * fr.denominator)


def test_ratio_u_is_exact_half_up(spark):
    """ratio_u == round-half-up(scale*num/den) for every (num, den)
    in a sweep that includes the r04 killer class: power-of-two
    denominators whose scaled ratio lands EXACTLY on a midpoint."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.functions.exactmath import ratio_u

    cases = [
        (num, den)
        for den in [1, 2, 3, 7, 64, 128, 256, 1000, 999_983]
        for num in [0, 1, den // 2, den - 1, den]
    ]
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r["num"], r["den"]): r["u"]
        for r in df.select(
            "num", "den", ratio_u(F.col("num"), F.col("den")).alias("u")
        ).collect()
    }
    for num, den in cases:
        expect = _half_up(Fraction(1_000_000 * num, den))
        assert got[(num, den)] == expect, (num, den, got[(num, den)], expect)


def test_idiv_exact_above_double_precision(spark):
    """idiv must stay exact past 2^53 — char_entropy's nano-nat
    numerator crosses that on ~10 MB documents (giant-doc corpora are
    an explicit target). The old (a - a mod b)/b form routed through a
    double division and drifted (−9 at 2^60, review finding r05)."""
    import duckdb

    from pyspark.sql import functions as F

    from xhtmlkit_spark.functions.exactmath import idiv

    cases = [
        (2**60 + 3, 7),
        (2**62 - 1, 999_983),
        (2**53 + 1, 3),
        (6_000_000_000_000_000_123, 1_000_000_007),  # ~nano-nat magnitude
        (2**57 + 11, 2**20 + 7),
    ]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {
        (r["a"], r["b"]): r["q"]
        for r in df.select("a", "b", idiv(F.col("a"), F.col("b")).alias("q")).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        (dk,) = con.execute(f"SELECT {a} // {b}").fetchone()
        assert got[(a, b)] == dk == a // b, (a, b, got[(a, b)], dk, a // b)


def test_ratio_u_matches_duckdb_twin(spark):
    """The SQL twin (2*scale*num + den) // (2*den) agrees value-for-
    value — including the odd/2^7 midpoints where round-6 doubles
    shipped driver-red."""
    import duckdb

    from pyspark.sql import functions as F

    from xhtmlkit_spark.functions.exactmath import ratio_u

    cases = [(odd, 128) for odd in range(1, 128, 2)] + [(3, 64), (5, 256)]
    df = spark.createDataFrame(cases, "num long, den long")
    sp = {
        (r["num"], r["den"]): r["u"]
        for r in df.select(
            "num", "den", ratio_u(F.col("num"), F.col("den")).alias("u")
        ).collect()
    }
    con = duckdb.connect()
    for num, den in cases:
        (dk,) = con.execute(
            f"SELECT (2000000 * {num} + {den}) // (2 * {den})"
        ).fetchone()
        assert sp[(num, den)] == dk == _half_up(Fraction(1_000_000 * num, den))


def test_canon_is_bit_exact_on_planted_ulp():
    """check_contract.canon must distinguish doubles that differ by
    one ulp — the exact divergence class the old %.6f formatting
    masked (ask #2's done-criterion)."""
    from check_contract import canon

    for base in [0.0078125, 1 / 3, 0.1, 123456.654321]:
        bumped = math.nextafter(base, math.inf)
        if base != 0.0078125:  # odd/2^7 IS a %.6f midpoint — formatting flips
            assert f"{base:.6f}" == f"{bumped:.6f}"  # the old gate saw no diff
        assert canon(base) != canon(bumped)  # the new gate always does
    assert canon(0.5) == canon(0.5)
    assert canon(float("nan")) == canon(float("nan"))


def _assert_far_from_half(scaled_values, what, min_gap=1e-6):
    """Every scaled value must sit > min_gap from a half-integer: a
    1-ulp cross-engine disagreement in the underlying transcendental
    (≲1e-9 at these magnitudes) can then never flip the round-to-
    integer quantization."""
    worst = None
    for v in scaled_values:
        gap = abs(v - math.floor(v) - 0.5)
        if worst is None or gap < worst[0]:
            worst = (gap, v)
    assert worst is not None, f"{what}: no values"
    assert worst[0] > min_gap, f"{what}: {worst[1]!r} is {worst[0]} from a midpoint"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_sf001_ln_quantizations_avoid_midpoints():
    """The contract's ln-quantization sites, evaluated over the real
    sf0.01 corpus: unigram-NLL micro-nats, tf-idf idf micro-nats,
    char-entropy nano-nats + ln(N) micro-nats, DSIR bucket log-ratios,
    temperature-mix micro-sqrt. Each distinct value stays clear of the
    round-to-integer midpoint."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    toks = """
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM documents WHERE text IS NOT NULL"""
    # unigram NLL: ln(total/cn) per distinct count
    rows = con.execute(
        f"""WITH tf AS (SELECT doc_id, term, count(*) AS n FROM ({toks})
                        WHERE term <> '' GROUP BY doc_id, term),
            cf AS (SELECT term, sum(n) AS cn FROM tf GROUP BY term),
            tot AS (SELECT sum(cn)::DOUBLE AS t FROM cf)
            SELECT DISTINCT ln(t / cn) * 1e6 FROM cf CROSS JOIN tot"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "unigram_nll")
    # tf-idf idf per distinct document frequency
    rows = con.execute(
        f"""WITH d AS (SELECT count(*)::DOUBLE AS n FROM documents
                       WHERE text IS NOT NULL),
            dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM ({toks})
                    WHERE term <> '' GROUP BY term)
            SELECT DISTINCT ln((n + 1.0) / (df + 1.0)) * 1e6
            FROM dfq CROSS JOIN d"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "tfidf_idf")
    # char entropy: ln(c) nano-nats per distinct per-doc char count,
    # and ln(N) micro-nats per distinct doc length
    rows = con.execute(
        """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
                       FROM documents WHERE text IS NOT NULL),
           cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c)
           SELECT DISTINCT ln(n::DOUBLE) * 1e9 FROM cnt WHERE n > 1"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "char_entropy ln(c)")
    rows = con.execute(
        """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
                       FROM documents WHERE text IS NOT NULL)
           SELECT DISTINCT ln(count(*)::DOUBLE) * 1e6 FROM ch GROUP BY doc_id"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "char_entropy ln(N)")
    # DSIR: per-bucket log ratio (the exact expression dsir_weights quantizes)
    rows = con.execute(
        f"""WITH docs AS (
              SELECT doc_id, lang = 'en' AS tgt,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents WHERE text IS NOT NULL),
            feats AS (
              SELECT tgt, unnest(list_filter(toks, x -> x <> '')) AS feat FROM docs
              UNION ALL
              SELECT tgt, unnest(CASE WHEN len(toks) >= 2 THEN
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                       ELSE [] END) FROM docs),
            b AS (SELECT tgt, ('0x' || substr(md5(feat), 1, 6))::BIGINT % 256 AS bucket
                  FROM feats),
            model AS (SELECT bucket,
                             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tk,
                             sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS rk
                      FROM b GROUP BY bucket),
            tot AS (SELECT sum(tk)::DOUBLE AS T, sum(rk)::DOUBLE AS R FROM model)
            SELECT (ln((tk + 1) / (T + 256)) - ln((rk + 1) / (R + 256))) * 1e6
            FROM model CROSS JOIN tot"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "dsir log-ratio")
    # temperature mix: sqrt(n) per stratum (sqrt IS correctly rounded,
    # but the quantization itself must still clear the midpoint)
    rows = con.execute(
        """SELECT sqrt(count(*)) * 1e6 FROM documents
           GROUP BY length(CAST(doc_id AS VARCHAR))"""
    ).fetchall()
    _assert_far_from_half([r[0] for r in rows], "temperature sqrt")
