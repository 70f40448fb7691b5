"""Cross-engine EXACT fixed-point arithmetic helpers.

Round-4 shipped three driver-red queries (repetition_scores,
unigram_nll, dsir_weights) because ``F.round(x, 6)`` is a midpoint
lottery: Spark rounds the exact decimal expansion of the double
HALF_UP (BigDecimal) while DuckDB rounds in double arithmetic
(``x*1e6`` → nearbyint → ``/1e6``), so a ratio whose denominator
carries a 2^k (k>6) factor lands EXACTLY on a .5 midpoint and the two
engines disagree in the last digit. The driver hashes exact values —
one flipped row fails the query.

The fix family (VERDICT r04 asks #1–2): ship scores as BIGINT
fixed-point units computed with operations that are bit-identical
across engines:

* ``+ - * /`` and ``sqrt`` on doubles are IEEE correctly-rounded —
  identical in both engines GIVEN the same operand order;
* integer ``+ - *`` and integer division are exact;
* round-to-INTEGER of a bit-identical double is identical (Spark
  HALF_UP == DuckDB half-away-from-zero on every double: a double is
  either exactly n+0.5 — both round away from zero — or unambiguous).
  It is round-to-6-DECIMALS that diverges, because of the ``/1e6``
  scale-back; round-to-integer has none;
* transcendentals (``ln``) are NOT correctly rounded — quantize each
  distinct log ONCE to an integer (``round(1e6·ln x)``) and do all
  sums/averages downstream in exact integer space. A 1-ulp ``ln``
  disagreement flips the quantization only when ``1e6·ln x`` sits
  within ~1e-9 of a half-integer — per distinct value, not per row,
  and tests/test_exactmath.py asserts the sf0.01 corpus has no such
  value near a midpoint.

SQL twins: Spark ``a div b`` ≡ DuckDB ``a // b`` (both truncate/floor
— identical for the non-negative operands used here); Spark
``CAST(round(x) AS BIGINT)`` ≡ DuckDB ``CAST(round(x) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["idiv", "ratio_u", "round_u"]


def idiv(a: Column, b: Column) -> Column:
    """Exact integer division of NON-NEGATIVE longs: Spark's `div`
    (the SQL integral-division function) ≡ DuckDB `//`. Stays in long
    arithmetic end to end — the earlier (a - a mod b)/b form routed
    through a DOUBLE division, which loses ulps once the dividend
    passes ~2^53 (char_entropy's nano-nat numerator crosses that on
    ~10 MB documents; measured drift −9 at 2^60)."""
    return F.call_function("div", a, b)


def ratio_u(num: Column, den: Column, scale: int = 1_000_000) -> Column:
    """round-half-up(scale·num/den) computed EXACTLY in integers:
    (2·scale·num + den) div (2·den). num, den non-negative longs."""
    return idiv(F.lit(2 * scale) * num + den, F.lit(2) * den)


def round_u(x: Column, scale: int = 1_000_000) -> Column:
    """CAST(round(scale·x) AS BIGINT) — exact for bit-identical x
    (see module docstring); the oracle twin is the same expression."""
    return F.round(x * F.lit(float(scale))).cast("long")
