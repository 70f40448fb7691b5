"""Let-binding for Catalyst expressions.

Catalyst evaluates a captured outer expression at EVERY use site inside
a higher-order-function lambda (there is no hoisting), and sibling
occurrences of the same non-trivial expression in one projection are
not common-subexpression-eliminated either (codegen subexpression
elimination does not cover higher-order functions). Both patterns turn
an O(n) column expression into O(n·uses) — measured 6x on the shingle
builder and ~60x on SimHash's per-bit votes.

``bind`` turns any column into a lambda variable — which IS evaluated
once per row — by passing it through a one-element ``transform``::

    bind(expensive_col, lambda v: f(v, v, v))   # expensive_col computed once

Nesting works (bind inside a bind body binds tighter).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind"]


def bind(col: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row; reference it freely in ``body``."""
    return F.get(F.transform(F.array(col), body), 0)
