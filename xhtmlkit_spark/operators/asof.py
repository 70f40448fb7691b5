"""As-of (point-in-time) join — the time-series join Spark lacks.

For every left row, find the single right row with the same key whose
timestamp is the latest one ``<=`` the left timestamp (``backward``,
the default) or the earliest one ``>=`` it (``forward``). The classic
uses: enrich an event with the most recent dimension version, a trade
with the prevailing quote, a document with the last crawl of its seed.

Spark has no ASOF JOIN operator, and the naive encoding — an
inequality join followed by a per-left-row ranking — materializes
every (left, right-candidate) pair first: with R right rows per key
that is an O(L·R) blow-up per key before the rank prunes it back,
plus a BroadcastNestedLoop/range-join risk if the planner misses the
equi-key. This implementation uses the union-scan formulation
instead:

    tag left rows side=1 and right rows side=0, union them, and run
    ONE window per key ordered by (ts, side, tie): ``last(value,
    ignorenulls=True)`` over the unbounded-preceding frame carries
    each right row's payload forward to every later left row.

Cost is a single hash shuffle on the key plus a per-key sort —
identical to what a sort-merge equi join would pay, with NO
intermediate pair blow-up, so it survives keys with millions of rows
on both sides. Skew note: the window needs full per-key ordering, so
per-key salting cannot apply; a genuinely hot key is bounded by
(L_k + R_k) log-sort cost, not L_k·R_k.

Semantics (all deterministic, mirrored by the DuckDB contract
oracle):

* ties on the right timestamp are broken by ``right_tie`` (highest
  wins for backward, lowest for forward);
* a right row exactly at the left timestamp matches in BOTH
  directions (<= / >=);
* right rows with a NULL key or NULL timestamp can never match and
  are dropped up front;
* left rows keep left-outer semantics: no qualifying right row (or a
  match outside ``tolerance``) yields NULL payload columns; a NULL
  left timestamp never matches (sorts before every right row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "resample_forward_fill"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tie: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left-outer as-of join; returns all left columns plus
    ``value_cols`` (and nothing else) from the matched right row.

    ``right_tie``: right column breaking equal-timestamp ties
    (defaults to the first value column). ``tolerance_seconds``:
    matches farther than this from the left timestamp are nulled out
    (left row kept).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tie = right_tie or value_cols[0]
    carry = list(dict.fromkeys([*value_cols, right_ts]))  # right_ts rides for tolerance

    left_cols = left.columns
    overlap = set(left_cols) & set(carry)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    internals = {"__xk_key", "__xk_ts", "__xk_side", "__xk_tie", "__xk_payload"}
    shadow = internals & set(left_cols)
    if shadow:
        raise ValueError(f"left columns shadow internal names: {sorted(shadow)}")

    # backward scans time ascending and carries the LAST right payload
    # forward; at an equal timestamp the right row must sort BEFORE the
    # left row to be visible (side 0 < 1). forward mirrors everything.
    back = direction == "backward"
    l_side, r_side = (1, 0) if back else (0, 1)

    r_clean = right.where(F.col(right_on).isNotNull() & F.col(right_ts).isNotNull())
    # the matched row's payload travels as ONE always-non-null struct:
    # per-column last(ignorenulls) would skip a matched row's genuine
    # NULL value and resurrect a stale earlier one, silently mixing two
    # right rows into a single output row
    payload_t = (
        r_clean.select(F.struct(*carry).alias("__xk_payload")).schema["__xk_payload"].dataType
    )
    l_tagged = left.select(
        F.col(left_on).alias("__xk_key"),
        F.col(left_ts).alias("__xk_ts"),
        F.lit(l_side).alias("__xk_side"),
        F.lit(None).cast(r_clean.schema[tie].dataType).alias("__xk_tie"),
        F.lit(None).cast(payload_t).alias("__xk_payload"),
        *left_cols,
    )
    r_tagged = r_clean.select(
        F.col(right_on).alias("__xk_key"),
        F.col(right_ts).alias("__xk_ts"),
        F.lit(r_side).alias("__xk_side"),
        F.col(tie).alias("__xk_tie"),
        F.struct(*carry).alias("__xk_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    u = l_tagged.unionByName(r_tagged)

    if back:
        order = [F.asc("__xk_ts"), F.asc("__xk_side"), F.asc("__xk_tie")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        # first() scans forward: smallest ts wins, then (asc) lowest tie
        order = [F.asc("__xk_ts"), F.asc("__xk_side"), F.asc("__xk_tie")]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    w = Window.partitionBy("__xk_key").orderBy(*order).rowsBetween(*frame)

    out = u.withColumn("__xk_payload", pick("__xk_payload").over(w)).where(
        F.col("__xk_side") == l_side
    )

    match = F.col("__xk_payload")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__xk_ts").cast("double") - match[right_ts].cast("double")
        )
        match = F.when(
            match.isNotNull() & (gap <= F.lit(float(tolerance_seconds))), match
        )
        out = out.withColumn("__xk_payload", match)

    keep = [c for c in carry if c != right_ts or right_ts in value_cols]
    return out.select(
        *left_cols, *[F.col("__xk_payload")[c].alias(c) for c in keep]
    )


def resample_forward_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    tie_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key regular time grid with last-observation-carried-forward.

    Emits one row per ``step_seconds`` from floor(min ts) to max ts of
    each key, carrying the most recent ``value_col`` forward (grid
    points before the first observation stay NULL). The gap-filling /
    resample primitive Spark lacks natively.

    Built by composition: the grid is a per-key ``sequence`` over
    epoch microseconds (two hash aggs: bounds then explode — grid size
    is (span/step) per key, never |rows|·|grid|), and the fill is
    ``asof_join(grid, observations)`` — i.e. ONE extra key shuffle,
    no inequality-pair blow-up. Observations are first reduced to one
    row per (key, ts) keeping the value of the highest ``tie_col``,
    which makes the fill deterministic when two rows share an exact
    timestamp.

    Timestamps are handled in exact epoch microseconds; the returned
    ``grid_ts`` is TIMESTAMP_NTZ (engine-portable under the pinned-UTC
    session; see CLAUDE.md on LTZ collect()).
    """
    step_us = int(step_seconds) * 1_000_000
    obs = (
        df.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .withColumn("__xk_us", F.unix_micros(F.col(ts).cast("timestamp")))
        .groupBy(key, "__xk_us")
        .agg(F.max_by(value_col, tie_col).alias(value_col))
    )
    bounds = obs.groupBy(key).agg(
        # floor, not cast: int-cast truncates toward zero, which would
        # shift the grid start AFTER the first observation for pre-1970
        # timestamps (negative epoch micros)
        (F.floor(F.min("__xk_us") / step_us).cast("long") * step_us).alias("__xk_t0"),
        F.max("__xk_us").alias("__xk_t1"),
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("__xk_t0", "__xk_t1", F.lit(step_us))
        ).alias("__xk_grid_us"),
    )
    filled = asof_join(
        grid,
        obs,
        left_on=key,
        right_on=key,
        left_ts="__xk_grid_us",
        right_ts="__xk_us",
        value_cols=[value_col],
        right_tie="__xk_us",  # unique per key after the reduce
    )
    return filled.select(
        key,
        F.timestamp_micros(F.col("__xk_grid_us")).cast("timestamp_ntz").alias("grid_ts"),
        value_col,
    )
