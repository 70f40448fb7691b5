"""Sequence packing: concat-and-chunk the corpus token stream into
fixed-length training examples.

The standard LM training prep (GPT-style packing): conceptually
concatenate every document's tokens in a stable global order and cut
the stream every ``context_len`` tokens, so each training example is
exactly full and documents may straddle a boundary. The deliverable is
the *packing plan* — for every (document, chunk) incidence, which slice
of the document's tokens lands in which global chunk — not the token
text itself (the trainer's loader applies the plan to its own
tokenization).

Scale shape — the whole point of this operator: the global running
offset is NOT a single-partition ``SUM() OVER (ORDER BY doc_id)``
window (which would serialize 10^12 rows through one task). It is the
classic two-phase distributed prefix sum:

1. per-doc token counts — row-local expressions, zero shuffle;
2. docs land in ``n_buckets`` ORDERED range buckets of the id space;
   one hash aggregate computes per-bucket token totals (|buckets|
   rows);
3. the bucket prefix sum runs a window over that bounded |buckets|-row
   table (the only single-partition step, capped by construction);
4. each bucket's docs compute their within-bucket running sum in a
   window PARTITIONED BY bucket (all buckets in parallel), and the
   broadcast bucket prefix lifts it to the global offset;
5. one ``explode(sequence(first_chunk, last_chunk))`` emits the
   per-chunk slices — fan-out bounded by n_tok/context_len per doc.

The ordered path offers two bucket-bounds strategies: uniform ranges
over [min, max] (default — right when ids are dense), and
``quantile_buckets=True``, which spends one bounded ``approxQuantile``
pass to place the cut points at id-distribution quantiles so a
power-law id space still yields balanced buckets (same plan shape;
the cut points ship as a literal array, so assignment stays
row-local). Bucketing only decomposes the prefix sum — the emitted
plan is identical under either strategy. Ids must be numeric and
orderable — the packing order is ascending ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xhtmlkit_spark.operators.text_stats import tokens_col

__all__ = ["pack_chunks"]


def _assign_buckets(
    docs: DataFrame,
    n_buckets: int,
    shuffle_seed: str | None,
    quantile_buckets: bool,
) -> DataFrame:
    """Add ``bucket`` (ordered range id) and ``__ord`` (packing order
    key) to a ``(doc_id, n_tok)`` frame — the decomposition step of
    the distributed prefix sum. Bucket bounds never change the emitted
    plan, only how evenly the within-bucket windows parallelize."""
    if shuffle_seed is not None:
        # deterministic shuffle: order by md5(seed ‖ id); buckets are
        # ordered ranges of the (uniform) hash space — no bounds pass
        return docs.withColumn(
            "__ord",
            F.md5(F.concat(F.lit(shuffle_seed), F.col("doc_id").cast("string"))),
        ).withColumn(
            "bucket",
            F.expr(
                f"cast(conv(substring(__ord, 1, 4), 16, 10) as bigint)"
                f" * {n_buckets} div 65536"
            ),
        )
    if quantile_buckets:
        # skewed-id path: one bounded approxQuantile action places the
        # n_buckets-1 cut points at id-distribution quantiles, so a
        # power-law id space still fills buckets evenly. The cut list
        # (≤ n_buckets-1 doubles, deduped — heavy id repetition can
        # collapse adjacent quantiles) broadcasts as a LITERAL array;
        # assignment is a row-local count of cuts ≤ id, zero shuffle.
        # Ids are compared as doubles: exact up to 2^53, and beyond
        # that a boundary-id misassignment only shifts bucket balance,
        # never the plan.
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = docs.select(
            F.col("doc_id").cast("double").alias("__id")
        ).approxQuantile("__id", probs, 1.0 / (4 * n_buckets))
        cuts = sorted(set(cuts))
        bucket = (
            F.size(
                F.filter(
                    F.lit(cuts).cast("array<double>"),
                    lambda b: b <= F.col("doc_id").cast("double"),
                )
            ).cast("bigint")
            if cuts
            else F.lit(0).cast("bigint")
        )
        return docs.withColumn("bucket", bucket).withColumn(
            "__ord", F.col("doc_id")
        )
    # ordered range buckets over the id space (bounds = a broadcast
    # 1-row aggregate; the same bounded scalar-append shape as
    # tfidf_top_terms' corpus total)
    bounds = docs.agg(F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi"))
    return (
        docs.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.expr(
                f"least(cast({n_buckets - 1} as bigint),"
                f" (cast(doc_id as bigint) - cast(__lo as bigint)) * {n_buckets}"
                f" div (cast(__hi as bigint) - cast(__lo as bigint) + 1))"
            ),
        )
        .drop("__lo", "__hi")
        .withColumn("__ord", F.col("doc_id"))
    )


def pack_chunks(
    df: DataFrame,
    context_len: int = 512,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    shuffle_seed: str | None = None,
    quantile_buckets: bool = False,
) -> DataFrame:
    """Packing plan: one row per (doc, chunk) incidence.

    Returns ``doc_id, chunk_id, tok_start, tok_len`` (all BIGINT):
    chunk ``chunk_id`` takes ``tok_len`` tokens of this doc starting at
    0-based in-doc offset ``tok_start``. Every chunk except the final
    one is exactly ``context_len`` tokens when the per-chunk slices are
    summed; every token of every kept doc is covered exactly once.
    Docs with NULL/blank text carry no tokens and drop.

    ``shuffle_seed`` packs in DETERMINISTIC SHUFFLED order instead of
    ascending id — real training prep shuffles the corpus before
    packing so neighboring source docs don't share a context window.
    The order key becomes ``md5(seed ‖ doc_id)`` (reshuffle = new
    seed, rerun = identical plan), and the prefix-sum buckets switch
    to ordered ranges of the hash space — uniform by construction, so
    this path needs no id-bounds broadcast at all.

    ``quantile_buckets=True`` (ordered path only) derives the bucket
    bounds from one bounded ``approxQuantile`` pass instead of the
    uniform [min, max] split — use it when the id space is skewed
    (power-law ids pile into one uniform bucket and serialize its
    window). The output plan is identical either way; only the
    prefix-sum parallelism changes.

    The (doc_id, n_tok) subtree feeds BOTH the bucket-totals aggregate
    and the per-row offsets, so a lazy plan scans and tokenizes the
    corpus twice. At sandbox scale that is free; at 100 TB pass
    ``count_col`` pointing at an already-materialized token-count
    column (one line in any stats pass: ``with_token_counts``) so the
    double pass reads two BIGINTs per row instead of re-splitting the
    text.
    """
    if context_len <= 0 or n_buckets <= 0:
        raise ValueError(
            f"context_len/n_buckets must be positive, got {context_len}/{n_buckets}"
        )
    if count_col is not None:
        docs = df.where(
            F.col(count_col).isNotNull() & (F.col(count_col) > 0)
        ).select(
            F.col(id_col).alias("doc_id"),
            F.col(count_col).cast("long").alias("n_tok"),
        )
    else:
        c = F.col(text_col)
        docs = df.where(c.isNotNull() & (F.trim(c) != "")).select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_col(text_col)).cast("long").alias("n_tok"),
        )

    docs = _assign_buckets(docs, n_buckets, shuffle_seed, quantile_buckets)

    # bucket totals -> bucket prefix sum. The un-partitioned window is
    # bounded at n_buckets rows by construction (never corpus-sized).
    btot = docs.groupBy("bucket").agg(F.sum("n_tok").alias("__btok"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "bucket",
        F.coalesce(F.sum("__btok").over(w_b), F.lit(0)).cast("long").alias(
            "__bucket_prefix"
        ),
    )

    # within-bucket running sum, parallel across buckets
    w_d = (
        Window.partitionBy("bucket")
        .orderBy("__ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        docs.join(F.broadcast(bpre), "bucket")
        .withColumn(
            "start_off",
            (
                F.col("__bucket_prefix")
                + F.coalesce(F.sum("n_tok").over(w_d), F.lit(0))
            ).cast("long"),
        )
        .withColumn("end_off", (F.col("start_off") + F.col("n_tok")).cast("long"))
    )

    clen = F.lit(int(context_len)).cast("long")
    first_chunk = F.expr(f"start_off div {context_len}").cast("long")
    last_chunk = F.expr(f"(end_off - 1) div {context_len}").cast("long")
    out = offs.select(
        "doc_id",
        "start_off",
        "end_off",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    chunk_lo = F.greatest(F.col("start_off"), F.col("chunk_id") * clen)
    chunk_hi = F.least(F.col("end_off"), (F.col("chunk_id") + 1) * clen)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (chunk_lo - F.col("start_off")).cast("long").alias("tok_start"),
        (chunk_hi - chunk_lo).cast("long").alias("tok_len"),
    )
