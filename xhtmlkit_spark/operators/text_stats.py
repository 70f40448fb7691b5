"""Text-analysis operators for training-data pipelines.

All JVM-side (pyspark.sql.functions only — no Python in any hot
path): language ID (stopword-hit heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace
and a BPE-ish regex), and document fingerprinting (md5 of the
normalized text, plus a polynomial rolling hash over tokens).

Every operator is deliberately expressible in ANSI SQL too, so each
has a DuckDB oracle twin in __spark_entry__.oracle_sql — the
fingerprint arithmetic (shift/xor-free, mod-prime polynomial) was
chosen precisely so both engines compute bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "tokens_col",
    "with_token_counts",
    "with_quality",
    "with_lang_guess",
    "with_fingerprints",
    "tfidf_top_terms",
    "bigram_doc_freq",
    "repetition_scores",
    "unigram_nll_scores",
    "token_windows",
    "quality_ensemble",
    "robust_length_outliers",
    "char_entropy_scores",
    "inverted_index_stats",
]

# tiny per-language stopword tables (heuristic lang-ID; the point is the
# Spark expression shape, not linguistic accuracy)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "de", "por"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens of a (trimmed) text column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), "\\s+")


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_arr, t)))


def with_token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """n_tokens (whitespace) and n_bpe_tokens (regex pieces)."""
    return df.withColumns(
        {
            "n_tokens": F.size(tokens_col(text)),
            "n_bpe_tokens": F.size(
                F.filter(
                    F.regexp_extract_all(F.col(text), F.lit(BPE_RE), 0),
                    lambda t: t != F.lit(""),
                )
            ),
        }
    )


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality-scoring features + one combined score, shipped as
    BIGINT ten-thousandths (``*_u``, scale 1e4 — the exactmath
    discipline: the pre-round doubles are pure +,-,*,/ chains on
    integer-valued inputs, bit-identical across engines, and
    round-to-INTEGER is exact where round-to-4-decimals was a
    midpoint lottery — a doc whose length carries a 2^k k>4 factor
    lands a ratio exactly on .00005 and Spark/DuckDB last digits
    diverge; see functions/exactmath.py).

    mean_token_len_u, punct_ratio_u, stopword_ratio_u →
    quality_score_u ∈ [0, 10000]-ish (weights frozen; they only need
    to be deterministic and identical in SQL). The token array is
    materialized once (`_toks`) — the ratios reference it five times
    and Catalyst does not CSE sibling splits.
    """
    df = df.withColumn("__xk_toks", tokens_col(text))
    toks = F.col("__xk_toks")
    n_tok = F.size(toks)
    length = F.length(F.col(text))
    punct = F.length(F.regexp_replace(F.col(text), "[^.!?,;:]", ""))
    upper = F.length(F.regexp_replace(F.col(text), "[^A-Z]", ""))
    stop = _stopword_hits(toks, STOPWORDS["en"])
    mean_tok = F.when(n_tok > 0, length / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(0.0))
    upper_ratio = F.when(length > 0, upper / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(stop_ratio * 2.5, F.lit(1.0)) * 0.4
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), 1.0).otherwise(0.0) * 0.3
        + F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0) * 0.2
        + F.when(upper_ratio <= 0.3, 1.0).otherwise(0.0) * 0.1
    )
    from xhtmlkit_spark.functions.exactmath import round_u

    return df.withColumns(
        {
            "mean_token_len_u": round_u(mean_tok, 10_000),
            "punct_ratio_u": round_u(punct_ratio, 10_000),
            "stopword_ratio_u": round_u(stop_ratio, 10_000),
            "quality_score_u": round_u(score, 10_000),
        }
    ).drop("__xk_toks")


def with_lang_guess(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic language ID: most stopword hits wins (CJK chars → zh).

    Ties broken by a fixed language order — frozen, mirrored in SQL.
    """
    # materialize tokens, then the per-language hit counts, so the
    # best-of comparison doesn't re-run the split or the filters
    df = df.withColumn("__xk_toks", tokens_col(text)).withColumn(
        "__xk_hits",
        F.array(
            *[_stopword_hits(F.col("__xk_toks"), STOPWORDS[lang]) for lang in ("en", "de", "fr", "es")]
        ),
    )
    hits = {lang: F.col("__xk_hits")[i] for i, lang in enumerate(("en", "de", "fr", "es"))}
    has_cjk = F.length(F.regexp_replace(F.col(text), "[^\\u4e00-\\u9fff]", "")) > 0
    best = F.greatest(*hits.values())
    guess = F.when(has_cjk, F.lit("zh"))
    for lang in ("en", "de", "fr", "es"):  # fixed tie-break order
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return df.withColumn("lang_guess", guess).drop("__xk_toks", "__xk_hits")


def with_fingerprints(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprints:

    * fp_md5 — md5 of lowercase whitespace-normalized text (exact-dup key)
    * fp_roll — polynomial rolling hash over the first 64 tokens:
      h = Σ (len(tok_i)*31 + ascii(first_char)) * 131^i  (mod 1e9+7);
      the modulus keeps every intermediate product far inside BIGINT so
      Spark and DuckDB (which errors on overflow) compute identically.
    """
    df = df.withColumn("__xk_toks", tokens_col(text))
    # null-propagating like the SQL twin (string_agg over NULL is NULL)
    norm = F.when(
        F.col(text).isNotNull(), F.lower(F.concat_ws(" ", F.col("__xk_toks")))
    )
    toks64 = F.slice(F.col("__xk_toks"), 1, 64)
    mod = F.lit(1000000007)
    fp_roll = F.aggregate(
        toks64,
        F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")),
        lambda acc, t: F.struct(
            F.pmod(
                acc["h"]
                + F.pmod(
                    (F.length(t).cast("long") * 31 + F.ascii(t).cast("long")) * acc["p"],
                    mod,
                ),
                mod,
            ).alias("h"),
            F.pmod(acc["p"] * 131, mod).alias("p"),
        ),
        lambda acc: acc["h"],
    )
    return df.withColumns({"fp_md5": F.md5(norm), "fp_roll": fp_roll}).drop("__xk_toks")


def tfidf_top_terms(df: DataFrame, top_n: int = 3, text: str = "text") -> DataFrame:
    """Per-document top-``top_n`` terms by tf·idf.

    Terms are lowercased whitespace tokens; idf = ln((N+1)/(df+1))
    with N = docs carrying text, quantized ONCE per distinct df to
    micro-nats, so ``score_u = n_term · idf_u`` is an exact BIGINT
    both engines compute identically (the exactmath discipline — the
    old round-6 double score was a midpoint lottery). Scale shape:
    one explode + two hash aggregations (term frequency per doc,
    document frequency per term) + a broadcast of the 1-row corpus
    count + a per-doc ranking window — no Python, no quadratic joins;
    the df side aggregates to |vocabulary| rows before the join back.
    """
    from xhtmlkit_spark.functions.exactmath import round_u

    docs = df.where(F.col(text).isNotNull())
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col(text)))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_term"))
    dfreq = (
        toks.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs_total"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "n_term",
            (
                F.col("n_term")
                * round_u(
                    F.log((F.col("n_docs_total") + 1.0) / (F.col("dfreq") + 1.0))
                )
            ).alias("score_u"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score_u"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_n)
        .select("doc_id", "rnk", "term", "n_term", "score_u")
    )


def bigram_doc_freq(df: DataFrame, top_n: int = 20, text: str = "text") -> DataFrame:
    """Corpus-level word-bigram document frequency, top ``top_n``.

    Reuses the dedup shingle machinery (distinct 2-shingles per doc →
    explode → one hash aggregation), the counts a contamination /
    boilerplate-phrase check runs over a corpus. Deterministic
    tie-break on the bigram itself.
    """
    from xhtmlkit_spark.operators.dedup import shingles_col

    ex = df.select(F.explode(shingles_col(text, 2)).alias("bigram"))
    return (
        ex.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(top_n)
    )


def repetition_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document, as BIGINT
    millionths (exact half-up integer rounding of the rational — the
    exactmath discipline; r04 shipped this query driver-red because
    ``round(top_n/n_tokens, 6)`` lands exactly on a .5 midpoint
    whenever n_tokens carries a 2^k k>6 factor, e.g. 128 tokens with
    an odd top count, and Spark/DuckDB round-6 disagree there).

    * ``top_token_ratio_u`` — 1e6 · share of the most frequent token;
    * ``dup_token_ratio_u`` — 1e6 · (1 - distinct/total tokens);
    * ``dup_bigram_ratio_u`` — 1e6 · (1 - distinct/total bigrams).

    Highly repetitive machine-generated or boilerplate pages score
    high on all three; real prose stays low. Scale shape: the token
    mode comes from one explode + two hash aggregations (never a
    per-row O(n·distinct) array scan — a 1 M-token doc would make
    that quadratic); the bigram ratios are per-row array expressions
    with the token split let-bound once (`bind`). Docs with NULL text
    or no tokens drop (nothing to score).
    """
    from xhtmlkit_spark.functions.binding import bind

    docs = df.where(F.col(text).isNotNull())
    tf = (
        docs.select("doc_id", F.explode(tokens_col(text)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.max("n").alias("top_n"),
        F.count(F.lit(1)).alias("n_distinct"),
    )

    def bigrams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
        )

    bg = bind(tokens_col(text), bigrams)
    big = docs.select(
        "doc_id",
        F.size(bg).alias("n_bigrams"),
        F.size(F.array_distinct(bg)).alias("n_dist_bigrams"),
    )
    from xhtmlkit_spark.functions.exactmath import ratio_u

    return (
        agg.join(big, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            ratio_u(F.col("top_n"), F.col("n_tokens")).alias("top_token_ratio_u"),
            ratio_u(
                F.col("n_tokens") - F.col("n_distinct"), F.col("n_tokens")
            ).alias("dup_token_ratio_u"),
            ratio_u(
                F.col("n_bigrams") - F.col("n_dist_bigrams"), F.col("n_bigrams")
            ).alias("dup_bigram_ratio_u"),
        )
    )


def token_windows(
    df: DataFrame, window: int = 32, stride: int = 24, text: str = "text"
) -> DataFrame:
    """Context-window chunking: split each document's token sequence
    into overlapping windows of ``window`` tokens advancing by
    ``stride`` (the standard prep for feeding long documents into a
    fixed-context trainer; ``window - stride`` tokens of overlap
    preserve continuity across examples). Window *i* covers tokens
    ``[i·stride+1, i·stride+window]``; the last window may be shorter;
    every token is covered; a doc shorter than one window yields
    exactly one. Docs with NULL/blank text drop.

    Scale shape: per-row array expressions (token split let-bound
    once) + one explode — zero shuffle; the fan-out is bounded by
    ``n_tokens/stride`` per document.
    """
    if stride <= 0 or window <= 0:
        raise ValueError(f"window/stride must be positive, got {window}/{stride}")
    c = F.col(text)
    docs = df.where(c.isNotNull() & (F.trim(c) != ""))

    def wins(t: Column) -> Column:
        n_win = F.lit(1) + F.greatest(
            F.ceil((F.size(t) - window) / F.lit(float(stride))).cast("int"),
            F.lit(0),
        )
        return F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.slice(t, i * stride + 1, window),
        )

    from xhtmlkit_spark.functions.binding import bind

    return docs.select(
        "doc_id", F.posexplode(bind(tokens_col(text), wins)).alias("win_idx", "win")
    ).select(
        "doc_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.size("win").cast("long").alias("n_win_tokens"),
        F.md5(F.array_join("win", " ")).alias("win_md5"),
    )


def unigram_nll_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean negative
    log-likelihood under the corpus's own unigram LM (the standard
    cheap stand-in for a KenLM filter — gibberish and boilerplate
    score high, typical prose low).

    p(term) = corpus_count(term) / corpus_tokens;
    mean_nll = Σ tf(doc,term)·(-ln p(term)) / Σ tf(doc,term),
    shipped as ``mean_nll_u`` — BIGINT micro-nats.

    Exactness (r04 shipped this driver-red as a round-6 double): each
    DISTINCT term's -ln p is quantized ONCE to micro-nats
    (``round(1e6·ln(total/cn))`` — the division is correctly rounded
    and bit-identical, the single ln quantization window is ~1e-9 per
    distinct count), then the per-doc sum and the mean are exact
    integer arithmetic in ANY order — no float-summation
    nondeterminism, no round-to-decimal midpoint lottery (see
    functions/exactmath.py).

    Scale shape: one explode feeds BOTH aggregations (per-doc tf and
    the corpus LM); the join back is tf-rows ⋈ |vocabulary|, never
    one row per token occurrence, and the corpus total is a broadcast
    1-row aggregate.
    """
    from xhtmlkit_spark.functions.exactmath import ratio_u, round_u

    docs = df.where(F.col(text).isNotNull())
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col(text)))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    cf = tf.groupBy("term").agg(F.sum("n").alias("cn"))
    total = cf.agg(F.sum("cn").cast("double").alias("corpus_tokens"))
    nll_term_u = round_u(F.log(F.col("corpus_tokens") / F.col("cn")))
    agg = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * nll_term_u).alias("__nll_sum_u"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        ratio_u(F.col("__nll_sum_u"), F.col("n_tokens"), 1).alias("mean_nll_u"),
    )


def quality_ensemble(
    df: DataFrame, keep_threshold: float = 0.5, text: str = "text"
) -> DataFrame:
    """Multi-signal document filter (the FineWeb-style composition):
    heuristic quality score, Gopher repetition penalty, and the
    unigram-LM NLL combined into one calibrated keep/drop score.

        ensemble = 0.4·quality_score
                 + 0.3·(1 − min(2·dup_token_ratio, 1))
                 + 0.3·(1 − min(max(mean_nll − 2, 0)/6, 1))

    Weights and the NLL calibration window (2–8 nats) are FROZEN
    constants, not corpus statistics — a corpus-relative percentile
    would need a global single-partition ranking window, the classic
    scale bottleneck; fixed calibration keeps the post-aggregation
    math row-local.

    The score ships as ``ensemble_u``, a BIGINT in units of 1/(6·10^7)
    (the LCM denominator of the weights and the /6 calibration). Since
    round 5 the component signals ARE already exact integers
    (quality_score_u ten-thousandths, dup_token_ratio_u / mean_nll_u
    millionths — the exactmath sweep), so the whole composition is
    integer arithmetic end to end; the r04 float-recovery step is
    gone. Scale shape: three per-doc scalar frames (one row-local, two
    explode+hash-agg) joined on doc_id; the joins co-partition on the
    same key. Inner joins ⇒ only docs with ≥ 1 token score (same
    population as the component signals).
    """
    docs = df.where(F.col(text).isNotNull())
    q = with_quality(docs).select("doc_id", "quality_score_u")
    r = repetition_scores(df, text).select("doc_id", "dup_token_ratio_u")
    n = unigram_nll_scores(df, text).select("doc_id", "mean_nll_u")
    j = q.join(r, "doc_id").join(n, "doc_id")
    q4 = F.col("quality_score_u")
    d6 = F.col("dup_token_ratio_u")
    n6 = F.col("mean_nll_u")
    rep6 = F.lit(1_000_000) - F.least(d6 * 2, F.lit(1_000_000))
    nll_clamp = F.least(
        F.greatest(n6 - F.lit(2_000_000), F.lit(0)), F.lit(6_000_000)
    )
    # ensemble · 6e7 = 2400·q4 + 18·rep6 + 3·(6e6 − nll_clamp)
    score_u = q4 * 2400 + rep6 * 18 + (F.lit(6_000_000) - nll_clamp) * 3
    return j.select(
        "doc_id",
        "quality_score_u",
        "dup_token_ratio_u",
        "mean_nll_u",
        score_u.alias("ensemble_u"),
        (score_u >= F.lit(int(round(keep_threshold * 60_000_000)))).alias("keep"),
    )


def robust_length_outliers(
    df: DataFrame, text: str = "text", z_threshold: float = 3.5
) -> DataFrame:
    """Median/MAD robust z-score over document lengths — the standard
    outlier gate for corpus ingestion (unlike mean/stddev, one 2 GB
    pathological document cannot drag the threshold).

    robust_z_u = round(1e6·0.6745·(len − median)/MAD) as a BIGINT
    (micro-z; MAD = median(|len − median|)). The pre-round double is
    a pure literal·sub/div/mul chain on exactly-representable inputs
    (exact percentiles of integer lengths land on integers or .5
    halves) — bit-identical across engines in this operand order, and
    round-to-INTEGER is exact where the r04 round-to-6-decimals was a
    midpoint lottery (functions/exactmath.py). ``is_outlier`` =
    |robust_z_u| > 1e6·``z_threshold`` so the decision is reproducible
    cross-engine. A degenerate corpus (MAD = 0: over half the docs
    share one length) yields NULL scores rather than ±inf.

    Scale shape: two exact-percentile aggregates (Spark's exact
    ``percentile`` matches DuckDB ``quantile_cont`` value-for-value —
    CLAUDE.md), each a bounded 1-row broadcast append; the corpus rows
    never shuffle. The median→MAD→score chain is inherently three
    passes, and lazily each re-reads ``text`` to recompute lengths
    (plan audit: 4 pruned scans) — at 100 TB, materialize the
    ``(doc_id, n_chars)`` projection once (``localCheckpoint``, the
    two-consumer rule from PLANS.md) so the passes reread two longs,
    and swap the exact percentiles for ``approx_percentile`` with the
    accuracy knob — same plan shape.
    """
    docs = df.where(F.col(text).isNotNull()).select(
        "doc_id", F.length(text).cast("double").alias("__n")
    )
    med = docs.agg(F.percentile("__n", F.lit(0.5)).alias("__med"))
    with_med = docs.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col("__n") - F.col("__med")), F.lit(0.5)).alias(
            "__mad"
        )
    )
    z_u = F.when(
        F.col("__mad") > 0,
        F.round(
            F.lit(0.6745)
            * (F.col("__n") - F.col("__med"))
            / F.col("__mad")
            * F.lit(1e6)
        ).cast("long"),
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "doc_id",
            F.col("__n").cast("long").alias("n_chars"),
            z_u.alias("robust_z_u"),
        )
        .withColumn(
            "is_outlier",
            F.when(
                F.col("robust_z_u").isNotNull(),
                F.abs(F.col("robust_z_u")) > F.lit(int(round(z_threshold * 1e6))),
            ),
        )
    )


def char_entropy_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Character-level Shannon entropy per document (nats) — a cheap
    gibberish/encoding-garbage signal: natural prose sits ~2.8–3.2,
    base64 blobs and repeated-char padding sit far off.

    H = ln(N) − (Σ c·ln c)/N over per-doc character counts (the
    algebraically stable form — one log per DISTINCT char, not per
    occurrence), shipped as ``char_entropy_u`` BIGINT micro-nats:
    each count's ln is quantized ONCE to nano-nats, the weighted sum
    and the /N mean are exact integer arithmetic, and the two terms
    subtract as integers — no float-sum order dependence, no
    round-to-decimal midpoint lottery (the r04 exactmath sweep;
    term-wise quantization is the defined contract).

    Scale shape: explode to (doc, char) → two hash aggregates; the
    alphabet bounds the post-explode agg at |doc|·|alphabet| rows,
    and chars never leave their doc's partition key.
    """
    from xhtmlkit_spark.functions.exactmath import ratio_u, round_u

    docs = df.where(F.col(text).isNotNull())
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col(text), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ln_c_nano = round_u(F.log(F.col("c").cast("double")), 1_000_000_000)
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.sum(F.col("c") * ln_c_nano).alias("__s_nano"),
    )
    ln_n_micro = round_u(F.log(F.col("n_chars").cast("double")))
    mean_micro = ratio_u(F.col("__s_nano"), F.lit(1000) * F.col("n_chars"), 1)
    return agg.select(
        "doc_id",
        "n_chars",
        (ln_n_micro - mean_micro).alias("char_entropy_u"),
    )


def inverted_index_stats(
    df: DataFrame,
    text: str = "text",
    max_postings: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Per-term inverted-index statistics: document frequency, total
    term frequency, and the first ``max_postings`` postings as a
    ``doc:pos`` digest — the build side of retrieval-style corpus
    tooling (and the data a contamination/attribution audit asks for:
    "which documents contain this term, where?").

    Scale shape: one posexplode, then ONE term-keyed shuffle shared by
    the ranking window and the aggregate. The sort-based window ranks
    (doc_id, pos) streaming per term, and the digest collects ONLY
    rows with rank ≤ ``max_postings`` (collect_list skips the NULLs
    the when() leaves), so per-term state is bounded by the cap while
    df/tf still count every occurrence map-side-combinable. A hot
    (stopword-grade) term costs an external sort of its partition,
    never unbounded memory; ``min_df`` bounds the output row count.
    """
    from pyspark.sql import Window

    docs = df.where(F.col(text).isNotNull())
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens_col(F.lower(F.col(text)))).alias("pos", "term"),
    ).where(F.col("term") != "")
    w = Window.partitionBy("term").orderBy("doc_id", "pos")
    ranked = toks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= max_postings,
                                F.struct("doc_id", "pos"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["pos"].cast("string"),
                    ),
                ),
                ",",
            ).alias("top_postings"),
        )
        .where(F.col("df") >= min_df)
    )
