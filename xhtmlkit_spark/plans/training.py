"""End-to-end training-corpus builder: the engine's operators composed
the way a 100 TB data pipeline actually uses them.

    scan → salt → extract (Arrow stage) → text stats (JVM exprs)
         → dedup-keeper / language / quality / sample FLAGS
         → ONE filtered write with the funnel observed in-flight

Scale design: every selection criterion becomes a flag COLUMN first
and the funnel counts ride the single write job via ``observe()`` —
counting each stage with its own ``.count()`` would re-scan (and
re-extract!) the corpus once per stage. The only shuffles are the
size-bucket salt (pre-extraction) and one hash-partition by content
key for the dedup keeper window; everything else is per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xhtmlkit_spark.functions.spans import span_text_concat
from xhtmlkit_spark.operators.dedup import normalized_text
from xhtmlkit_spark.operators.extract_stage import extract_spans
from xhtmlkit_spark.operators.sampling import hash_fraction
from xhtmlkit_spark.operators.text_stats import (
    with_lang_guess,
    with_quality,
    with_token_counts,
)
from xhtmlkit_spark.plans.pipeline import with_size_salt

__all__ = ["build_training_corpus"]


def build_training_corpus(
    spark: SparkSession,
    corpus_path: str,
    output_path: str,
    langs: tuple = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 5,
    sample_rate: float = 1.0,
    salt: str = "train0",
    num_partitions: int | None = None,
) -> dict:
    """Extract, score, dedup, filter, sample, and write a training set;
    returns the funnel (docs surviving each successive stage)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    corpus = spark.read.parquet(corpus_path)
    extracted = extract_spans(
        with_size_salt(corpus, num_partitions), passthrough=()
    )
    # span_text_concat restricts to kind=='text' itself — wrapping its
    # argument in another F.filter would run two consecutive array
    # passes per document (Catalyst doesn't collapse them)
    docs = extracted.select(
        "doc_id", span_text_concat(F.col("spans"), "\n").alias("text")
    )
    stats = with_quality(with_lang_guess(with_token_counts(docs)))

    # dedup keeper: one shuffle on the md5 content key; min doc_id wins
    w = Window.partitionBy("content_key").orderBy("doc_id")
    flagged = (
        stats.withColumn("content_key", F.md5(normalized_text("text")))
        .withColumn("is_keeper", F.row_number().over(w) == 1)
        .withColumn("lang_ok", F.col("lang_guess").isin(*langs))
        .withColumn(
            "quality_ok",
            (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens),
        )
        .withColumn("sampled", hash_fraction("doc_id", salt) < F.lit(sample_rate))
    )

    one = F.lit(1).cast("long")
    keep = F.col("is_keeper")
    lang = keep & F.col("lang_ok")
    qual = lang & F.col("quality_ok")
    final = qual & F.col("sampled")
    obs = Observation("training_funnel")
    out = flagged.observe(
        obs,
        F.sum(one).alias("extracted"),
        F.sum(F.when(keep, one)).alias("deduped"),
        F.sum(F.when(lang, one)).alias("lang_kept"),
        F.sum(F.when(qual, one)).alias("quality_kept"),
        F.sum(F.when(final, one)).alias("written"),
    )
    (
        out.where(final)
        .select("doc_id", "text", "lang_guess", "quality_score", "n_tokens")
        .write.mode("overwrite")
        .parquet(output_path)
    )
    m = obs.get
    return {
        "extracted": m["extracted"] or 0,
        "deduped": m["deduped"] or 0,
        "lang_kept": m["lang_kept"] or 0,
        "quality_kept": m["quality_kept"] or 0,
        "written": m["written"] or 0,
        "output_path": output_path,
    }
