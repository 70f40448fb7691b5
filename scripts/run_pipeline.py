"""spark-submit entry point for the extraction job (BASELINE.json
north_rule: "launches via spark-submit --py-files on multi-executor
clusters").

    python -m zipfile -c xkit.zip xkit xhtmlkit_spark   # or scripts/make_pyfiles.sh
    spark-submit --master local[32] --py-files xkit.zip \
        scripts/run_pipeline.py --input data/corpus.parquet \
        --output data/out --manifest data/manifest

Prints one JSON line with wall time + throughput (docs/sec, MB/sec),
the numbers BENCH/BASELINE.md aggregates at two parallelism levels.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--input-format",
        default="parquet",
        choices=("parquet", "iceberg", "warc", "html"),
        help="corpus source: landed parquet/Iceberg table, raw Common "
        "Crawl .warc(.gz) archives, or a directory tree of .html/.pdf "
        "files (the two raw formats parse through xkit in the same "
        "mapInPandas ingest the batch sources use)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument(
        "--stage-only",
        action="store_true",
        help="materialize the extraction stage into a noop sink (no parquet "
        "write, no manifest) — isolates compute scaling from the single "
        "local disk the sandbox shares across all parallelism levels",
    )
    ap.add_argument(
        "--select",
        default=None,
        metavar="SELECTOR",
        help="materialize select_spans(SELECTOR) into a noop sink instead "
        "of extraction — the second headline Arrow stage, measured at "
        "both widths by scaling_bench",
    )
    ap.add_argument(
        "--xpath",
        default=None,
        metavar="XPATH",
        help="like --select but the query is XPath-lite (the reference's "
        "native idiom), compiled to the selector grammar on the driver",
    )
    ap.add_argument(
        "--emit",
        default="text",
        choices=("text", "html", "inner_html"),
        help="span payload for --select/--xpath: subtree text (default), "
        "the match's serialized outer XHTML (OuterXml parity), or the "
        "children-only markup (InnerXml)",
    )
    ap.add_argument(
        "--project",
        default=None,
        choices=("markdown", "markdown+xhtml"),
        help="materialize the FUSED multi-projection stage (extraction "
        "spans + markdown, optionally + normalized xhtml, one parse per "
        "doc) into a noop sink instead of extraction",
    )
    ap.add_argument(
        "--harvest",
        action="store_true",
        help="materialize the combined one-parse harvest (tables + links "
        "+ page metadata, harvest_all) into a noop sink instead of "
        "extraction",
    )
    args = ap.parse_args()
    if args.select is not None and args.xpath is not None:
        ap.error("pass at most one of --select / --xpath")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xhtmlkit_spark.plans.pipeline import run_pipeline

    spark = SparkSession.builder.getOrCreate()  # master comes from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
        # giant-doc rows: keep columnar read batches small or the
        # vectorized reader OOMs at high task concurrency
        "spark.sql.parquet.columnarReaderBatchSize": "256",
        # avoid the sort-based dynamic-partition writer (full extra sort)
        "spark.sql.maxConcurrentOutputFileWriters": "40",
    }.items():
        spark.conf.set(k, v)

    from xhtmlkit_spark.sources.io import read_corpus

    corpus_df = read_corpus(spark, args.input, args.input_format)
    if args.input_format in ("warc", "html"):
        # raw formats: the ingest is an expensive parse — persist so the
        # stats aggregate below and the stage share ONE pass (the
        # two-consumer double-scan trap, CLAUDE.md); parquet inputs keep
        # the cheap columnar re-scan instead of caching
        corpus_df = corpus_df.persist()

    zero = F.lit(0).cast("long")
    row = (
        corpus_df
        .agg(
            F.count("*").alias("docs"),
            F.sum(
                F.aggregate(
                    "spans",
                    zero,
                    lambda a, s: a + F.coalesce(F.length(s["text"]).cast("long"), zero),
                )
            ).alias("chars"),
        )
        .collect()[0]
    )

    t0 = time.monotonic()
    if args.select is not None or args.xpath is not None:
        from xhtmlkit_spark.operators.select_stage import select_spans
        from xhtmlkit_spark.plans.pipeline import derive_part, with_size_salt

        df = derive_part(corpus_df)
        n = args.num_partitions or spark.sparkContext.defaultParallelism * 2
        select_spans(
            with_size_salt(df, n), args.select, xpath=args.xpath, emit=args.emit
        ).write.mode("overwrite").format("noop").save()
        res = {"mode": "select_only"}
    elif args.harvest:
        from xhtmlkit_spark.operators.harvest_stage import harvest_all
        from xhtmlkit_spark.plans.pipeline import derive_part, with_size_salt

        df = derive_part(corpus_df)
        n = args.num_partitions or spark.sparkContext.defaultParallelism * 2
        harvest_all(with_size_salt(df, n)).write.mode("overwrite").format(
            "noop"
        ).save()
        res = {"mode": "harvest_all"}
    elif args.project is not None:
        from xhtmlkit_spark.operators.project_stage import project_docs
        from xhtmlkit_spark.plans.pipeline import derive_part, with_size_salt

        df = derive_part(corpus_df)
        n = args.num_partitions or spark.sparkContext.defaultParallelism * 2
        project_docs(
            with_size_salt(df, n), want_xhtml=(args.project == "markdown+xhtml")
        ).write.mode("overwrite").format("noop").save()
        res = {"mode": f"project:{args.project}"}
    elif args.stage_only:
        from xhtmlkit_spark.operators.extract_stage import extract_spans
        from xhtmlkit_spark.plans.pipeline import derive_part, with_size_salt

        df = derive_part(corpus_df)
        n = args.num_partitions or spark.sparkContext.defaultParallelism * 2
        extract_spans(with_size_salt(df, n)).write.mode("overwrite").format(
            "noop"
        ).save()
        res = {"mode": "stage_only"}
    else:
        res = run_pipeline(
            spark,
            args.input,
            args.output,
            corpus=corpus_df,
            manifest_path=args.manifest,
            num_partitions=args.num_partitions,
            fmt=args.input_format,
            resume=not args.no_resume,
        )
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "wall_sec": round(wall, 2),
                "docs": row["docs"],
                "mb": round(row["chars"] / 1e6, 2),
                "docs_per_sec": round(row["docs"] / wall, 1),
                "mb_per_sec": round(row["chars"] / 1e6 / wall, 2),
                **res,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
