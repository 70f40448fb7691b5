"""Source/sink abstraction (SURVEY.md B1/B2).

Prod target is Iceberg (BASELINE.json north_rule: "over Iceberg
tables"); the sandbox has no Iceberg runtime jar and no network to
fetch one (SURVEY.md §0), so the default format is parquet with an
identical partition layout (``part`` column → directory partition).
Switching to Iceberg is a config swap: ``fmt="iceberg"`` routes reads
through ``spark.read.format("iceberg").load(table)`` and writes
through ``writeTo(table).overwritePartitions()``; everything else in
the pipeline (partition column, checkpoint manifest, resume
anti-join) is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_corpus", "write_spans", "read_manifest", "append_manifest"]


def read_corpus(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_spans(df: DataFrame, location: str, fmt: str = "parquet") -> None:
    """Partition-aware sink: only the ``part`` values present in ``df``
    are (over)written — requires partitionOverwriteMode=dynamic, set by
    session.get_spark — so a resumed run never clobbers finished parts."""
    if fmt == "iceberg":
        df.writeTo(location).overwritePartitions()
        return
    df.write.mode("overwrite").partitionBy("part").parquet(location)


def read_manifest(spark: SparkSession, location: str) -> DataFrame | None:
    try:
        return spark.read.parquet(location)
    except Exception:  # first run: no manifest yet
        return None


def append_manifest(df: DataFrame, location: str) -> None:
    df.write.mode("append").parquet(location)
