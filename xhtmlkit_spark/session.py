"""SparkSession factory with the engine's scale-oriented defaults.

Every knob here exists for the 100 TB target (SURVEY.md §4), not for
the sandbox: AQE re-planning + skew-join splitting, partition
coalescing, and a bounded Arrow batch size so the Python workers in
the mapInArrow stage never see an unbounded batch (giant docs are
additionally spread by the size-bucket salting in plans/pipeline.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    master: str | None = None,
    app_name: str = "xhtmlkit-spark",
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 1024,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a real cluster pass None and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = max(32, int(n) if n.isdigit() else 32)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # deterministic across deploy environments: the events table is
        # TIMESTAMP_NTZ cast to ltz for watermarks, and epoch-aligned
        # windows shift by the session offset on non-whole-hour zones;
        # the JVM zone must be pinned too — collect() converts
        # timestamps through the JVM default, not the session setting
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # giant-document corpora: 4096-row columnar batches of multi-MB text
        # cells OOM the on-heap vectorized reader under full parallelism
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        # avoid the sort-based dynamic-partition writer (a full extra
        # sort of the output) when tasks write several `part` values
        .config("spark.sql.maxConcurrentOutputFileWriters", "40")
        # partitioned sinks overwrite only the partitions they touch
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
