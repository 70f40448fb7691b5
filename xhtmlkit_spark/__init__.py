"""xhtmlkit_spark — PySpark-native main-content extraction engine.

Spark layer around the pure-Python ``xkit`` core (BASELINE.json
north_rule): DataFrame + Arrow-vectorized stages over Parquet
(sandbox) / Iceberg (prod) tables of interleaved text+media documents.

Subpackages
-----------
operators : the mapInArrow extraction stage + training-data operators
            (dedup, similarity, text stats, multimodal plumbing)
sources   : reader/writer abstraction (parquet now, iceberg by config)
functions : span-level helpers built on Spark higher-order functions
plans     : the end-to-end job — skew salting, checkpoint/resume,
            lineage + per-partition metrics
streaming : Structured Streaming variants over the events table
datagen   : deterministic interleaved-corpus generator (FIXTURES.md §1)
"""

__version__ = "0.1.0"
