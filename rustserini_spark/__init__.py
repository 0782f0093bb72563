"""rustserini_spark — a PySpark-native full-text (BM25) indexing + retrieval engine.

Brand-new rebuild of the capabilities of ToluClassics/rustserini (which delegates
BM25 to Anserini/Lucene over JNI; see /root/reference/src/searcher/lucene/searcher.rs).
Everything here is idiomatic Spark: DataFrame plans, Arrow-vectorized pandas UDFs,
salted two-phase aggregation for head-term skew, and parquet/Iceberg-style table
layout with per-partition lineage for resumable index builds.
"""

__version__ = "0.1.0"

from rustserini_spark.session import fan_out, get_spark  # noqa: F401
