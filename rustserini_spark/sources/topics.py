"""Topics / query-set loaders (reference's query-ingestion surface).

The reference models a query set as qid -> {field: text} with get_query(id)
returning the 'title' field (/root/reference/src/query_iterator.rs:1-13, its
only query-ingestion surface — a stub there, a working loader here). Two
standard formats:

* TSV (TREC style): ``qid<TAB>title`` per line -> (qid, title)
* JSONL: one object per line, ``{"qid": ..., "<field>": ..., ...}`` — every
  non-qid field becomes a column (the qid -> {field: text} map, relational).

Both return a DataFrame ready to feed bm25_search* / search_fields via
``queries_from_topics`` (qid, query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPICS_TSV_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
    ]
)


def read_topics_tsv(spark: SparkSession, path: str) -> DataFrame:
    """(qid, title) from TREC-style tab-separated topics."""
    return (
        spark.read.option("sep", "\t")
        .schema(TOPICS_TSV_SCHEMA)
        .csv(path)
        .filter(F.col("qid").isNotNull())
    )


def read_topics_jsonl(spark: SparkSession, path: str, qid_field: str = "qid") -> DataFrame:
    """qid -> {field: text} from JSONL; fields become columns (schema inferred
    from the tiny topics file — topics are never corpus-scale)."""
    raw = spark.read.json(path)
    return raw.withColumn("qid", F.col(qid_field).cast("string")).drop(
        *( [qid_field] if qid_field != "qid" else [] )
    )


def queries_from_topics(topics: DataFrame, field: str = "title") -> DataFrame:
    """(qid, query) — the get_query(id)['title'] access pattern
    (/root/reference/src/query_iterator.rs:8-10), relational."""
    return topics.select(F.col("qid").cast("string"), F.col(field).alias("query")).filter(
        F.col("query").isNotNull()
    )
