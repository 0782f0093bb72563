"""Corpus sources: JSONL / gzip JSONL readers with the reference's field probing.

Reference parity (SURVEY.md §2 S1/S2): rustserini's JsonlCollectionIterator
reads a file or directory of JSONL, extracting ``id``/``docid``/``_id`` and
``contents``/``text`` plus optional ``title``
(/root/reference/src/encode/vector_writer.rs:96-158; flexible keys :128-149;
gzip strict path :160-220). Spark reads .jsonl and .jsonl.gz natively and, in
sharp contrast to the reference (whole corpus materialized in RAM at
vector_writer.rs:115-156), streams partitions — nothing is ever collected.

Schema is explicit (no inference jobs at 10^12 scale).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("docid", T.StringType(), True),
        T.StructField("_id", T.StringType(), True),
        T.StructField("contents", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    concat_title: bool = True,
    strict: bool = False,
) -> DataFrame:
    """(docid, text[, title]) from JSONL (plain or .gz, file or directory).

    Field probing follows the reference: docid = first of id|docid|_id, body =
    first of contents|text (vector_writer.rs:133-149 and the Python prototype
    /root/reference/examples/misc/collection_iterator.py:79-84). With
    ``concat_title`` the indexed text is "{title} {text}" when a title exists
    (operator A2, /root/reference/src/encode/auto.rs:144-151). ``strict``
    mirrors the gzip path's fixed DataFields {docid, text, title} struct
    (vector_writer.rs:39-44): missing docid/text become errors, not skips.
    """
    raw = spark.read.schema(JSONL_CORPUS_SCHEMA).json(path)
    docid = F.coalesce("id", "docid", "_id")
    body = F.coalesce("contents", "text")
    out = raw.select(
        docid.alias("docid"),
        body.alias("body"),
        F.col("title").alias("title"),
    )
    if strict:
        n_bad = out.filter(F.col("docid").isNull() | F.col("body").isNull()).limit(1).count()
        if n_bad:
            raise ValueError("strict JSONL corpus: rows missing docid or text")
    else:
        out = out.filter(F.col("docid").isNotNull() & F.col("body").isNotNull())
    text = (
        F.when(F.col("title").isNotNull(), F.concat_ws(" ", "title", "body")).otherwise(F.col("body"))
        if concat_title
        else F.col("body")
    )
    return out.select("docid", text.alias("text"), "title")


def parse_delimited_contents(
    df: DataFrame,
    field_names: list[str],
    contents_col: str = "contents",
    delimiter: str = "\n",
) -> DataFrame:
    """Reference S4: split a packed ``contents`` field into positional fields
    (title/text packed with a delimiter), trimming a trailing delimiter —
    /root/reference/examples/misc/collection_iterator.py:40-64. Pure Catalyst:
    split + element_at."""
    c = F.col(contents_col)
    trimmed = F.when(c.endswith(delimiter), F.expr(
        f"substring({contents_col}, 1, length({contents_col}) - {len(delimiter)})"
    )).otherwise(c)
    parts = F.split(trimmed, re.escape(delimiter))
    cols = [F.element_at(parts, i + 1).alias(name) for i, name in enumerate(field_names)]
    return df.select("*", *cols)


def write_embeddings_jsonl(df: DataFrame, path: str) -> None:
    """Reference S6 sink: rows {"id", "contents", "vector"} as JSONL
    (/root/reference/src/encode/vector_writer.rs:271-341)."""
    cols = df.columns
    sel = [
        F.col("id").cast("string").alias("id") if "id" in cols else F.col("vec_id").cast("string").alias("id"),
        (F.col("contents") if "contents" in cols else F.lit("")).alias("contents"),
        (F.col("vector") if "vector" in cols else F.col("embedding")).alias("vector"),
    ]
    df.select(*sel).write.mode("overwrite").json(path)


def write_docid_map(docmap: DataFrame, path: str) -> None:
    """Reference S7's docid sidecar (ordinal -> external id,
    /root/reference/src/encode/vector_writer.rs:410-423) as a parquet table."""
    docmap.select("doc_id", "url").write.mode("overwrite").parquet(path)
