"""End-to-end webtext pipeline: Iceberg-style corpus table -> BM25 index.

This is the engine's primary ingestion path per BASELINE.json input_hint: an
Iceberg/parquet table ``(url, warc_ts, html, text, lang)`` of Common-Crawl-style
pages. Steps:

  1. extract text from html (Arrow/Catalyst, no per-row Python) and enforce the
     north-rule invariant: extracted text byte-identical to the ``text`` column
     per url (the reference consumes pre-extracted text verbatim —
     /root/reference/src/encode/vector_writer.rs:96-158 — so extraction must be
     the identity on ``text``);
  2. language filter (partition-prunable on a lang-partitioned table);
  3. docid assignment (url -> dense long ordinal, docmap table);
  4. salted, block-compressed index build (in-memory or checkpointed/resumable).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustserini_spark.operators.index_build import (
    BM25Index,
    build_index,
    build_index_checkpointed,
)
from rustserini_spark.sources.synth import docmap_from_urls, extract_text_col


def extraction_mismatches(webtext: DataFrame) -> DataFrame:
    """Rows where extract(html) != text byte-for-byte (must be empty)."""
    ext = webtext.withColumn("extracted", extract_text_col("html"))
    return ext.filter(
        (F.col("extracted") != F.col("text"))
        | F.col("extracted").isNull()
        | F.col("text").isNull()
    ).select("url", "text", "extracted")


@dataclass
class WebtextIndex:
    index: BM25Index
    docmap: DataFrame  # (doc_id, url)


def index_webtext(
    spark: SparkSession,
    webtext: DataFrame,
    lang: str | None = "en",
    verify_extraction: bool = True,
    checkpoint_dir: str | None = None,
    input_id: str | None = None,
    **build_kwargs,
) -> WebtextIndex:
    corpus = webtext
    if lang is not None:
        # on a lang-partitioned Iceberg table this filter is partition pruning,
        # not a scan
        corpus = corpus.filter(F.col("lang") == lang)

    # Extraction byte-parity enforced INLINE in the build scan (north-rule
    # invariant: extract(html) byte-identical to the text column per url).
    # A Catalyst CASE with raise_error checks every row for free inside the
    # encode pass — no separate verification pass over the corpus.
    extracted = extract_text_col("html")
    if verify_extraction:
        text_expr = F.when(extracted == F.col("text"), extracted).otherwise(
            F.raise_error(
                F.concat(F.lit("extraction parity violation: extract(html) != text at url="), F.col("url"))
            )
        )
    else:
        text_expr = extracted

    docmap = docmap_from_urls(corpus)
    docs = corpus.select("url", text_expr.alias("text")).join(docmap, "url")
    # corpus size from the (persisted) docmap — skips re-running the
    # corpus⋈docmap join that docs.count() would trigger inside build_index
    n_docs = docmap.count()

    if checkpoint_dir:
        index, _stages = build_index_checkpointed(
            spark,
            docs,
            checkpoint_dir=checkpoint_dir,
            input_id=input_id or "webtext",
            text_col="text",
            id_col="doc_id",
            **build_kwargs,
        )
    else:
        index = build_index(
            spark, docs, text_col="text", id_col="doc_id", n_docs=n_docs, **build_kwargs
        )
    return WebtextIndex(index=index, docmap=docmap)


def resolve_urls(results: DataFrame, docmap: DataFrame) -> DataFrame:
    """(qid, doc_id, score, rank) -> + url (reference operator O17, the
    ordinal->docid resolve of /root/reference/src/searcher/faiss/searcher.rs:109-115)."""
    return results.join(F.broadcast(docmap), "doc_id").select(
        "qid", "doc_id", "url", "score", "rank"
    )
