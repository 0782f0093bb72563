"""Field-weighted BM25 search (reference operator O16).

``LuceneSearcher::search_fields(q, {field: boost}, k)`` scores each field as
its own BM25 (per-field postings, per-field length norms and stats) and sums
boost-weighted contributions (/root/reference/src/searcher/lucene/searcher.rs:53,59-84,131-143).

Spark design: one BM25Index per field (each field's postings/dictionary/stats
are independent — exactly Lucene's per-field inverted index), scored with the
existing exhaustive path and combined with a weighted groupBy sum. The extra
fields add map-side work but no new shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustserini_spark.operators.index_build import BM25Index, build_index
from rustserini_spark.operators.search import _matching_blocks, _topk


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    field_cols: list[str],
    id_col: str = "doc_id",
    **kwargs,
) -> dict[str, BM25Index]:
    """One independent BM25 index per document field."""
    return {
        f: build_index(spark, docs, text_col=f, id_col=id_col, **kwargs) for f in field_cols
    }


def search_fields(
    indexes: dict[str, BM25Index],
    queries: DataFrame,
    boosts: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """score(q, d) = Σ_field boost_f · BM25_f(q, d); ties doc_id asc."""
    combined = None
    for field, boost in boosts.items():
        # full per-field scoring (not per-field top-k!) so cross-field sums
        # are exact before the single global cut
        part = _field_scores(indexes[field], queries).withColumn(
            "score", F.col("score") * F.lit(float(boost))
        )
        combined = part if combined is None else combined.unionByName(part)
    if combined is None:
        from rustserini_spark.operators.search import _empty_result

        return _empty_result(queries.sparkSession)
    total = combined.groupBy("qid", "doc_id").agg(F.sum("score").alias("score"))
    return _topk(total, k)


def _field_scores(index: BM25Index, queries: DataFrame) -> DataFrame:
    """(qid, doc_id, score) — full BM25 scores for one field (no top-k cut)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from rustserini_spark.operators.compress import bm25_impact, decode_blocks_batch

    joined = _matching_blocks(index, queries)
    if joined is None:
        from rustserini_spark.operators.search import _empty_result

        return _empty_result(queries.sparkSession).select("qid", "doc_id", "score")
    k1, b, avgdl = index.k1, index.b, (index.avgdl or 1.0)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            d, t, l, bidx = decode_blocks_batch(
                list(pdf["postings_bin"]), pdf["n_docs"].to_numpy()
            )
            idf = pdf["idf"].to_numpy(dtype=np.float64)[bidx]
            qtf = pdf["qtf"].to_numpy(dtype=np.float64)[bidx]
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy()[bidx],
                    "doc_id": d,
                    "partial": bm25_impact(t, l, idf, k1, b, avgdl) * qtf,
                }
            )

    return (
        joined.mapInPandas(score_batches, "qid string, doc_id long, partial double")
        .groupBy("qid", "doc_id")
        .agg(F.sum("partial").alias("score"))
    )
