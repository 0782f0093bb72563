"""Incremental indexing via Structured Streaming + segment merge (O9).

The reference's build is strictly batch (whole-corpus load,
/root/reference/src/encode/vector_writer.rs:96-158); Lucene underneath is
segment-based: each indexing thread writes a segment, merged on commit
(/root/reference/src/searcher/lucene/index.rs:63-64 delegates -threads). This
module brings the same segment model to Spark, plus a streaming front end:

* ``start_incremental_indexing`` — ``readStream`` over a webtext-shaped
  directory; every micro-batch becomes one immutable *segment* (its own
  postings/dictionary/doclen tables + stats) via ``foreachBatch``. Exactly-once
  per segment: segments are named by batch_id and rewritten idempotently on
  replay (Structured Streaming's checkpoint guarantees batch_id stability).

* ``open_segmented_index`` — query the union of segments with EXACT global
  BM25 semantics: global N/avgdl from summed segment stats, global df (and
  idf) from the merged dictionaries. Query-time scoring recomputes impacts
  from the decoded (tf, dl) with the global idf, so results are identical to
  a single batch build over the same docs (tested). Exhaustive path only: the
  per-block max_impact bounds were computed with segment-local idf, so the
  pruned path would need bound rescaling — compaction restores it.

* ``compact_segments`` — the segment-merge stage: decode every segment's
  posting blocks back to (term, doc_id, dl, tf) rows (Arrow, distributed),
  rebuild the global dictionary + salted block-compressed postings with global
  stats, checkpoint through the Catalog. After compaction the block-max pruned
  search path is valid again.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustserini_spark.operators.compress import decode_blocks_batch
from rustserini_spark.operators.index_build import (
    BM25Index,
    K1_DEFAULT,
    B_DEFAULT,
    BLOCK_SIZE_DEFAULT,
    MAX_GROUP_DEFAULT,
    _salted_postings,
    _sorted_postings,
    doclen_table,
    exploded_term_freqs,
    lucene_idf,
)

SEG_PREFIX = "seg_"


def write_segment(
    spark: SparkSession,
    docs: DataFrame,
    seg_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "porter",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    block_size: int = BLOCK_SIZE_DEFAULT,
    max_group: int = MAX_GROUP_DEFAULT,
) -> dict:
    """Build one immutable segment from a (micro-)batch of docs."""
    tf = exploded_term_freqs(docs, text_col, id_col, analyzer).persist()
    n_docs = docs.count()
    sum_dl = int(tf.agg(F.sum("tf")).collect()[0][0] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    doclen = doclen_table(docs, tf, id_col)
    dictionary = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .withColumn("idf", lucene_idf(F.col("df"), n_docs))
    )
    postings = _salted_postings(
        tf.join(dictionary.select("term", "df", "idf"), "term"),
        avgdl or 1.0, k1, b, block_size, max_group,
    )
    postings.write.mode("overwrite").parquet(os.path.join(seg_dir, "postings"))
    dictionary.write.mode("overwrite").parquet(os.path.join(seg_dir, "dictionary"))
    doclen.write.mode("overwrite").parquet(os.path.join(seg_dir, "doclen"))
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "analyzer": analyzer,
        "k1": k1,
        "b": b,
        "block_size": block_size,
    }
    with open(os.path.join(seg_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
    tf.unpersist()
    return stats


def start_incremental_indexing(
    spark: SparkSession,
    input_path: str,
    base_dir: str,
    schema,
    stream_checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "porter",
    available_now: bool = True,
    **build_kwargs,
):
    """readStream(parquet dir) -> one segment per micro-batch (foreachBatch)."""
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_dir = os.path.join(base_dir, f"{SEG_PREFIX}{batch_id:06d}")
        write_segment(
            spark, batch_df, seg_dir, text_col=text_col, id_col=id_col,
            analyzer=analyzer, **build_kwargs,
        )

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", stream_checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _segments(base_dir: str) -> list[str]:
    return sorted(
        os.path.join(base_dir, d)
        for d in os.listdir(base_dir)
        if d.startswith(SEG_PREFIX) and os.path.exists(os.path.join(base_dir, d, "stats.json"))
    )


def open_segmented_index(spark: SparkSession, base_dir: str) -> BM25Index:
    """Union of segments with exact global BM25 stats (see module docstring).
    Query with bm25_search (exhaustive); run compact_segments to re-enable the
    pruned path."""
    segs = _segments(base_dir)
    if not segs:
        raise FileNotFoundError(f"no segments under {base_dir}")
    stats = [json.load(open(os.path.join(s, "stats.json"))) for s in segs]
    n_docs = sum(s["n_docs"] for s in stats)
    sum_dl = sum(s["sum_dl"] for s in stats)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    s0 = stats[0]

    postings = None
    dictionary = None
    doclen = None
    for s in segs:
        p = spark.read.parquet(os.path.join(s, "postings"))
        d = spark.read.parquet(os.path.join(s, "dictionary"))
        dl = spark.read.parquet(os.path.join(s, "doclen"))
        postings = p if postings is None else postings.unionByName(p)
        dictionary = d if dictionary is None else dictionary.unionByName(d)
        doclen = dl if doclen is None else doclen.unionByName(dl)

    global_dict = (
        dictionary.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("idf", lucene_idf(F.col("df"), n_docs))
        .withColumn("max_impact", F.lit(None).cast("double"))
    )
    return BM25Index(
        postings=postings,
        dictionary=global_dict,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        k1=s0["k1"],
        b=s0["b"],
        analyzer=s0["analyzer"],
        block_size=s0["block_size"],
        meta={"segments": segs, "segmented": True},
    )


def decoded_postings(postings: DataFrame) -> DataFrame:
    """Blocks -> (term, doc_id, dl, tf) rows (Arrow-batched inverse of the
    build's encode stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            d, t, l, bidx = decode_blocks_batch(
                list(pdf["postings_bin"]), pdf["n_docs"].to_numpy()
            )
            yield pd.DataFrame(
                {
                    "term": pdf["term"].to_numpy()[bidx],
                    "doc_id": d,
                    "dl": l,
                    "tf": t,
                }
            )

    return postings.mapInPandas(run, "term string, doc_id long, dl long, tf long")


def compact_segments(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    max_group: int = MAX_GROUP_DEFAULT,
) -> BM25Index:
    """Segment merge (O9): per-segment posting blocks -> global salted
    block-compressed postings + dictionary with exact global stats."""
    seg_index = open_segmented_index(spark, base_dir)
    tf = decoded_postings(seg_index.postings)
    dictionary = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .withColumn("idf", lucene_idf(F.col("df"), seg_index.n_docs))
    )
    postings = _sorted_postings(
        tf.join(dictionary.select("term", "df", "idf"), "term"),
        seg_index.avgdl or 1.0,
        seg_index.k1,
        seg_index.b,
        seg_index.block_size,
        max_group,
    )
    postings.repartition("term").sortWithinPartitions("term", "shard", "salt", "block_seq").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "postings"))
    dictionary.write.mode("overwrite").parquet(os.path.join(out_dir, "dictionary"))
    seg_index.doclen.write.mode("overwrite").parquet(os.path.join(out_dir, "doclen"))
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(
            {
                "analyzer": seg_index.analyzer,
                "k1": seg_index.k1,
                "b": seg_index.b,
                "block_size": seg_index.block_size,
                "max_group": max_group,
                "n_docs": seg_index.n_docs,
                "avgdl": seg_index.avgdl,
                "fingerprints": {},
            },
            f,
        )
    from rustserini_spark.operators.index_build import load_index

    return load_index(spark, out_dir)
