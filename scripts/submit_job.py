"""spark-submit entry point: build a BM25 index over a webtext table and run
the canonical query set — the north rule's shipping contract
("the whole pipeline ships via spark-submit --py-files with no per-row Python").

Usage (see scripts/spark_submit_demo.sh):

    zip -r /tmp/rustserini_spark.zip rustserini_spark oracle
    spark-submit --master 'local[8]' --py-files /tmp/rustserini_spark.zip \
        scripts/submit_job.py <webtext_parquet> <checkpoint_dir> [k]

The job imports the engine from the shipped zip (sys.path via --py-files),
builds a resumable checkpointed index and prints top-k results as JSON lines.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    webtext_path = sys.argv[1]
    ckpt = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = SparkSession.builder.appName("rustserini-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rustserini_spark.operators.search import bm25_search_pruned
    from rustserini_spark.operators.webtext import index_webtext, resolve_urls

    webtext = spark.read.parquet(webtext_path)
    wt = index_webtext(
        spark, webtext, lang="en", checkpoint_dir=ckpt, input_id=webtext_path
    )
    queries = spark.createDataFrame(
        [
            ("cq", "did scientific minds lead to the success of the manhattan project"),
            ("c1", "atomic bomb world war"),
            ("c2", "history of modern physics"),
        ],
        "qid string, query string",
    )
    hits = resolve_urls(bm25_search_pruned(wt.index, queries, k=k), wt.docmap)
    for r in hits.orderBy("qid", "rank").collect():
        print(
            "RESULT "
            + json.dumps(
                {"qid": r.qid, "rank": r.rank, "url": r.url, "score": round(r.score, 6)}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
