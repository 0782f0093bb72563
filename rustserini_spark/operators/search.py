"""BM25 top-k retrieval over the block-compressed index (SURVEY.md §2 O11-O15).

The reference hands queries to Lucene's SimpleSearcher over JNI
(/root/reference/src/searcher/lucene/searcher.rs:86-90) where analysis, BM25
scoring (k1=0.9, b=0.4), WAND pruning and the top-k heap all happen. Here the
same lifecycle is a Spark plan:

  queries -> analyze (SAME UDF as indexing) -> (qid, term, qtf)
  -> broadcast-join dictionary (idf, per-term upper bound)        [O11]
  -> isin-filter + join postings blocks (parquet min/max pruning) [O12]
  -> score                                                        [O13]
  -> top-k with Lucene's tie-break (score desc, doc_id asc)       [O14]

Two scoring strategies, both returning identical rankings:

* ``bm25_search`` (exhaustive, arbitrarily scalable): decode every matching
  block in ``mapInPandas`` -> partial scores -> groupBy(qid, doc_id) sum ->
  window top-k. One shuffle on (qid, doc_id), one on qid. Use for huge fan-out
  or head-term-dominated workloads: nothing ever materializes one query's full
  postings in a single task.

* ``bm25_search_pruned`` (block-max pruned, per-query task): all of a query's
  blocks group to one ``applyInPandas`` task which runs a lossless
  MaxScore/block-max algorithm in NumPy — blocks whose upper bound cannot reach
  the running top-k threshold are never decoded. Queries parallelize across
  tasks (the reference's batch_search threads ⇔ Spark tasks,
  /root/reference/src/searcher/lucene/searcher.rs:101-154). Preferred for
  interactive k<<corpus retrieval; falls back to the exhaustive plan's answer
  exactly (tested rank-identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustserini_spark.operators.compress import (
    bm25_impact,
    decode_blocks_batch,
    decode_posting_block,
)
from rustserini_spark.operators.index_build import BM25Index, tokens_col_for

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)


def query_terms(queries: DataFrame, analyzer: str, qid_col: str = "qid", query_col: str = "query") -> DataFrame:
    """(qid, term, qtf): a duplicated query term scores once per occurrence in
    Lucene's BooleanQuery, i.e. its contribution is multiplied by qtf.

    Distributed variant — use for huge query batches (millions of rows).
    Interactive search uses query_terms_local instead: a handful of query
    strings does not justify a Python-UDF stage across the cluster.
    """
    tok = tokens_col_for(analyzer)
    return (
        queries.select(F.col(qid_col).cast("string").alias("qid"), tok(query_col).alias("terms"))
        .select("qid", F.explode("terms").alias("term"))
        .groupBy("qid", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )


def query_terms_local(queries: DataFrame, analyzer: str, qid_col: str = "qid", query_col: str = "query"):
    """Driver-side query analysis with the SAME shared analyze function the
    index build uses (parity by construction). Returns (rows, terms): rows =
    [(qid, term, qtf)], terms = sorted distinct term list for scan pruning."""
    from collections import Counter

    from rustserini_spark.analysis import analyze_text, simple_tokenize_text

    analyze = analyze_text if analyzer == "porter" else simple_tokenize_text
    rows = []
    terms = set()
    for r in queries.select(qid_col, query_col).collect():
        c = Counter(analyze(r[query_col]))
        for term, qtf in c.items():
            rows.append((str(r[qid_col]), term, qtf))
            terms.add(term)
    return rows, sorted(terms)


def _matching_blocks(index: BM25Index, queries: DataFrame):
    """Join the analyzed query set with dictionary + posting blocks.

    Query analysis happens driver-side (tiny) and the term list becomes an
    isin filter that Catalyst pushes into the parquet scan — at scale this is
    what prunes a term-bucketed postings table down to a handful of files.
    The (qid, term, qtf) frame is a single-partition broadcast.
    """
    spark = queries.sparkSession
    qt_rows, terms = query_terms_local(queries, index.analyzer)
    if not terms:
        return None
    qt = spark.createDataFrame(qt_rows, "qid string, term string, qtf long").coalesce(1)
    dict_sub = index.dictionary.filter(F.col("term").isin(terms)).select("term", "idf")
    blocks = index.postings.filter(F.col("term").isin(terms))
    return blocks.join(F.broadcast(qt), "term").join(F.broadcast(dict_sub), "term")


def _empty_result(spark) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "score", "rank")
    )


def bm25_search(index: BM25Index, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exhaustive distributed scoring (no pruning): rank-identical reference
    semantics, scales to any posting-list size."""
    joined = _matching_blocks(index, queries)
    if joined is None:
        return _empty_result(queries.sparkSession)
    k1, b, avgdl = index.k1, index.b, (index.avgdl or 1.0)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ns = pdf["n_docs"].to_numpy()
            d, t, l, block_idx = decode_blocks_batch(list(pdf["postings_bin"]), ns)
            idf = pdf["idf"].to_numpy(dtype=np.float64)[block_idx]
            qtf = pdf["qtf"].to_numpy(dtype=np.float64)[block_idx]
            imp = bm25_impact(t, l, idf, k1, b, avgdl) * qtf
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy()[block_idx],
                    "doc_id": d,
                    "partial": imp,
                }
            )

    partial_schema = "qid string, doc_id long, partial double"
    scored = (
        joined.mapInPandas(score_batches, partial_schema)
        .groupBy("qid", "doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    return _topk(scored, k)


def _prune_and_score(pdf: pd.DataFrame, k: int, k1: float, b: float, avgdl: float) -> pd.DataFrame:
    """Lossless block-max MaxScore for one query's blocks (pure NumPy).

    1. Seed threshold θ by exactly scoring the docs of the single best block.
    2. Candidate generation: a block is skipped when
       qtf·max_impact(block) + Σ_{other terms} U < θ — any doc living only in
       skipped blocks provably cannot reach the top-k.
    3. Exact verification: candidates are scored exactly against every term,
       decoding only blocks whose docid range intersects the candidate set.
    """
    qid = pdf["qid"].iloc[0]
    terms = pdf["term"].to_numpy()
    n_docs_arr = pdf["n_docs"].to_numpy(dtype=np.int64)
    first_doc = pdf["first_doc"].to_numpy(dtype=np.int64)
    last_doc = pdf["last_doc"].to_numpy(dtype=np.int64)
    max_impact = pdf["max_impact"].to_numpy(dtype=np.float64)
    qtf = pdf["qtf"].to_numpy(dtype=np.float64)
    idf = pdf["idf"].to_numpy(dtype=np.float64)
    bufs = list(pdf["postings_bin"])
    weighted_max = qtf * max_impact

    # per-term weighted upper bound U_t = qtf * max block impact
    uniq_terms, term_idx = np.unique(terms, return_inverse=True)
    U = np.zeros(uniq_terms.size)
    np.maximum.at(U, term_idx, weighted_max)
    sumU = float(U.sum())

    def decode_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch-decode the given block rows -> (doc_ids, weighted impacts, row_map)."""
        d, t, l, bidx = decode_blocks_batch([bufs[i] for i in rows], n_docs_arr[rows])
        rmap = rows[bidx]
        imp = bm25_impact(t, l, idf[rmap], k1, b, avgdl) * qtf[rmap]
        return d, imp, rmap

    def exact_scores(cand: np.ndarray) -> np.ndarray:
        """Exact scoring of the candidate set: per block-row range prefilter,
        one batch decode, one searchsorted accumulate."""
        scores = np.zeros(cand.size, dtype=np.float64)
        if cand.size == 0:
            return scores
        lo = np.searchsorted(cand, first_doc, side="left")
        hi = np.searchsorted(cand, last_doc, side="right")
        rows = np.flatnonzero(lo != hi)
        if rows.size == 0:
            return scores
        d, imp, _ = decode_rows(rows)
        idx = np.searchsorted(cand, d)
        ok = idx < cand.size
        match = np.zeros(d.size, dtype=bool)
        match[ok] = cand[idx[ok]] == d[ok]
        np.add.at(scores, idx[match], imp[match])
        return scores

    # --- seed θ with the overall best block
    best_row = int(np.argmax(weighted_max))
    seed_docs = np.unique(decode_rows(np.array([best_row]))[0])
    seed_scores = exact_scores(seed_docs)
    theta = 0.0
    if seed_docs.size >= k:
        theta = float(np.partition(seed_scores, seed_scores.size - k)[seed_scores.size - k])

    # --- candidate generation with block skipping:
    # keep block b of term t when qtf·max_impact(b) + Σ_{t'≠t} U_{t'} >= θ;
    # a doc living only in skipped blocks provably cannot reach the top-k
    others = sumU - U[term_idx]
    keep = np.flatnonzero(weighted_max + others >= theta)
    cand = np.unique(np.concatenate([seed_docs, decode_rows(keep)[0]]))

    scores = exact_scores(cand)
    n = min(k, cand.size)
    if n == 0:
        return pd.DataFrame(columns=["qid", "doc_id", "score", "rank"])
    # top-k with score desc, doc_id asc tie-break (Lucene order)
    order = np.lexsort((cand, -scores))[:n]
    return pd.DataFrame(
        {
            "qid": qid,
            "doc_id": cand[order],
            "score": scores[order],
            "rank": np.arange(1, n + 1, dtype=np.int32),
        }
    )


def bm25_search_pruned(index: BM25Index, queries: DataFrame, k: int = 10) -> DataFrame:
    joined = _matching_blocks(index, queries)
    if joined is None:
        return _empty_result(queries.sparkSession)
    k1, b, avgdl = index.k1, index.b, (index.avgdl or 1.0)

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["qid", "doc_id", "score", "rank"])
        return _prune_and_score(pdf, k, k1, b, avgdl)

    return joined.groupBy("qid").applyInPandas(per_query, RESULT_SCHEMA)
