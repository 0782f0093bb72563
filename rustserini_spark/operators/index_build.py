"""Inverted-index construction as a declarative Spark plan (SURVEY.md §2 O3-O10).

The reference delegates the whole build to Anserini's ``IndexCollection`` over JNI
(/root/reference/src/searcher/lucene/index.rs:78-83). This module re-expresses the
same semantics as DataFrame operators designed for 10^12-document scale:

  explode(tokens)                       -> one row per (doc, term) occurrence
  groupBy(term, doc_id, dl).count       -> tf  (partial+final hash agg, map-side combine)
  groupBy(doc_id)/agg                   -> doc length + collection stats (N, avgdl)
  groupBy(term).agg(count, sum)         -> df/cf -> idf dictionary
  SALTED groupBy(term, salt)            -> head-term skew absorbed: a Zipf head term
                                           ("the" at 10^12 docs) is split across
                                           ceil(df / max_group) salt buckets, each
                                           an independently sorted posting sublist
  applyInPandas per (term, salt)        -> delta+varint blocks + block-max metadata

Posting lists are stored one row per (term, salt, block): no single giant row per
head term, every block independently skippable at query time (block-max WAND), and
the postings table can be written term-bucketed so parquet min/max stats prune
files for a query's term set. Doc length is stored inline in each posting (like
Lucene norms baked next to postings) so query time needs no doclen join.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustserini_spark.analysis import analyze_col, simple_tokens_col
from rustserini_spark.operators.compress import BLOCK_SIZE_DEFAULT, encode_group_blocks

K1_DEFAULT = 0.9  # Anserini SimpleSearcher defaults (reference delegation at
B_DEFAULT = 0.4  # /root/reference/src/searcher/lucene/searcher.rs:35)
MAX_GROUP_DEFAULT = 1 << 16  # max postings per (term, salt) group fed to one pandas group

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_seq", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_impact", T.DoubleType(), False),
        T.StructField("postings_bin", T.BinaryType(), False),
    ]
)


def tokens_col_for(mode: str):
    if mode == "porter":
        return analyze_col
    if mode == "simple":
        return simple_tokens_col
    raise ValueError(f"unknown analyzer mode {mode!r}")


@dataclass
class BM25Index:
    """A built index: four tables + scalar collection stats.

    Spark analog of the opaque Lucene index directory the reference opens at
    /root/reference/src/searcher/lucene/searcher.rs:25-46 (num_docs surfaced
    there == self.n_docs here).
    """

    postings: DataFrame  # POSTINGS_SCHEMA; one row per (term, salt, block)
    dictionary: DataFrame  # (term, df, cf, idf, max_impact)
    doclen: DataFrame  # (doc_id, dl) — kept for stats/ inspection; dl also inline
    n_docs: int
    avgdl: float
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    analyzer: str = "porter"
    block_size: int = BLOCK_SIZE_DEFAULT
    meta: dict = field(default_factory=dict)

    def materialize(self) -> "BM25Index":
        """Persist + force the query-time tables (postings, dictionary) so
        searches hit cached blocks instead of re-running the build DAG."""
        self.postings = self.postings.persist()
        self.postings.count()
        self.dictionary = self.dictionary.persist()
        self.dictionary.count()
        return self


def tokenize_docs(docs: DataFrame, text_col: str, id_col: str, analyzer: str) -> DataFrame:
    """(doc_id: long, tokens: array<string>) — the shared analysis entry point."""
    tok = tokens_col_for(analyzer)
    return docs.select(F.col(id_col).cast("long").alias("doc_id"), tok(text_col).alias("tokens"))


def term_frequencies(tokens_df: DataFrame) -> DataFrame:
    """(term, doc_id, dl, tf). dl is carried through the explode (doc_id -> dl is
    functional, so adding dl to the groupBy keys costs nothing and saves a
    doc-level join at 10^12 scale)."""
    return (
        tokens_df.select(
            "doc_id", F.size("tokens").alias("dl"), F.explode("tokens").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def lucene_idf(df_col, n_docs: int):
    """Lucene BM25Similarity idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def _salted_postings(
    tf_with_dict: DataFrame,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    max_group: int,
) -> DataFrame:
    """(term, doc_id, dl, tf, df, idf) -> compressed posting blocks, one row per
    (term, salt, block). Salt count adapts to df so no group exceeds max_group."""
    n_salts = F.greatest(F.lit(1), F.ceil(F.col("df") / F.lit(max_group))).cast("int")
    salted = tf_with_dict.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), n_salts).cast("int")
    )
    safe_avgdl = avgdl if avgdl > 0 else 1.0

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = encode_group_blocks(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["dl"].to_numpy(),
            float(pdf["idf"].iloc[0]),
            k1,
            b,
            safe_avgdl,
            block_size=block_size,
        )
        n = len(cols["block_seq"])
        return pd.DataFrame(
            {"term": [pdf["term"].iloc[0]] * n, "salt": [int(pdf["salt"].iloc[0])] * n, **cols},
            columns=[f.name for f in POSTINGS_SCHEMA.fields],
        )

    return salted.groupBy("term", "salt").applyInPandas(encode_group, POSTINGS_SCHEMA)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "porter",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    block_size: int = BLOCK_SIZE_DEFAULT,
    max_group: int = MAX_GROUP_DEFAULT,
) -> BM25Index:
    # A corpus arriving in fewer partitions than the cluster has task slots
    # serializes the (pandas-UDF) analysis stage; re-split it first. On a real
    # cluster the input table should already be partitioned/bucketed and this
    # is a no-op.
    parallelism = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)

    # Cache the analyzed tokens: three downstream consumers (stats, tf,
    # doclen) would otherwise re-run the pandas-UDF analysis per action. At
    # true 10^12 scale this cache becomes a checkpointed stage table
    # (sources/catalog.py) instead of executor memory.
    tokens_df = tokenize_docs(docs, text_col, id_col, analyzer).persist()

    # Doc length from tokens_df (not from the exploded table) so empty docs
    # still count toward N/avgdl, matching Lucene's maxDoc-based stats.
    doclen = tokens_df.select("doc_id", F.size("tokens").alias("dl"))
    stats_row = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs = int(stats_row["n_docs"])
    avgdl = float(stats_row["avgdl"] or 0.0)

    tf = term_frequencies(tokens_df).persist()

    dictionary = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .withColumn("idf", lucene_idf(F.col("df"), n_docs))
    )

    # Salted two-phase posting build: n_salts grows with df so no pandas group
    # exceeds max_group postings. Tail terms (the vast majority) get salt=0 —
    # a single group, no extra shuffle cost.
    tf_with_df = tf.join(dictionary.select("term", "df", "idf"), "term")
    postings = _salted_postings(tf_with_df, avgdl, k1, b, block_size, max_group)

    # Per-term global score upper bound for MaxScore/WAND term ordering.
    dictionary = dictionary.join(
        postings.groupBy("term").agg(F.max("max_impact").alias("max_impact")),
        "term",
        "left",
    )

    return BM25Index(
        postings=postings,
        dictionary=dictionary,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        k1=k1,
        b=b,
        analyzer=analyzer,
        block_size=block_size,
    )


def expected_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# ------------------------------------------------- checkpointed (resumable) --


def build_index_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
    input_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "porter",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    block_size: int = BLOCK_SIZE_DEFAULT,
    max_group: int = MAX_GROUP_DEFAULT,
    postings_buckets: int | None = None,
) -> tuple[BM25Index, list]:
    """Resumable index build: every stage checkpoints through the Catalog with
    per-partition lineage; a rerun skips stages whose fingerprint matches (the
    north-rule resume semantics — kill it after any stage, rerun, identical
    final tables). Returns (index, [StageResult...]).

    Physical layout: the postings table is repartitioned by term and sorted
    within files by (term, salt, block_seq) so a query's isin(term) filter
    prunes parquet row groups via min/max stats.
    """
    from rustserini_spark.sources.catalog import Catalog, fingerprint

    cat = Catalog(checkpoint_dir)
    results = []
    fp_base = fingerprint("v1", input_id, analyzer, text_col, id_col)

    fp_tok = fingerprint(fp_base, "tokens")
    fp_tf = fingerprint(fp_tok, "tf")
    fp_dl = fingerprint(fp_tok, "doclen")

    need_tf = not cat.is_current("tf", fp_tf)
    need_dl = not cat.is_current("doclen", fp_dl)
    if need_tf or need_dl:
        parallelism = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < parallelism:
            docs = docs.repartition(parallelism)
        tokens_df = tokenize_docs(docs, text_col, id_col, analyzer).persist()
        results.append(
            cat.write_stage("doclen", tokens_df.select("doc_id", F.size("tokens").alias("dl")), fp_dl)
        )
        results.append(cat.write_stage("tf", term_frequencies(tokens_df), fp_tf))
        tokens_df.unpersist()
    else:
        results.append(cat.write_stage("doclen", None, fp_dl))  # returns reused
        results.append(cat.write_stage("tf", None, fp_tf))

    doclen = cat.read(spark, "doclen")
    tf = cat.read(spark, "tf")

    stats = cat.read_json("stats.json")
    if not stats or stats.get("fingerprint") != fp_dl:
        row = doclen.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")).collect()[0]
        stats = {
            "n_docs": int(row["n"]),
            "avgdl": float(row["a"] or 0.0),
            "fingerprint": fp_dl,
        }
        cat.write_json("stats.json", stats)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    fp_dict = fingerprint(fp_tf, "dictionary", n_docs)
    if not cat.is_current("dictionary", fp_dict):
        dictionary = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .withColumn("idf", lucene_idf(F.col("df"), n_docs))
        )
        results.append(cat.write_stage("dictionary", dictionary, fp_dict))
    else:
        results.append(cat.write_stage("dictionary", None, fp_dict))
    dictionary = cat.read(spark, "dictionary")

    fp_post = fingerprint(fp_dict, "postings", k1, b, block_size, max_group, avgdl)
    if not cat.is_current("postings", fp_post):
        tf_with_df = tf.join(dictionary.select("term", "df", "idf"), "term")
        postings = _salted_postings(tf_with_df, avgdl, k1, b, block_size, max_group)
        results.append(
            cat.write_stage(
                "postings",
                postings,
                fp_post,
                repartition_by=["term"],
                n_partitions=postings_buckets,
                sort_within=["term", "salt", "block_seq"],
            )
        )
    else:
        results.append(cat.write_stage("postings", None, fp_post))
    postings = cat.read(spark, "postings")

    # fold the per-term global upper bound into the dictionary view at read
    # time (cheap re-agg over the small postings-metadata columns)
    dict_full = dictionary.join(
        postings.groupBy("term").agg(F.max("max_impact").alias("max_impact")), "term", "left"
    )

    cat.write_json(
        "index.json",
        {
            "analyzer": analyzer,
            "k1": k1,
            "b": b,
            "block_size": block_size,
            "max_group": max_group,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "fingerprints": {"tf": fp_tf, "doclen": fp_dl, "dictionary": fp_dict, "postings": fp_post},
        },
    )
    index = BM25Index(
        postings=postings,
        dictionary=dict_full,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        k1=k1,
        b=b,
        analyzer=analyzer,
        block_size=block_size,
        meta={"checkpoint_dir": checkpoint_dir},
    )
    return index, results


def load_index(spark: SparkSession, checkpoint_dir: str) -> BM25Index:
    """Open a previously built index (the reference's LuceneSearcher::new
    analog — /root/reference/src/searcher/lucene/searcher.rs:25-46)."""
    from rustserini_spark.sources.catalog import Catalog

    cat = Catalog(checkpoint_dir)
    meta = cat.read_json("index.json")
    if not meta:
        raise FileNotFoundError(f"no index.json under {checkpoint_dir}")
    postings = cat.read(spark, "postings")
    dictionary = cat.read(spark, "dictionary").join(
        postings.groupBy("term").agg(F.max("max_impact").alias("max_impact")), "term", "left"
    )
    return BM25Index(
        postings=postings,
        dictionary=dictionary,
        doclen=cat.read(spark, "doclen"),
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        k1=meta["k1"],
        b=meta["b"],
        analyzer=meta["analyzer"],
        block_size=meta["block_size"],
        meta={"checkpoint_dir": checkpoint_dir},
    )
