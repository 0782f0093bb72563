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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustserini_spark.analysis import analyze_col, simple_tokens_col
from rustserini_spark.operators.compress import BLOCK_SIZE_DEFAULT, encode_group_blocks

K1_DEFAULT = 0.9  # Anserini SimpleSearcher defaults (reference delegation at
B_DEFAULT = 0.4  # /root/reference/src/searcher/lucene/searcher.rs:35)
MAX_GROUP_DEFAULT = 1 << 16  # max postings per (term, salt) group fed to one pandas group

N_SHARDS_DEFAULT = 32  # doc shards: the unit of distributed query evaluation

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
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


def exploded_term_freqs(docs: DataFrame, text_col: str, id_col: str, analyzer: str) -> DataFrame:
    """(term, doc_id, dl, tf) — analysis + per-doc term counting in ONE Arrow
    pass, emitted already exploded as flat primitive columns. tf is a
    per-document computation, so this relation needs NO corpus shuffle at all
    (the naive plan's explode + groupBy(term, doc) exchange is gone), and no
    nested map/array columns cross the Arrow boundary (measured 3-5x slower).
    Docs with zero tokens emit nothing here; collection stats account for them
    separately (n_docs from a plain count)."""
    from rustserini_spark.analysis import analyze_text, simple_tokenize_text
    from rustserini_spark.analysis.analyzer import (
        TF_RELATION_SCHEMA,
        term_freq_batches_factory,
    )

    fn = {"porter": analyze_text, "simple": simple_tokenize_text}.get(analyzer)
    if fn is None:
        raise ValueError(f"unknown analyzer mode {analyzer!r}")
    pairs = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    return pairs.mapInPandas(term_freq_batches_factory(fn), TF_RELATION_SCHEMA)


def term_frequencies(tokens_df: DataFrame) -> DataFrame:
    """(term, doc_id, dl, tf) from a legacy (doc_id, tokens) frame."""
    return (
        tokens_df.select(
            "doc_id", F.size("tokens").alias("dl"), F.explode("tokens").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doclen_table(docs: DataFrame, tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) for every doc, including zero-token docs (Lucene counts
    them in maxDoc). Derived from the tf relation + a left join — only used
    for the saved doclen artifact, never on the query path (dl is inline in
    postings)."""
    per_doc = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    all_ids = docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").fillna({"dl": 0})


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
    n_shards: int = N_SHARDS_DEFAULT,
) -> DataFrame:
    """(term, doc_id, dl, tf, df, idf) -> compressed posting blocks, one row per
    (term, shard, salt, block).

    Document-sharded layout (the distributed-IR standard): shard =
    pmod(xxhash64(doc_id), n_shards) partitions the corpus into disjoint doc
    sets, so each shard can evaluate queries against its own postings exactly
    and independently — query time shuffles matched blocks once (to shard
    groups), never per query. Within a (term, shard), an adaptive salt bounds
    the encode group at max_group postings, so even "the" at 10^12 docs never
    exceeds one pandas group's budget.
    """
    safe_avgdl = avgdl if avgdl > 0 else 1.0

    # SEGMENT-LOCAL ENCODE — zero corpus-scale shuffle (Lucene's own model:
    # each writer emits an immutable segment; merge happens later). The tf
    # relation carries ``seg``, assigned inside the analyzer where each doc's
    # rows are provably together: segments are doc-disjoint no matter how
    # joins or Arrow batch boundaries reorder/split rows here. salt = seg and
    # shard = seg mod n_shards give the query path its doc-disjoint grouping
    # key. The idf needed for block-max bounds arrives via a broadcast of the
    # (small) dictionary — the only exchange in the whole postings plan is the
    # dictionary's own partial agg.
    #
    # Trade-off, by design: tail terms get one tiny block per segment, so the
    # block-row count grows with segment count; streaming.compact_segments is
    # the merge stage that rewrites them into dense sorted global lists.
    joined = tf_with_dict.select("term", "doc_id", "tf", "dl", "idf", "seg")
    out_cols = [f.name for f in POSTINGS_SCHEMA.fields]

    def encode_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        # Knuth multiplicative mix: seg = (pid<<14)|counter has low bits that
        # are mostly zero, so a plain modulo would collapse every segment into
        # shard 0 and serialize the whole query path.
        shard = (((seg * 0x9E3779B1) & 0xFFFFFFFF) >> 16) % n_shards
        terms = pdf["term"].to_numpy()
        order = np.argsort(terms, kind="stable")
        terms = terms[order]
        d = pdf["doc_id"].to_numpy()[order]
        t = pdf["tf"].to_numpy()[order]
        l = pdf["dl"].to_numpy()[order]
        idf = pdf["idf"].to_numpy()[order]
        change = np.flatnonzero(terms[1:] != terms[:-1])
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(terms)]))
        acc = {c: [] for c in out_cols}
        for s, e in zip(starts, ends):
            cols = encode_group_blocks(
                d[s:e], t[s:e], l[s:e], float(idf[s]), k1, b, safe_avgdl, block_size
            )
            n = len(cols["block_seq"])
            acc["term"].append(np.full(n, terms[s], dtype=object))
            acc["shard"].append(np.full(n, shard, dtype=np.int32))
            acc["salt"].append(np.full(n, seg, dtype=np.int32))
            for c in ("block_seq", "first_doc", "last_doc", "n_docs", "max_impact"):
                acc[c].append(np.asarray(cols[c]))
            acc["postings_bin"].append(np.array(cols["postings_bin"], dtype=object))
        return pd.DataFrame({c: np.concatenate(acc[c]) if acc[c] else [] for c in out_cols})

    # groupBy(seg): a plain hash exchange of fixed-width rows (no sort, no
    # string keys) delivering each WHOLE segment (<= SEG_DOCS docs) to one
    # encode call — no fragmentation, no per-batch stitching, group size
    # bounded by the analyzer's segment cap.
    return joined.groupBy("seg").applyInPandas(encode_segment, POSTINGS_SCHEMA)


def _sorted_postings(
    tf_with_dict: DataFrame,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    max_group: int,
    n_shards: int = N_SHARDS_DEFAULT,
) -> DataFrame:
    """Merge/optimize encoder (the O9 segment-merge layout): one shuffle keyed
    by doc-hash-derived (term, shard, salt) + an in-partition sort, then a
    streaming run encoder. Produces dense, globally-merged posting sublists —
    the layout compaction rewrites fast-built segment postings into. Unlike
    the segment-local encoder it does not need a ``seg`` column (shard/salt
    derive from doc_id, so doc-disjointness is by hash)."""
    n_salts = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(max_group * n_shards))
    ).cast("int")
    keyed = tf_with_dict.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
    ).withColumn("salt", F.pmod(F.xxhash64("doc_id", F.lit(1)), n_salts).cast("int"))
    parts = keyed.select(
        "term", "shard", "salt", "doc_id", "tf", "dl", "idf"
    ).repartition("term", "shard", "salt").sortWithinPartitions("term", "shard", "salt")
    safe_avgdl = avgdl if avgdl > 0 else 1.0
    out_cols = [f.name for f in POSTINGS_SCHEMA.fields]

    def encode_runs(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        salts = pdf["salt"].to_numpy()
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1]) | (salts[1:] != salts[:-1])
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(pdf)]))
        d = pdf["doc_id"].to_numpy()
        t = pdf["tf"].to_numpy()
        l = pdf["dl"].to_numpy()
        idf = pdf["idf"].to_numpy()
        acc = {c: [] for c in out_cols}
        for s, e in zip(starts, ends):
            cols = encode_group_blocks(
                d[s:e], t[s:e], l[s:e], float(idf[s]), k1, b, safe_avgdl, block_size
            )
            n = len(cols["block_seq"])
            acc["term"].append(np.full(n, terms[s], dtype=object))
            acc["shard"].append(np.full(n, shards[s], dtype=np.int32))
            acc["salt"].append(np.full(n, salts[s], dtype=np.int32))
            for c in ("block_seq", "first_doc", "last_doc", "n_docs", "max_impact"):
                acc[c].append(np.asarray(cols[c]))
            acc["postings_bin"].append(np.array(cols["postings_bin"], dtype=object))
        return pd.DataFrame({c: np.concatenate(acc[c]) if acc[c] else [] for c in out_cols})

    def encode_stream(batches):
        carry = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last = pdf.iloc[-1]
            tail = (
                (pdf["term"].to_numpy() == last["term"])
                & (pdf["shard"].to_numpy() == last["shard"])
                & (pdf["salt"].to_numpy() == last["salt"])
            )
            n_tail = int(tail[::-1].cumprod().sum())
            cut = len(pdf) - n_tail
            carry = pdf.iloc[cut:].reset_index(drop=True)
            if cut:
                yield encode_runs(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield encode_runs(carry)

    return parts.mapInPandas(encode_stream, POSTINGS_SCHEMA)


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

    # Cache the flat analyzed tf relation: three downstream consumers (stats,
    # dictionary, postings) would otherwise re-run the Arrow analysis pass per
    # action. At true 10^12 scale this cache becomes a checkpointed stage
    # table (sources/catalog.py) instead of executor memory.
    tf = exploded_term_freqs(docs, text_col, id_col, analyzer).persist()

    # Collection stats: N counts every doc (zero-token docs included, matching
    # Lucene's maxDoc); avgdl = total token count / N, and Σtf == Σdl exactly.
    n_docs = docs.count()
    total_tokens = tf.agg(F.sum("tf")).collect()[0][0] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    doclen = doclen_table(docs, tf, id_col)

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
        tf_live = exploded_term_freqs(docs, text_col, id_col, analyzer)
        results.append(cat.write_stage("tf", tf_live, fp_tf))
        tf = cat.read(spark, "tf")
        results.append(cat.write_stage("doclen", doclen_table(docs, tf, id_col), fp_dl))
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
                sort_within=["term", "shard", "salt", "block_seq"],
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
