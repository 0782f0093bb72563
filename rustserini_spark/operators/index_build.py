"""Inverted-index construction as a declarative Spark plan (SURVEY.md §2 O3-O10).

The reference delegates the whole build to Anserini's ``IndexCollection`` over JNI
(/root/reference/src/searcher/lucene/index.rs:78-83). This module re-expresses the
same semantics as DataFrame operators designed for 10^12-document scale.

ONE-PASS BUILD (the Lucene segment-writer model, Spark-shaped): a single
``mapInPandas`` stage analyzes each document, accumulates per-segment inverted
lists (a segment = up to ``seg_docs`` docs of ONE task — the only place a doc's
postings are provably together), and emits delta+varint block-compressed posting
rows directly. The corpus is never exploded into a (term, doc) relation, never
shuffled, and never crosses the Arrow boundary twice:

  docs ──mapInPandas──▶ postings(term, shard, salt, block, max_tf, min_dl, …)
                             │  (block METADATA only — tiny vs the corpus)
                             └─groupBy(term)──▶ dictionary(df, cf, idf)

Everything collection-global (idf, avgdl) stays OUT of the encoded blocks:
blocks carry idf-free bound metadata (max_tf, min_dl — see compress.py), the
dictionary and collection stats are aggregated FROM the block metadata
(df = Σ n_docs, cf = Σ block_cf per term; Σdl = Σ block_cf overall), and score
bounds are evaluated with current global stats at query time. Consequences:

  * zero corpus-scale shuffles in the whole build (the dictionary agg's input
    is block metadata, ~|vocab|·n_segments rows);
  * segments built at different times/parallelism merge exactly — streaming
    micro-batch segments support block-max pruned search with NO compaction;
  * the build stage is pure map → embarrassingly parallel, CPU-bound on the
    analyzer, which is precisely the shape that scales linearly with executors.

Head-term skew: a Zipf head term ("the" at 10^12 docs) never forms one giant
group — its postings are split across segments by construction (≤ seg_docs
docs each), each an independently sorted, independently skippable sublist.
``shard`` (a hash-mix of the segment id, modulo the build-time ``n_shards``
parameter) partitions the corpus into doc-disjoint groups for distributed
query evaluation; ``salt`` carries the segment id for merge/compaction.
Doc length is stored inline in each posting (like Lucene norms baked next to
postings) so query time needs no doclen join.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustserini_spark.analysis import analyze_col, simple_tokens_col
from rustserini_spark.operators.compress import (
    BLOCK_SIZE_DEFAULT,
    block_upper_bound,
    encode_runs_blocks,
)

K1_DEFAULT = 0.9  # Anserini SimpleSearcher defaults (reference delegation at
B_DEFAULT = 0.4  # /root/reference/src/searcher/lucene/searcher.rs:35)

SEG_DOCS_DEFAULT = 1 << 16  # docs per segment: bounds the in-task encode state
N_SHARDS_DEFAULT = 32  # doc shards: the unit of distributed query evaluation

# materialize() preloads the driver-side term->idf map up to this vocab size
# (~75 MB at 1M terms). Web-scale vocabularies (100M+ terms) skip the preload
# and fall back to memoized per-batch filtered lookups.
MAX_IDF_CACHE_TERMS = 1_000_000

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("salt", T.LongType(), False),  # segment id (int64)
        T.StructField("block_seq", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField("block_cf", T.LongType(), False),
        T.StructField("postings_bin", T.BinaryType(), False),
    ]
)

_POSTINGS_COLS = [f.name for f in POSTINGS_SCHEMA.fields]


def shard_of_segment(seg: int, n_shards: int) -> int:
    """Doc shard for a segment: 64-bit multiplicative mix, high bits taken.
    seg = (pid << 32) | counter has structured low bits — a plain modulo would
    collapse segments onto few shards and serialize the query path."""
    return int(((seg * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) >> 32) % n_shards


def tokens_col_for(mode: str):
    if mode == "porter":
        return analyze_col
    if mode == "simple":
        return simple_tokens_col
    raise ValueError(f"unknown analyzer mode {mode!r}")


def analyze_fn_for(mode: str):
    from rustserini_spark.analysis import analyze_text, simple_tokenize_text

    fn = {"porter": analyze_text, "simple": simple_tokenize_text}.get(mode)
    if fn is None:
        raise ValueError(f"unknown analyzer mode {mode!r}")
    return fn


@dataclass
class BM25Index:
    """A built index: query-time tables + scalar collection stats.

    Spark analog of the opaque Lucene index directory the reference opens at
    /root/reference/src/searcher/lucene/searcher.rs:25-46 (num_docs surfaced
    there == self.n_docs here).
    """

    postings: DataFrame  # POSTINGS_SCHEMA; one row per (term, shard, salt, block)
    dictionary: DataFrame  # (term, df, cf, idf, max_impact)
    doclen: DataFrame  # (doc_id, dl) — stats/inspection only; dl is inline in postings
    n_docs: int
    avgdl: float
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    analyzer: str = "porter"
    block_size: int = BLOCK_SIZE_DEFAULT
    n_shards: int = N_SHARDS_DEFAULT
    meta: dict = field(default_factory=dict)
    # driver-side term -> idf map, preloaded once at materialize() when the
    # vocabulary is small enough; None = look up per batch (memoized below).
    # Killing the per-batch dictionary .collect() was round 3's measured
    # ~2.5s fixed query-batch floor — a per-BATCH driver job that does not
    # shrink with executors and so caps batch-scaling efficiency.
    idf_cache: dict | None = field(default=None, repr=False)
    _idf_memo: dict = field(default_factory=dict, repr=False)

    def materialize(self, timings: dict | None = None) -> "BM25Index":
        """Persist + force the query-time tables so searches hit cached blocks
        instead of re-running the build DAG. The one-pass encoder's postings
        keep the encode tasks' DOC-ALIGNED partitioning (a doc's postings never
        leave the task that encoded them), so the pruned search runs
        mapInPandas per cached partition — query batches run with zero
        shuffle. Disk-opened indexes instead shuffle matched blocks once to
        their shard group per batch.

        Also preloads the driver idf map (vocab permitting): a once-per-index
        cost in the build amortized over every future query batch, replacing a
        per-batch driver job."""
        import time as _time

        t0 = _time.perf_counter()
        self.postings = self.postings.persist()
        self.postings.count()
        t1 = _time.perf_counter()
        self.dictionary = self.dictionary.persist()
        n_terms = self.dictionary.count()
        if self.idf_cache is None and n_terms <= MAX_IDF_CACHE_TERMS:
            pdf = self.dictionary.select("term", "idf").toPandas()
            self.idf_cache = dict(
                zip(pdf["term"].tolist(), pdf["idf"].astype(float).tolist())
            )
        if timings is not None:
            timings["postings_count_sec"] = round(t1 - t0, 3)
            timings["dictionary_agg_sec"] = round(_time.perf_counter() - t1, 3)
        return self

    def idf_for_terms(self, terms: list[str]) -> dict[str, float]:
        """term -> idf for exactly the given terms (absent = OOV, omitted).

        Preloaded map when the vocab fits (one lookup, zero Spark jobs per
        batch); otherwise one filtered collect for terms not yet memoized —
        repeated / overlapping batches converge to zero jobs. OOV terms are
        negative-cached so they never re-trigger a lookup."""
        if self.idf_cache is not None:
            return {t: self.idf_cache[t] for t in terms if t in self.idf_cache}
        missing = [t for t in terms if t not in self._idf_memo]
        if missing:
            rows = (
                self.dictionary.filter(F.col("term").isin(missing))
                .select("term", "idf")
                .collect()
            )
            for r in rows:
                self._idf_memo[r["term"]] = float(r["idf"])
            for t in missing:
                self._idf_memo.setdefault(t, None)  # negative-cache OOV
        return {t: v for t in terms if (v := self._idf_memo.get(t)) is not None}


def tokenize_docs(docs: DataFrame, text_col: str, id_col: str, analyzer: str) -> DataFrame:
    """(doc_id: long, tokens: array<string>) — the shared analysis entry point."""
    tok = tokens_col_for(analyzer)
    return docs.select(F.col(id_col).cast("long").alias("doc_id"), tok(text_col).alias("tokens"))


def exploded_term_freqs(docs: DataFrame, text_col: str, id_col: str, analyzer: str) -> DataFrame:
    """(term, doc_id, dl, tf, seg) — analysis + per-doc term counting in ONE
    Arrow pass, emitted already exploded as flat primitive columns (inspection
    / oracle surface; the index build itself encodes blocks in-pass and never
    materializes this relation). Zero corpus shuffles."""
    from rustserini_spark.analysis.analyzer import (
        TF_RELATION_SCHEMA,
        term_freq_batches_factory,
    )

    fn = analyze_fn_for(analyzer)
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
    them in maxDoc)."""
    per_doc = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    all_ids = docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").fillna({"dl": 0})


def doclen_from_postings(docs: DataFrame, postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) recovered from the index itself (dl is inline in every
    posting). Lazy: only evaluated when the doclen artifact is actually read —
    it is never on the build or query hot path."""
    from rustserini_spark.streaming.incremental import decoded_postings

    per_doc = decoded_postings(postings).groupBy("doc_id").agg(F.first("dl").alias("dl"))
    all_ids = docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").fillna({"dl": 0})


def lucene_idf(df_col, n_docs: int):
    """Lucene BM25Similarity idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def expected_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# ------------------------------------------------------------ one-pass encode --


def _encode_segment_pdf(
    analyze_fn, doc_ids, texts, seg: int, block_size: int, n_shards: int
) -> pd.DataFrame | None:
    """Analyze + count + block-encode ONE segment's documents -> postings rows."""
    terms_l: list = []
    tfs_l: list = []
    docs_np: list = []
    dls_np: list = []
    for doc_id, text in zip(doc_ids, texts):
        toks = analyze_fn(text)
        if not toks:
            continue
        c = Counter(toks)
        terms_l.extend(c.keys())
        tfs_l.extend(c.values())
        docs_np.append(np.full(len(c), doc_id, dtype=np.int64))
        dls_np.append(np.full(len(c), len(toks), dtype=np.int64))
    if not terms_l:
        return None
    terms = np.asarray(terms_l, dtype=object)
    order = np.argsort(terms, kind="stable")
    terms_s = terms[order]
    new_run = np.empty(terms_s.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = terms_s[1:] != terms_s[:-1]
    run_id = np.cumsum(new_run) - 1
    cols = encode_runs_blocks(
        run_id,
        np.concatenate(docs_np)[order],
        np.asarray(tfs_l, dtype=np.int64)[order],
        np.concatenate(dls_np)[order],
        block_size,
    )
    run_terms = terms_s[new_run]
    shard = shard_of_segment(seg, n_shards)
    nb = len(cols["postings_bin"])
    return pd.DataFrame(
        {
            "term": run_terms[cols["run_idx"]],
            "shard": np.full(nb, shard, dtype=np.int32),
            "salt": np.full(nb, seg, dtype=np.int64),
            "block_seq": cols["block_seq"].astype(np.int32),
            "first_doc": cols["first_doc"],
            "last_doc": cols["last_doc"],
            "n_docs": cols["n_docs"].astype(np.int32),
            "max_tf": cols["max_tf"],
            "min_dl": cols["min_dl"],
            "block_cf": cols["block_cf"],
            "postings_bin": np.asarray(cols["postings_bin"], dtype=object),
        }
    )


def encode_docs_factory(
    analyze_fn,
    block_size: int = BLOCK_SIZE_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
    seg_docs: int = SEG_DOCS_DEFAULT,
):
    """mapInPandas generator: (doc_id, <text>) batches -> block-compressed
    posting rows (POSTINGS_SCHEMA), the entire index-build data path in one
    Arrow pass.

    Segment ids are assigned here — the one place where a document's postings
    are provably all together — so every doc belongs to exactly one segment no
    matter how upstream exchanges split batches. ``seg = (pid << 32) | counter``
    as int64: partition ids to 2^31 and 2^32 segments per task, no overflow at
    10^12-doc scale (round-1's int32 (pid<<14|ctr) overflowed at pid >= 2^17).
    """

    def gen(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        seg_counter = 0
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf.iloc[:, 0].to_numpy()
            texts = pdf.iloc[:, 1]
            for lo in range(0, len(pdf), seg_docs):
                hi = min(lo + seg_docs, len(pdf))
                seg = (pid << 32) | seg_counter
                seg_counter += 1
                out = _encode_segment_pdf(
                    analyze_fn, doc_ids[lo:hi], texts.iloc[lo:hi], seg, block_size, n_shards
                )
                if out is not None:
                    yield out

    return gen


def encode_postings(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    analyzer: str,
    block_size: int = BLOCK_SIZE_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
    seg_docs: int = SEG_DOCS_DEFAULT,
) -> DataFrame:
    """docs -> block-compressed postings, zero shuffles (pure map stage)."""
    pairs = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    return pairs.mapInPandas(
        encode_docs_factory(analyze_fn_for(analyzer), block_size, n_shards, seg_docs),
        POSTINGS_SCHEMA,
    )


def dictionary_from_postings(
    postings: DataFrame, n_docs: int, avgdl: float, k1: float, b: float
) -> DataFrame:
    """(term, df, cf, idf, max_impact) aggregated from block METADATA — the
    only exchange in the whole build, over ~|vocab|·n_segments rows. Valid
    because segments (and blocks within a term) are doc-disjoint: df = Σ
    n_docs, cf = Σ block_cf. max_impact is the per-term global score upper
    bound for MaxScore term ordering, computed from the idf-free block bounds
    under the supplied global stats."""
    safe_avgdl = avgdl if avgdl > 0 else 1.0
    base = F.col("max_tf") / (
        F.col("max_tf") + k1 * (1.0 - b + b * F.col("min_dl") / safe_avgdl)
    )
    return (
        postings.groupBy("term")
        .agg(
            F.sum("n_docs").alias("df"),
            F.sum("block_cf").alias("cf"),
            F.max(base).alias("_base"),
        )
        .withColumn("idf", lucene_idf(F.col("df"), n_docs))
        .withColumn("max_impact", F.col("idf") * F.col("_base"))
        .drop("_base")
    )


def assemble_index(
    postings_raw: DataFrame,
    n_docs: int,
    all_ids: DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    analyzer: str = "porter",
    block_size: int = BLOCK_SIZE_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
) -> BM25Index:
    """Raw encoded postings -> queryable BM25Index: doc-aligned cache, stats +
    dictionary from block metadata. ``all_ids`` is a (doc_id) relation
    covering every doc (zero-token docs included) for the lazy doclen artifact.

    The one-pass encoder's output is already DOC-ALIGNED: a document's
    postings all live in the one segment its task encoded, so every cached
    partition holds complete postings for a disjoint doc set. Exact local
    top-k per partition is therefore valid as-is — the postings are persisted
    WITHOUT any exchange, and the pruned search runs mapInPandas per cached
    partition: zero shuffles at build beyond the encode input, zero shuffles
    per query batch (meta["doc_aligned"] switches the search plan)."""
    postings = postings_raw.persist()

    # Collection stats from block metadata: Σ block_cf == Σ dl exactly; N
    # counts every doc (zero-token docs included, matching Lucene's maxDoc).
    total_tokens = postings.agg(F.sum("block_cf")).collect()[0][0] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    dictionary = dictionary_from_postings(postings, n_docs, avgdl, k1, b)
    doclen = doclen_from_postings(all_ids, postings, "doc_id")

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
        n_shards=n_shards,
        meta={"doc_aligned": True},
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "porter",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    block_size: int = BLOCK_SIZE_DEFAULT,
    seg_docs: int = SEG_DOCS_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
    n_docs: int | None = None,
) -> BM25Index:
    """One-pass in-memory build. ``n_shards`` is a first-class build parameter
    recorded on the index (query-path parallelism = shard count); pass
    ``n_docs`` if the caller already knows the corpus size (skips one count)."""
    # A corpus arriving in fewer partitions than the cluster has task slots
    # serializes the (pandas-UDF) encode stage; re-split it first. On a real
    # cluster the input table should already be partitioned and this is a no-op.
    # (JVM-side partition count: no Python RDD materialization.)
    # count BEFORE the fan-out repartition: the count job then runs against
    # the raw scan (column-pruned, no Exchange) instead of scanning through
    # the repartition shuffle — same value, one cheaper job.
    if n_docs is None:
        n_docs = docs.count()
    parallelism = spark.sparkContext.defaultParallelism
    if docs._jdf.rdd().getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)
    postings_raw = encode_postings(
        docs, text_col, id_col, analyzer, block_size, n_shards, seg_docs
    )
    all_ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return assemble_index(
        postings_raw, n_docs, all_ids, k1, b, analyzer, block_size, n_shards
    )


# ------------------------------------------------------ merge/compaction layout --


def _sorted_postings(
    tf_rel: DataFrame,
    df_by_term: DataFrame,
    block_size: int,
    max_group: int,
    n_shards: int = N_SHARDS_DEFAULT,
) -> DataFrame:
    """Merge/optimize encoder (the O9 segment-merge layout): one shuffle keyed
    by doc-hash-derived (term, shard, salt) + an in-partition sort, then a
    streaming run encoder. Produces dense, globally-merged posting sublists —
    the layout compaction rewrites fast-built segment postings into. Shard and
    salt derive from doc_id (doc-disjointness by hash); ``df_by_term`` (term,
    df) sizes the per-term salt fan-out so no run exceeds ``max_group``
    postings. idf-free: blocks carry (max_tf, min_dl) like the one-pass build.
    """
    n_salts = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(max_group * n_shards))
    ).cast("int")
    keyed = tf_rel.join(F.broadcast(df_by_term), "term").withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
    ).withColumn("salt", F.pmod(F.xxhash64("doc_id", F.lit(1)), n_salts).cast("long"))
    parts = keyed.select(
        "term", "shard", "salt", "doc_id", "tf", "dl"
    ).repartition("term", "shard", "salt").sortWithinPartitions("term", "shard", "salt")

    def encode_runs(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        salts = pdf["salt"].to_numpy()
        new_run = np.empty(len(pdf), dtype=bool)
        new_run[0] = True
        new_run[1:] = (
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1]) | (salts[1:] != salts[:-1])
        )
        run_id = np.cumsum(new_run) - 1
        cols = encode_runs_blocks(
            run_id,
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["dl"].to_numpy(),
            block_size,
        )
        starts = np.flatnonzero(new_run)
        ri = cols["run_idx"]
        nb = len(cols["postings_bin"])
        return pd.DataFrame(
            {
                "term": terms[starts][ri],
                "shard": shards[starts][ri].astype(np.int32),
                "salt": salts[starts][ri].astype(np.int64),
                "block_seq": cols["block_seq"].astype(np.int32),
                "first_doc": cols["first_doc"],
                "last_doc": cols["last_doc"],
                "n_docs": cols["n_docs"].astype(np.int32),
                "max_tf": cols["max_tf"],
                "min_dl": cols["min_dl"],
                "block_cf": cols["block_cf"],
                "postings_bin": np.asarray(cols["postings_bin"], dtype=object)
                if nb
                else np.empty(0, dtype=object),
            }
        )

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
    seg_docs: int = SEG_DOCS_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
    postings_buckets: int | None = None,
) -> tuple[BM25Index, list]:
    """Resumable one-pass build: every stage checkpoints through the Catalog
    with per-partition lineage; a rerun skips stages whose fingerprint matches
    (the north-rule resume semantics — kill after any stage, rerun, identical
    final tables). Returns (index, [StageResult...]).

    Stage order matches the one-pass dataflow: postings first (the only
    corpus-scale stage), then stats/dictionary/doclen derived from it.
    Physical layout: the postings table is repartitioned by term and sorted
    within files by (term, shard, salt, block_seq) so a query's isin(term)
    filter prunes parquet row groups via min/max stats.
    """
    from rustserini_spark.sources.catalog import Catalog, fingerprint

    cat = Catalog(checkpoint_dir)
    results = []
    fp_base = fingerprint(
        "v2", input_id, analyzer, text_col, id_col, block_size, seg_docs, n_shards
    )

    fp_post = fingerprint(fp_base, "postings")
    if not cat.is_current("postings", fp_post):
        parallelism = spark.sparkContext.defaultParallelism
        if docs._jdf.rdd().getNumPartitions() < parallelism:
            docs = docs.repartition(parallelism)
        postings_live = encode_postings(
            docs, text_col, id_col, analyzer, block_size, n_shards, seg_docs
        )
        results.append(
            cat.write_stage(
                "postings",
                postings_live,
                fp_post,
                repartition_by=["term"],
                n_partitions=postings_buckets,
                sort_within=["term", "shard", "salt", "block_seq"],
            )
        )
    else:
        results.append(cat.write_stage("postings", None, fp_post))
    postings = cat.read(spark, "postings")

    stats = cat.read_json("stats.json")
    if not stats or stats.get("fingerprint") != fp_post:
        n_docs = docs.count()
        total_tokens = postings.agg(F.sum("block_cf")).collect()[0][0] or 0
        stats = {
            "n_docs": int(n_docs),
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "fingerprint": fp_post,
        }
        cat.write_json("stats.json", stats)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    fp_dict = fingerprint(fp_post, "dictionary", n_docs)
    if not cat.is_current("dictionary", fp_dict):
        dictionary = dictionary_from_postings(postings, n_docs, avgdl, k1, b)
        results.append(cat.write_stage("dictionary", dictionary, fp_dict))
    else:
        results.append(cat.write_stage("dictionary", None, fp_dict))
    dictionary = cat.read(spark, "dictionary")

    fp_dl = fingerprint(fp_post, "doclen")
    if not cat.is_current("doclen", fp_dl):
        results.append(
            cat.write_stage("doclen", doclen_from_postings(docs, postings, id_col), fp_dl)
        )
    else:
        results.append(cat.write_stage("doclen", None, fp_dl))
    doclen = cat.read(spark, "doclen")

    cat.write_json(
        "index.json",
        {
            "analyzer": analyzer,
            "k1": k1,
            "b": b,
            "block_size": block_size,
            "seg_docs": seg_docs,
            "n_shards": n_shards,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "fingerprints": {"postings": fp_post, "dictionary": fp_dict, "doclen": fp_dl},
        },
    )
    index = BM25Index(
        postings=postings,
        dictionary=dictionary,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        k1=k1,
        b=b,
        analyzer=analyzer,
        block_size=block_size,
        n_shards=n_shards,
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
    dictionary = cat.read(spark, "dictionary")
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
        n_shards=meta.get("n_shards", N_SHARDS_DEFAULT),
        meta={"checkpoint_dir": checkpoint_dir},
    )
