"""End-to-end webtext pipeline: Iceberg-style corpus table -> BM25 index.

This is the engine's primary ingestion path per BASELINE.json input_hint: an
Iceberg/parquet table ``(url, warc_ts, html, text, lang)`` of Common-Crawl-style
pages. Steps:

  1. extract text from html (Catalyst, no per-row Python) with the north-rule
     invariant — extracted text byte-identical to the ``text`` column per url
     (the reference consumes pre-extracted text verbatim,
     /root/reference/src/encode/vector_writer.rs:96-158) — enforced INLINE in
     the build scan via a CASE + raise_error on every row (no separate
     verification pass over the corpus);
  2. language filter (partition-prunable on a lang-partitioned table);
  3. docid assignment (url -> dense long ordinal) FUSED into the encode pass:
     doc_id = bucket_offset[pmod(xxhash64(url), p)] + rank-of-url-within-bucket.
     A pure function of the url set and the bucket count p — deterministic at
     ANY parallelism and any file layout (the property the two-cluster-size
     rank-parity check needs) — computed with ONE lean corpus exchange
     (hash on the bucket id + a per-partition sort) instead of the
     SortMergeJoin corpus⋈docmap plan, which shuffled AND sorted the corpus
     twice and was the round-2 build's last non-scaling component;
  4. one-pass fused analyze+encode (index_build.encode semantics) with
     segment-local block compression, then shard-partitioned cache + block-
     metadata dictionary (assemble_index).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustserini_spark.operators.index_build import (
    BLOCK_SIZE_DEFAULT,
    B_DEFAULT,
    BM25Index,
    K1_DEFAULT,
    N_SHARDS_DEFAULT,
    POSTINGS_SCHEMA,
    SEG_DOCS_DEFAULT,
    _encode_segment_pdf,
    analyze_fn_for,
    assemble_index,
    build_index_checkpointed,
)
from rustserini_spark.functions.parity import r4
from rustserini_spark.sources.synth import docmap_from_urls, extract_text_col

N_ID_BUCKETS_DEFAULT = 64  # docid hash buckets: a BUILD parameter (ids are a
# pure function of the url set + this count), NOT a cluster-size parameter

# Auto-bucketing policy: one docid bucket per ~2^20 docs (each bucket is
# sorted in one task — this caps the per-task sort at ~1M urls no matter the
# corpus size; 64 buckets at 100x scale would mean TB-sized per-task sorts).
TARGET_DOCS_PER_BUCKET = 1 << 20


def auto_id_buckets(n_docs: int) -> int:
    """Scale the docid bucket count with the corpus: >= n_docs / 2^20,
    rounded up to a power of two, never below N_ID_BUCKETS_DEFAULT."""
    need = max(1, -(-n_docs // TARGET_DOCS_PER_BUCKET))
    return max(N_ID_BUCKETS_DEFAULT, 1 << (need - 1).bit_length())


def extraction_mismatches(webtext: DataFrame) -> DataFrame:
    """Rows where extract(html) != text byte-for-byte (must be empty) —
    diagnostic view; the build itself enforces this inline on every row with
    the SAME null-safe predicate (both-NULL is parity, single-NULL is not)."""
    ext = webtext.withColumn("extracted", extract_text_col("html"))
    return ext.filter(~F.col("extracted").eqNullSafe(F.col("text"))).select(
        "url", "text", "extracted"
    )


@dataclass
class WebtextIndex:
    index: BM25Index
    docmap: DataFrame  # (doc_id, url)


def _bucket_col(p: int):
    return F.pmod(F.xxhash64("url"), F.lit(p)).cast("int").alias("_pid")


def identity_partition_keys(spark: SparkSession, p: int) -> list[int]:
    """Routing keys that place docid bucket ``b`` alone in physical partition
    ``b``. ``repartition(p, col)`` routes rows to ``pmod(murmur3(col), p)`` —
    hashing the p DISTINCT bucket ids again is balls-into-bins: ~1/e of the
    partitions come out empty and some tasks carry 3-4 buckets (measured 10x
    task-duration skew at 1.9M docs, the 4N wave-tail killer). Probing Spark's
    own hash (``F.hash`` IS the Murmur3Hash repartition uses) for an integer
    ``x_b`` with ``hash(x_b) % p == b`` per bucket makes bucket->partition the
    identity: every encode/query task carries exactly one bucket. Driver cost:
    one job over ~64p ints, memoized per (session, p)."""
    cache = getattr(spark, "_rs_ident_keys", None)
    if cache is None:
        cache = {}
        spark._rs_ident_keys = cache
    if p in cache:
        return cache[p]
    keys: dict[int, int] = {}
    span, base = 64 * p, 0
    while len(keys) < p:
        # map-side agg -> p rows collected, never the probe range itself
        rows = (
            spark.range(base, base + span)
            .select(
                F.col("id").cast("int").alias("x"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(p)).alias("b"),
            )
            .groupBy("b")
            .agg(F.min("x").alias("x"))
            .collect()
        )
        for r in rows:
            keys.setdefault(r["b"], r["x"])
        base += span
    out = [keys[b] for b in range(p)]
    cache[p] = out
    return out


def bucket_counts(corpus: DataFrame, p: int) -> dict[int, int]:
    """Per-bucket row counts. One column-pruned scan with a map-side partial
    agg — the shuffle payload is p rows per input partition. On an Iceberg
    table bucket-partitioned on xxhash64(url)%p these counts are MANIFEST
    METADATA (per-partition row counts) and need no scan at all — callers that
    have them pass ``precomputed_counts`` to index_webtext."""
    return {
        r["_pid"]: r["n"]
        for r in corpus.select(_bucket_col(p)).groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def offsets_from_counts(counts: dict[int, int], p: int) -> tuple[dict[int, int], int]:
    """Dense docid offsets (prefix sums in bucket order) + total count."""
    offsets, acc = {}, 0
    for pid in range(p):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    return offsets, acc


def _bucket_offsets(corpus: DataFrame, p: int) -> tuple[dict[int, int], int]:
    return offsets_from_counts(bucket_counts(corpus, p), p)


def _assign_ordinals(pids: np.ndarray, offsets: dict, counters: dict) -> np.ndarray:
    """Dense doc ids for rows sorted by (_pid, url): offsets[pid] + running
    rank within the bucket. ``counters`` carries ranks across Arrow batches of
    one task (a bucket never spans tasks — hash partitioning on _pid)."""
    ids = np.empty(pids.size, dtype=np.int64)
    change = np.flatnonzero(pids[1:] != pids[:-1]) + 1
    bounds = np.concatenate(([0], change, [pids.size]))
    for s, e in zip(bounds[:-1], bounds[1:]):
        pid = int(pids[s])
        seen = counters.get(pid, 0)
        ids[s:e] = offsets[pid] + seen + np.arange(e - s)
        counters[pid] = seen + (e - s)
    return ids


def _bucketed_urls(corpus: DataFrame, p: int, *extra_cols) -> DataFrame:
    """One corpus exchange, bucket b -> physical partition b exactly (see
    identity_partition_keys): balanced tasks, one ~TARGET_DOCS_PER_BUCKET-url
    sort each, at any cluster size. The routing key is dropped after the
    exchange; doc ids depend only on (url set, p), never on the routing."""
    spark = corpus.sparkSession
    ident = identity_partition_keys(spark, p)
    src = corpus.select("url", _bucket_col(p), *extra_cols)
    if p <= 4096:
        pkey = F.element_at(F.array(*[F.lit(x) for x in ident]), F.col("_pid") + 1)
        src = src.withColumn("_pkey", pkey)
    else:
        # literal arrays don't scale to 100k-bucket corpora; broadcast-join
        # the (bucket -> routing key) mapping instead (p rows, map-side only)
        from rustserini_spark.session import local_rows_df

        mapping = local_rows_df(
            spark, [(b, x) for b, x in enumerate(ident)], "_pid int, _pkey int"
        )
        src = src.join(F.broadcast(mapping), "_pid")
    return (
        src.repartition(p, "_pkey")
        .drop("_pkey")
        .sortWithinPartitions("_pid", "url")
    )


def hash_bucket_docmap(corpus: DataFrame, p: int, offsets: dict) -> DataFrame:
    """(url, doc_id) under the fused-ordinal scheme — same pure function of
    (url set, p) the encode pass applies, recomputed independently."""

    def gen(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            ids = _assign_ordinals(pdf["_pid"].to_numpy(), offsets, counters)
            yield pd.DataFrame({"url": pdf["url"], "doc_id": ids})

    return _bucketed_urls(corpus, p).mapInPandas(gen, "url string, doc_id long")


def fused_ordinal_encode_factory(
    offsets: dict,
    analyze_fn,
    block_size: int,
    n_shards: int,
    seg_docs: int,
):
    """mapInPandas generator over (url, _pid, text) rows sorted by (_pid, url):
    assigns dense doc ids inline, then runs the one-pass segment encode —
    docid assignment, analysis, tf counting and block compression in a single
    Arrow pass over the corpus."""

    def gen(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        task_pid = ctx.partitionId() if ctx else 0
        counters: dict[int, int] = {}
        seg_counter = 0
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = _assign_ordinals(pdf["_pid"].to_numpy(), offsets, counters)
            texts = pdf["text"]
            for lo in range(0, len(pdf), seg_docs):
                hi = min(lo + seg_docs, len(pdf))
                seg = (task_pid << 32) | seg_counter
                seg_counter += 1
                out = _encode_segment_pdf(
                    analyze_fn, doc_ids[lo:hi], texts.iloc[lo:hi], seg, block_size, n_shards
                )
                if out is not None:
                    yield out

    return gen


def index_webtext(
    spark: SparkSession,
    webtext: DataFrame,
    lang: str | None = "en",
    verify_extraction: bool = True,
    checkpoint_dir: str | None = None,
    input_id: str | None = None,
    analyzer: str = "porter",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    block_size: int = BLOCK_SIZE_DEFAULT,
    seg_docs: int = SEG_DOCS_DEFAULT,
    n_shards: int = N_SHARDS_DEFAULT,
    n_id_buckets: int | None = None,
    n_docs_hint: int | None = None,
    precomputed_counts: dict[int, int] | None = None,
    timings: dict | None = None,
) -> WebtextIndex:
    """``n_id_buckets=None`` (default) applies the ``auto_id_buckets`` policy:
    the bucket count scales with the corpus so per-task docid sorts stay ~1M
    urls at any scale. ``n_docs_hint`` supplies the (post-filter) corpus size
    without a scan — on an Iceberg table the manifest row counts provide it
    for free; without a hint one column-pruned count scan picks the policy.
    ``precomputed_counts`` likewise supplies the per-bucket counts (Iceberg
    manifest metadata on a bucket-partitioned table) so the build skips its
    one counting scan. ``timings`` (optional dict) receives per-stage wall
    seconds: bucket_counts_sec, encode_sec."""
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
        # null-safe (<=>): both-NULL is parity (matching extraction_mismatches'
        # diagnostic semantics); coalesce keeps the message non-NULL on NULL url
        text_expr = F.when(extracted.eqNullSafe(F.col("text")), extracted).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("extraction parity violation: extract(html) != text at url="),
                    F.coalesce(F.col("url"), F.lit("<null>")),
                )
            )
        )
    else:
        text_expr = extracted

    if checkpoint_dir:
        # resumable path: materialized docmap + per-stage Catalog checkpoints
        docmap = docmap_from_urls(corpus)
        docs = corpus.select("url", text_expr.alias("text")).join(docmap, "url")
        index, _stages = build_index_checkpointed(
            spark,
            docs,
            checkpoint_dir=checkpoint_dir,
            input_id=input_id or "webtext",
            text_col="text",
            id_col="doc_id",
            analyzer=analyzer,
            k1=k1,
            b=b,
            block_size=block_size,
            seg_docs=seg_docs,
            n_shards=n_shards,
        )
        return WebtextIndex(index=index, docmap=docmap)

    # fused path: docid assignment inside the encode pass (module docstring)
    import time as _time

    if n_id_buckets is None:
        n_id_buckets = auto_id_buckets(
            n_docs_hint if n_docs_hint is not None else corpus.count()
        )
    t0 = _time.perf_counter()
    counts = (
        precomputed_counts
        if precomputed_counts is not None
        else bucket_counts(corpus, n_id_buckets)
    )
    offsets, n_docs = offsets_from_counts(counts, n_id_buckets)
    if timings is not None:
        timings["bucket_counts_sec"] = round(_time.perf_counter() - t0, 3)
    src = _bucketed_urls(corpus, n_id_buckets, text_expr.alias("text"))
    postings_raw = src.mapInPandas(
        fused_ordinal_encode_factory(
            offsets, analyze_fn_for(analyzer), block_size, n_shards, seg_docs
        ),
        POSTINGS_SCHEMA,
    )
    docmap = hash_bucket_docmap(corpus, n_id_buckets, offsets)
    t0 = _time.perf_counter()
    index = assemble_index(
        postings_raw,
        n_docs,
        all_ids=docmap.select("doc_id"),
        k1=k1,
        b=b,
        analyzer=analyzer,
        block_size=block_size,
        n_shards=n_shards,
    )
    if timings is not None:
        timings["encode_sec"] = round(_time.perf_counter() - t0, 3)
    return WebtextIndex(index=index, docmap=docmap)


def resolve_urls(results: DataFrame, docmap: DataFrame) -> DataFrame:
    """(qid, doc_id, score, rank) -> + url (reference operator O17, the
    ordinal->docid resolve of /root/reference/src/searcher/faiss/searcher.rs:109-115)."""
    return results.join(F.broadcast(docmap), "doc_id").select(
        "qid", "doc_id", "url", "score", "rank"
    )


# ---------------------------------------------------------------------------
# URL-level curation (Common-Crawl recrawl hygiene)
# ---------------------------------------------------------------------------
# A web corpus carries the same page many times: recrawls across warc_ts,
# scheme/www/case variants, and tracking-parameter decorations
# (utm_*/fbclid/...). Collapsing those BEFORE content-level dedup is the
# cheapest reduction in the whole pipeline — pure string canonicalization is
# map-only whole-stage codegen, and keep-latest-crawl is one keyed
# aggregation — so at 100 TB it runs first, ahead of the minhash/simhash
# passes whose cost scales with surviving rows. Mirrors the corpus-iterator
# ingest surface of the reference (docs keyed by a caller-supplied id,
# /root/reference/examples/misc/collection_iterator.py semantics): here the
# id is the canonical url.

# key=value prefixes dropped from query strings: click/campaign trackers that
# never change page content (Java-regex and RE2 portable; the DuckDB oracle
# replays the same pattern)
TRACKING_PARAM_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|mc_eid|mc_cid)="


def canonical_url_col(url):
    """Canonical form of an http(s) url, as a pure Catalyst column:

      1. drop the fragment (``#...``) and the ``http(s)://`` scheme;
      2. lowercase the host (dns is case-insensitive; paths are NOT touched —
         they are case-significant), drop one leading ``www.``;
      3. drop trailing ``/`` runs from the path;
      4. drop tracking parameters (TRACKING_PARAM_RE) from the query string
         and sort the survivors, so param ORDER never splits a page.

    Every step is a regexp/array builtin — map-only, no UDF, no shuffle. The
    same spec is reimplemented independently in DuckDB SQL by the
    ``canonical_urls`` oracle, so the two regex/sort chains check each other.
    """
    u = F.regexp_replace(F.col(url) if isinstance(url, str) else url, "#.*$", "")
    u = F.regexp_replace(u, "^https?://", "")
    hraw = F.regexp_extract(u, "^([^/?]*)", 1)
    host = F.regexp_replace(F.lower(hraw), "^www\\.", "")
    rest = F.substr(u, F.length(hraw) + F.lit(1))
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    qstr = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.filter(
        F.split(qstr, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host, path, F.when(qcanon == "", "").otherwise(F.concat(F.lit("?"), qcanon))
    )


def url_dedup_latest(webtext: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """(canonical_url, url, warc_ts): ONE kept crawl per canonical url — the
    newest ``warc_ts``, ties broken by max raw url (total order, so the
    survivor is a pure function of the row set — rank-parity safe at any
    parallelism).

    Plan shape at scale: map-side canonicalize -> ONE max-struct aggregation
    on canonical_url (map-side combined; no window, no sort, no join — a
    row_number window over 10^12 rows would sort every partition for a
    per-group argmax that a struct max computes in the combiner).
    """
    keyed = webtext.select(
        canonical_url_col("url").alias("canonical_url"),
        F.struct(F.col(ts_col).alias("warc_ts"), F.col("url").alias("url")).alias("_v"),
    )
    best = keyed.groupBy("canonical_url").agg(F.max("_v").alias("_v"))
    return best.select("canonical_url", F.col("_v.url").alias("url"), F.col("_v.warc_ts").alias("warc_ts"))


def host_stats(webtext: DataFrame, min_pages: int = 1) -> DataFrame:
    """(domain, n_pages, n_canonical, dup_rate, avg_chars): RefinedWeb-style
    per-domain crawl profile over the registered domain (last two host
    labels): how many raw crawls, how many distinct canonical pages, the
    recrawl/variant duplication rate, and mean page size.

    One groupBy(domain) with a count-distinct — Spark plans it as the
    standard two-phase distinct-expand aggregation, still a single shuffle
    key (no all-pairs, no join). dup_rate is derived from the two counts
    post-agg so it is bit-stable across partitionings.
    """
    canon = canonical_url_col("url")
    chost = F.regexp_extract(canon, "^([^/?]*)", 1)
    dom = F.when(
        chost.rlike("[^.]\\.[^.]"), F.regexp_extract(chost, "([^.]+\\.[^.]+)$", 1)
    ).otherwise(chost)
    rows = webtext.select(
        dom.alias("domain"),
        canon.alias("canonical_url"),
        F.length("text").cast("long").alias("n_chars"),
    )
    out = rows.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        r4(F.avg("n_chars")).alias("avg_chars"),
    )
    return out.filter(F.col("n_pages") >= min_pages).withColumn(
        "dup_rate",
        r4(1 - F.col("n_canonical") / F.col("n_pages")),
    ).select("domain", "n_pages", "n_canonical", "dup_rate", "avg_chars")
