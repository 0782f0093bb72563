"""Composed corpus-curation pipeline — the end-to-end shape of a
training-data cleaning job over web text, built ONLY from stages that each
carry their own exact DuckDB oracle (language ID, quality heuristics, exact
dedup, SimHash near-dup dedup), so the composition is oracle-checkable
end to end.

The reference has no curation surface (single-purpose IR engine,
/root/reference/src/lib.rs); this is a first-class addition a 100 TB
pretraining pipeline runs over the same corpus before indexing.

100 TB plan shape (in stage order — filters first so every later stage sees
a shrunk corpus):

1. language ID + quality features: pure Catalyst column expressions in ONE
   projection over the scan — no shuffle, whole-stage codegen, filters
   pushed as far down as the token materialization allows.
2. exact dedup: keeper = min(id) per md5(text) via groupBy (map-side
   combine: a viral page duplicated a million times collapses to one row
   per map task) + a left-semi join back. Two shuffles of the FILTERED
   corpus, no sort.
3. near-dup dedup: 64-bit bag-of-words SimHash (one Arrow pass, one md5 per
   distinct token per batch — similarity to dedup.simhash64_signatures),
   keeper = min(id) per identical fingerprint, left-semi join. Permuting a
   document's words does not change its fingerprint, so copy-paste
   reorderings collapse; for Hamming-tolerant matching compose with
   dedup.simhash_neardup_pairs instead.

Nothing is ever all-pairs; every aggregation key (md5, int64 fingerprint) is
fixed-width regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rustserini_spark.functions.text import (
    lang_id_col,
    quality_features,
    with_tokens,
)
from rustserini_spark.operators.dedup import simhash64_signatures

QUALITY_COLS = (
    "n_chars",
    "n_tokens",
    "avg_token_len",
    "stopword_ratio",
    "distinct_ratio",
)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 15,
    max_stopword_ratio: float = 0.5,
    min_distinct_ratio: float = 0.35,
) -> DataFrame:
    """Surviving documents of the lang -> quality -> exact-dedup ->
    near-dup-dedup pipeline, with their curation features:
    (id, lang_pred, n_chars, n_tokens, avg_token_len, stopword_ratio,
    distinct_ratio). Keeper of every duplicate group is the smallest id.

    The ratio thresholds compare the SAME r4-rounded values the
    ``text_quality`` oracle checks, so the survivor set is engine-exact."""
    feat = with_tokens(docs.select(id_col, text_col), text_col).select(
        F.col(id_col),
        F.col(text_col),
        lang_id_col("toks").alias("lang_pred"),
        *quality_features(text_col, "toks"),
    )
    kept = feat.filter(
        F.col("lang_pred").isin(list(langs))
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    )

    # exact dedup: keeper agg (map-side combined) + semi join on (hash, id)
    kept = kept.withColumn("_text_hash", F.md5(F.col(text_col)))
    exact_keepers = kept.groupBy("_text_hash").agg(F.min(id_col).alias(id_col))
    kept = kept.join(exact_keepers, ["_text_hash", id_col], "left_semi")

    # near-dup dedup: identical-SimHash keeper over the exact-dedup survivors
    sh = simhash64_signatures(kept, text_col, id_col)
    sh_keepers = sh.groupBy("simhash").agg(F.min("doc_id").alias(id_col))
    kept = kept.join(sh_keepers.select(id_col), [id_col], "left_semi")

    return kept.select(id_col, "lang_pred", *QUALITY_COLS)


def token_shingles(toks, n: int):
    """Array of n-token shingles (space-joined) of a token-array column;
    empty array when the document has fewer than n tokens. Pure Catalyst —
    no UDF, stays inside whole-stage codegen."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """doc ids sharing at least one n-token shingle with a benchmark/eval
    set — the detection half of test-set DECONTAMINATION, the step every
    pretraining pipeline runs so eval benchmarks don't leak into training
    data (the reference has no curation surface; first-class addition).

    100 TB plan shape: eval sets are tiny (1e3-1e6 shingles), so the distinct
    bench shingle set BROADCASTS; the corpus side explodes to shingles but is
    consumed by a map-side broadcast semi-join — the corpus is never
    shuffled. Only MATCHED doc ids (bounded by the corpus's contamination
    rate, typically <<1%) reach the distinct's exchange."""
    doc_sh = with_tokens(docs.select(id_col, text_col), text_col).select(
        id_col, F.explode(token_shingles(F.col("toks"), n)).alias("shingle")
    )
    bench_sh = (
        with_tokens(bench.select(bench_text_col), bench_text_col)
        .select(F.explode(token_shingles(F.col("toks"), n)).alias("shingle"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def ngram_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """docs minus every document contaminated by the benchmark set (shares
    an n-token shingle). The contaminated-id table is tiny next to the
    corpus, so the anti-join broadcasts under AQE at any corpus size."""
    bad = ngram_contaminated_ids(docs, bench, n, text_col, id_col, bench_text_col)
    return docs.join(bad.select(F.col(id_col)), [id_col], "left_anti")


def training_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang_pred",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the training-MIX step
    that downweights over-represented strata (language, domain, quality
    band) to a target mixture. Strata absent from ``rates`` are dropped.

    The keep decision is a pure function of (salt, stratum, id): u =
    int(md5(salt:stratum:id)[:8 hex]) / 2^32, keep iff u < rate. That makes
    it (a) engine-portable bit-for-bit (the DuckDB oracle recomputes the
    same doubles — both sides divide the same 32-bit integer by the same
    power of two, so the comparison is exact), (b) resampling-stable: adding
    or removing documents never flips another document's decision, and
    changing one stratum's rate monotonically grows/shrinks only that
    stratum, (c) a single map-side filter — no shuffle, no RNG state, no
    seed-per-partition coupling to the physical plan."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col(strat_col), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    rate = F.create_map(
        *[x for k, v in sorted(rates.items()) for x in (F.lit(k), F.lit(float(v)))]
    )[F.col(strat_col)]
    return docs.filter(u < F.coalesce(rate, F.lit(0.0)))
