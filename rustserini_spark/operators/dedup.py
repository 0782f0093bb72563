"""Deduplication operators for web-scale corpus curation.

Four families, all engine-agnostic-deterministic (hashes are md5 of explicit
strings, never engine-internal hash functions) so every one of them has an
exact DuckDB oracle:

* exact            — md5(text) groupBy; the 100 TB shape is a single shuffled
                     hash-agg with map-side combine, keeper = min(doc_id).
* minhash + LSH    — shingle -> 16 md5-derived minhashes (lexicographic min of
                     md5(seed:shingle), a valid min-wise permutation) -> 8
                     bands of 2 -> band-bucket join produces candidate pairs.
                     At scale only the band groupBy shuffles; no O(n^2) stage.
* n-gram Jaccard   — exact pairwise Jaccard over distinct 3-gram shingles via
                     shingle-inverted self-join (the verify stage behind LSH).
* simhash          — 16-bit sign fingerprint from md5-derived +-1 projections,
                     Hamming-adjacent buckets for near-dup candidates.

The reference has no dedup surface (single-purpose IR engine); these are the
first-class additions a training-data pipeline over the same corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rustserini_spark.functions.parity import r4
from rustserini_spark.functions.text import shingles_col, with_tokens

N_MINHASHES = 16
N_BANDS = 8  # rows-per-band = 2


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keeper): one row per distinct text, keeper = min id."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keeper"),
        )
    )


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc_id, shingle) — the exploded shingle-inverted relation.

    ``distinct=False`` skips a whole shuffle for consumers where multiset vs
    set makes no difference (minhash: min over duplicates == min over set).
    """
    toks = with_tokens(docs, text_col)
    out = toks.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles_col("toks", n)).alias("shingle")
    )
    return out.distinct() if distinct else out


def minhash_signatures(shingled: DataFrame, n_hashes: int = N_MINHASHES) -> DataFrame:
    """(doc_id, h0..h{n-1}): minhash_i = min(md5('<i>:' || shingle)).

    Lexicographic min over md5 strings is a min-wise independent permutation
    family for practical purposes and — unlike xxhash64/murmur — is computed
    identically by Spark and DuckDB, so the oracle can replay it exactly.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) from banded minhash LSH.

    Plan shape at scale: explode shingles (map) -> groupBy(doc) 16-way min agg
    (one shuffle) -> explode bands (map) -> groupBy(band bucket) (one shuffle)
    -> within-bucket pair expansion. Bucket sizes are bounded by collision
    probability, not corpus size; a pathological all-identical corpus degrades
    to the exact-dedup case which is handled upstream.
    """
    rows_per_band = n_hashes // n_bands
    # distinct=True: dedup shingles BEFORE the 16-way md5 min-agg — cheaper to
    # shuffle-dedup once than to md5 every duplicate 16 times.
    sig = minhash_signatures(doc_shingles(docs, text_col, id_col, distinct=True), n_hashes)
    bands = [
        F.struct(
            F.lit(bi).alias("band_id"),
            F.md5(F.concat_ws("|", *[F.col(f"h{bi * rows_per_band + j}") for j in range(rows_per_band)])).alias(
                "band_hash"
            ),
        )
        for bi in range(n_bands)
    ]
    exploded = sig.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard >= threshold.

    Shingle-inverted self-join: only docs sharing >=1 shingle ever pair up.
    At 100 TB the LSH pass above prefilters candidates; this is the exact
    verify applied to its output (compose: pairs.join(this)).
    """
    sh = doc_shingles(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            r4(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(tokens="toks", n_bits: int = 16):
    """n-bit simhash: bit_b = sign of sum over token occurrences of +-1, where
    the +-1 projection for (token, b) is the top bit of md5(token || ':' || b).
    Engine-agnostic: md5 + substring only. Takes a materialized token column.
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens

    def _step(bpos: int):
        # +1 when first hex nibble of md5(tok:b) is 0-7 (MSB clear), else -1
        def step(acc, t):
            return acc + F.when(
                F.substring(F.md5(F.concat(t, F.lit(f":{bpos}"))), 1, 1).isin(
                    "0", "1", "2", "3", "4", "5", "6", "7"
                ),
                F.lit(1),
            ).otherwise(F.lit(-1))

        return step

    bits = []
    for bpos in range(n_bits):
        contrib = F.aggregate(toks, F.lit(0), _step(bpos))
        bits.append(F.when(contrib > 0, F.lit(1 << bpos)).otherwise(F.lit(0)))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def simhash_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(simhash, n_docs, keeper): docs sharing an identical 16-bit simhash are
    near-dup candidates (at scale: bucket by simhash, then exact-verify)."""
    return (
        with_tokens(docs, text_col)
        .select(F.col(id_col).alias("doc_id"), simhash_col("toks").alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
    )
