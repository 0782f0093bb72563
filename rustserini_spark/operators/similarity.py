"""Similarity search over embedding columns (array<float>).

Reference parity: the dense path is FAISS ``Flat`` / InnerProduct — exact
brute-force top-k (/root/reference/src/encode/vector_writer.rs:350,
/root/reference/src/searcher/faiss/searcher.rs:81-118). Here:

* ``cosine_topk`` / ``dot_topk`` — exact brute force, the FAISS-Flat
  equivalent: broadcast the (small) query set, score every corpus vector with
  a pure Catalyst fold (no Python), window top-k. Scales linearly with the
  corpus and parallelizes perfectly (no shuffle until the tiny top-k merge).
* ``cosine_neardup_pairs`` — embedding-cosine near-duplicate detection.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH signatures
  (seeded, deterministic) bucket the corpus; candidates come from matching
  buckets only; exact re-rank inside. Approximate by construction (recall<1),
  so the driver records a rows-only check; pytest asserts recall against
  brute force instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustserini_spark.functions.parity import r4


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_scores(corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, vec_id, cos) for every (query, corpus) pair; queries broadcast."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cvec"))
    joined = c.crossJoin(F.broadcast(q))
    cos = _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    return joined.select("qid", "vec_id", r4(cos).alias("cos"))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    scored = cosine_scores(corpus, queries, id_col, vec_col)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def dot_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """FAISS Flat/InnerProduct parity: exact max-inner-product top-k."""
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id", r4(_dot(F.col("qvec"), F.col("cvec"))).alias("dot")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_neardup_pairs(corpus: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_a, vec_b, cos) for pairs with cosine >= threshold, vec_a < vec_b.

    Exact O(n^2) — correct at test scale; the 100 TB path is lsh_ann buckets
    followed by this as the within-bucket verify.
    """
    a = corpus.select(F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("va"))
    b = corpus.select(F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("vb"))
    joined = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return joined.select("vec_a", "vec_b", r4(cos).alias("cos")).filter(
        F.col("cos") >= threshold
    )


def dot_topk_prf(
    corpus: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """PRF variant (reference O20): hits plus the raw query vector, mirroring
    PRFDenseSearchResult {docid, score, prf_score}
    (/root/reference/src/searcher/faiss/searcher.rs:25-38, :101-107)."""
    hits = dot_topk(corpus, queries, k, id_col, vec_col)
    qvec = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("prf_vector"))
    return hits.join(F.broadcast(qvec), "qid")


# ---------------------------------------------------------------- LSH ANN ---

_SIG_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signatures(
    vecs: DataFrame, dim: int, n_planes: int = 12, seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket from seeded random hyperplanes.
    Arrow-batched matrix multiply — one pass, no shuffle."""
    planes = _hyperplanes(dim, n_planes, seed)

    def sig(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())
            bits = (m @ planes.T) > 0
            bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf[id_col].astype("int64"), "bucket": bucket})

    return vecs.select(id_col, vec_col).mapInPandas(sig, _SIG_SCHEMA)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: match query buckets to corpus buckets, exact cosine
    re-rank within. One shuffle on bucket; candidate count ~ n/2^planes per
    query bucket, independent of total corpus size given uniform buckets."""
    csig = lsh_signatures(corpus, dim, n_planes, seed, id_col, vec_col)
    qsig = lsh_signatures(queries, dim, n_planes, seed, id_col, vec_col).withColumnRenamed(
        "vec_id", "qid"
    )
    cand = csig.join(F.broadcast(qsig), "bucket").select("qid", "vec_id")
    c = corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cvec"))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec"))
    joined = cand.join(c, "vec_id").join(F.broadcast(q), "qid")
    cos = _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    scored = joined.select("qid", "vec_id", r4(cos).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
