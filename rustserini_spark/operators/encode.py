"""Dense document encoding plumbing (reference operators A3/A4 feeding S6/S7/O19).

``DocumentEncoder`` is the analog of the reference's encoder trait
(/root/reference/src/encode/base.rs:7-21): ``encode(texts, titles,
pooler_type) -> matrix``. The reference's concrete encoder is a BERT forward
pass via candle (/root/reference/src/encode/auto.rs:34-207) whose weights are
not available offline, so the default implementation here is a DETERMINISTIC
STAND-IN (seeded feature hashing — a real, if crude, text embedding) with the
exact batched-Arrow shape a transformer encoder drops into: swap
``HashingEncoder`` for a predict_batch_udf-style model wrapper and nothing
else changes. Everything around the forward pass is the real contract and is
tested end-to-end (encode -> write -> search, mirroring
/root/reference/tests/encoder_test.rs:161-221):

* sanitize (reference S5): every text and id is stripped of '"' and '\\'
  before encoding, byte-identical to the reference's sanitize_string
  (/root/reference/examples/faiss_embedding_writer.rs:80-82,106-107);
* title ⊕ text concat (A2): "{title} {text}" when a title exists
  (/root/reference/src/encode/auto.rs:144-151);
* mean vs cls pooling switch (A4 surface,
  /root/reference/src/encode/auto.rs:176-199);
* L2 normalization of the pooled vector (auto.rs:200-206);
* Arrow-batched execution: one ``encode_batch`` call per Arrow batch, never
  per row (BASELINE.json input_hint: no per-row Python).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rustserini_spark.functions.text import sanitize_str


class DocumentEncoder:
    """Trait analog of /root/reference/src/encode/base.rs:7-21."""

    dim: int

    def encode_batch(
        self, texts: list[str], titles: list[str] | None, pooler_type: str = "mean"
    ) -> np.ndarray:
        """(len(texts), dim) float32 matrix, rows L2-normalized."""
        raise NotImplementedError


class HashingEncoder(DocumentEncoder):
    """Deterministic stand-in encoder: seeded feature hashing over whitespace
    tokens. 'mean' pooling averages per-token feature vectors; 'cls' takes the
    first token's vector (the structural distinction auto.rs:176-199 makes).
    Deterministic across processes/partitions (md5-seeded), so results are
    reproducible at any parallelism — the property the scaling evidence needs.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _token_vec(self, token: str) -> np.ndarray:
        h = hashlib.md5(token.encode("utf-8")).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def encode_batch(self, texts, titles=None, pooler_type: str = "mean") -> np.ndarray:
        if titles is not None:
            # "{title} {text}" (reference A2, auto.rs:144-151)
            texts = [f"{ti} {tx}" if ti else tx for ti, tx in zip(titles, texts)]
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        memo: dict[str, np.ndarray] = {}
        for i, text in enumerate(texts):
            toks = (text or "").split()
            if not toks:
                continue
            if pooler_type == "cls":
                toks = toks[:1]
            elif pooler_type != "mean":
                raise ValueError(f"unknown pooler_type {pooler_type!r}")
            acc = np.zeros(self.dim, dtype=np.float32)
            for t in toks:
                v = memo.get(t)
                if v is None:
                    v = self._token_vec(t)
                    memo[t] = v
                acc += v
            acc /= len(toks)
            n = float(np.linalg.norm(acc))
            out[i] = acc / n if n > 0 else acc
        return out


def encode_documents(
    docs: DataFrame,
    encoder: DocumentEncoder,
    id_col: str = "docid",
    text_col: str = "text",
    title_col: str | None = None,
    pooler_type: str = "mean",
    sanitize: bool = True,
) -> DataFrame:
    """(vec_id: string, embedding: array<float>) — the A3/A4 stage as one
    Arrow-batched map (zero shuffles; at 10^12 docs this is the pure-map stage
    a GPU-backed encoder parallelizes over executors). Sanitize is applied to
    both id and text exactly like the reference's encode loop
    (faiss_embedding_writer.rs:106-107)."""
    from rustserini_spark.session import fan_out

    cols = [F.col(id_col).cast("string").alias("vec_id"), F.col(text_col).alias("_text")]
    if title_col:
        cols.append(F.col(title_col).alias("_title"))
    src = fan_out(docs.select(*cols))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].astype(str)
            texts = ["" if t is None else str(t) for t in pdf["_text"]]
            titles = None
            if "_title" in pdf.columns:
                titles = ["" if t is None else str(t) for t in pdf["_title"]]
            if sanitize:
                ids = ids.map(sanitize_str)
                texts = [sanitize_str(t) for t in texts]
                if titles is not None:
                    titles = [sanitize_str(t) for t in titles]
            mat = encoder.encode_batch(texts, titles, pooler_type)
            yield pd.DataFrame(
                {"vec_id": ids.to_numpy(), "embedding": [row for row in mat]}
            )

    return src.mapInPandas(gen, "vec_id string, embedding array<float>")


def encode_topk(
    docs: DataFrame,
    encoder: DocumentEncoder,
    queries: list[tuple[int, str]],
    k: int = 10,
    metric: str = "cos",
    id_col: str = "docid",
    text_col: str = "text",
    title_col: str | None = None,
    pooler_type: str = "mean",
    sanitize: bool = True,
) -> DataFrame:
    """Fused A3/A4 + O19: encode each Arrow batch and score it against the
    (small, driver-encoded) query matrix in the SAME Python pass, emitting
    only the per-batch top-k. Composing ``encode_documents`` with
    ``cosine_topk`` is semantically identical but materializes the full
    corpus-width embedding column between two Python stages — at web scale
    that is the entire dense matrix serialized through Arrow twice (and at
    bench scale a second Python-runner round trip per partition). Here the
    embeddings never leave the worker; the shuffle is O(batches*queries*k).

    ``queries``: (qid, text) pairs, encoded driver-side with the same encoder
    and sanitizer — bit-identical to the distributed kernel (the encoder is a
    pure float32 function of the sanitized text by contract). Float path
    matches the unfused pipeline exactly: float32 encoder output widened to
    float64 on both sides, BLAS matmul, shared r4-rounded top-k kernel
    (similarity.batch_topk_frame), so unfused-vs-fused results are
    hash-identical, not merely close."""
    from rustserini_spark.operators.dedup import require_integral_id
    from rustserini_spark.operators.similarity import batch_topk_frame, topk_window

    require_integral_id(docs, id_col, "encode_topk")
    qids = np.array([int(q) for q, _ in queries], dtype=np.int64)
    qtexts = ["" if t is None else str(t) for _, t in queries]
    if sanitize:
        qtexts = [sanitize_str(t) for t in qtexts]
    qmat = encoder.encode_batch(qtexts, None, pooler_type).astype(np.float64)
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    out = metric
    schema = f"qid long, vec_id long, {out} double"

    from rustserini_spark.session import fan_out

    cols = [F.col(id_col).cast("long").alias("_id"), F.col(text_col).alias("_text")]
    if title_col:
        cols.append(F.col(title_col).alias("_title"))
    src = fan_out(docs.select(*cols))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy().astype(np.int64)
            texts = ["" if t is None else str(t) for t in pdf["_text"]]
            titles = None
            if "_title" in pdf.columns:
                titles = ["" if t is None else str(t) for t in pdf["_title"]]
            if sanitize:
                texts = [sanitize_str(t) for t in texts]
                if titles is not None:
                    titles = [sanitize_str(t) for t in titles]
            m = encoder.encode_batch(texts, titles, pooler_type).astype(np.float64)
            yield batch_topk_frame(ids, m, qids, qmat, qn, metric, k, out)

    return topk_window(src.mapInPandas(gen, schema), k, out)
