"""Generate a driver-shaped synthetic dataset at larger scale factors.

The driver's own sf1.0 directory (used for round-7/8 measurement) is
generated at measurement time and not kept on disk; this script recreates a
statistically equivalent dataset (same schemas, vocabulary, document-length
distribution, ~5% planted near-duplicates with the `dup` marker token, the
observed lang/source mixes, exponential event values, random unit
embeddings) so optimization work can be measured at the driver's scale.
It writes ONLY the three tables the bench queries read (documents,
embeddings, events) and never touches /root/testdata (read-only).

Usage: python scripts/gen_scaled_testdata.py <out_dir> <scale>
  scale 1.0 -> 50,000 docs / 20,000 vectors / 1,000,000 events
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def gen_documents(rng: np.random.Generator, n: int):
    texts: list[str] = []
    docs_tokens: list[list[str]] = []
    for i in range(n):
        if i > 50 and rng.random() < 0.05:
            # near-duplicate of a random earlier doc: a few token mutations,
            # one of them the rare `dup` marker (mirrors the fixture corpus)
            src = list(docs_tokens[int(rng.integers(0, i))])
            n_mut = int(rng.integers(1, 5))
            for _ in range(n_mut):
                pos = int(rng.integers(0, len(src)))
                src[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            src[int(rng.integers(0, len(src)))] = "dup"
            toks = src
        else:
            ln = int(rng.integers(10, 101))
            toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), ln)]
        docs_tokens.append(toks)
        texts.append(" ".join(toks))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64):
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row for row in v.tolist()], pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n).astype(np.int32), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int):
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00.000000")
    offs = np.sort(rng.integers(0, span_us, n))
    ts = base + offs.astype("timedelta64[us]")
    users = rng.integers(0, max(1, n // 66), n)
    types = rng.choice(EVENT_TYPES, size=n)
    vals = np.round(rng.exponential(50.0, n), 2)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def main() -> None:
    out = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    n_docs = int(50_000 * scale)
    n_vecs = int(20_000 * scale)
    n_events = int(1_000_000 * scale)
    pq.write_table(gen_documents(rng, n_docs), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, n_vecs), f"{out}/embeddings.parquet")
    pq.write_table(gen_events(rng, n_events), f"{out}/events.parquet")
    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")
    print(f"wrote {out}: {n_docs} docs, {n_vecs} vecs, {n_events} events")


if __name__ == "__main__":
    main()
