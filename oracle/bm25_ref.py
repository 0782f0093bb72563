"""Pure-NumPy brute-force BM25 oracle (no Spark).

Mirrors the reference's golden-output test style
(/root/reference/tests/searcher_test.rs:81-100 asserts top-1 docid parity on a
fixed query): same analysis chain, Lucene BM25Similarity formula, Anserini
defaults k1=0.9 b=0.4, tie-break by doc_id ascending. Used by pytest to gate
the Spark engine's rankings and scores (atol 1e-9 — both sides are float64
sums of identical terms).
"""

from __future__ import annotations

import math
from collections import Counter

from rustserini_spark.analysis import analyze_text, simple_tokenize_text


def bm25_rank(
    corpus: dict[int, str],
    query: str,
    k: int = 10,
    k1: float = 0.9,
    b: float = 0.4,
    analyzer: str = "porter",
) -> list[tuple[int, float]]:
    """Return [(doc_id, score)] of the top-k docs, Lucene ordering."""
    analyze = analyze_text if analyzer == "porter" else simple_tokenize_text
    docs = {d: analyze(t) for d, t in corpus.items()}
    n_docs = len(docs)
    if n_docs == 0:
        return []
    avgdl = sum(len(t) for t in docs.values()) / n_docs or 1.0

    df: Counter[str] = Counter()
    tfs: dict[int, Counter] = {}
    for d, toks in docs.items():
        c = Counter(toks)
        tfs[d] = c
        df.update(c.keys())

    q_terms = Counter(analyze(query))
    scores: dict[int, float] = {}
    for term, qtf in q_terms.items():
        if term not in df:
            continue
        idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
        for d, c in tfs.items():
            tf = c.get(term, 0)
            if tf == 0:
                continue
            dl = len(docs[d])
            contrib = qtf * idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
