"""Dedup operator semantics on planted duplicates/near-duplicates."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_groups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen researchers "
    "measure token overlap statistics for large scale corpus deduplication "
    "experiments using shingle based similarity metrics and banded minhash"
)
NEAR = BASE.replace("seventeen", "eighteen")  # one token changed
UNRELATED = "completely different content about oceanography and coral reef biology"


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact dup of 0
        (2, NEAR),          # near dup of 0/1
        (3, UNRELATED),
        (4, "tiny"),        # < 3 tokens -> no shingles
        (5, BASE + " extra tail words appended here"),  # superset near-dup
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(dup_docs):
    groups = {r.keeper: r.n_dups for r in exact_dedup(dup_docs).collect()}
    assert groups[0] == 2          # docs 0,1 identical; keeper = min id
    assert groups[2] == 1 and groups[3] == 1
    assert sum(groups.values()) == 6


def test_ngram_jaccard_finds_near_dups(dup_docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8  # one token changed -> high jaccard
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_lsh_candidates(dup_docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(dup_docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide in every band
    assert not any(3 in p or 4 in p for p in pairs)  # unrelated/shingle-less never pair


def test_lsh_composes_with_exact_verify(dup_docs):
    # the scale pattern: LSH candidates -> exact jaccard verify
    cand = minhash_lsh_pairs(dup_docs)
    verified = cand.join(ngram_jaccard_pairs(dup_docs, threshold=0.8), ["doc_a", "doc_b"])
    got = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (0, 1) in got
    assert all(a < b for a, b in got)


def test_simhash_groups_identical_docs(dup_docs):
    rows = simhash_dedup_groups(dup_docs).collect()
    by_keeper = {r.keeper: r.n_docs for r in rows}
    assert by_keeper[0] >= 2  # 0 and 1 share an identical fingerprint
    total = sum(r.n_docs for r in rows)
    assert total == 6


def test_exact_dedup_at_sf(documents):
    # synthetic driver corpus has no exact dups; every group is a singleton
    res = exact_dedup(documents)
    assert res.count() == documents.count()
    assert res.agg(F.max("n_dups")).collect()[0][0] == 1
