"""Field-weighted search (O16), JSONL corpus readers (S1/S2), PRF (O20)."""

import gzip
import json
import math
import os
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle.bm25_ref import bm25_rank
from rustserini_spark.operators.fields import build_multifield_index, search_fields
from rustserini_spark.operators.similarity import dot_topk_prf
from rustserini_spark.sources.readers import read_jsonl_corpus, write_embeddings_jsonl

FIELD_DOCS = [
    (0, "spark engine for big data processing", "spark overview"),
    (1, "window functions and aggregation in sql", "sql guide"),
    (2, "spark spark spark tuning", "performance"),
    (3, "completely unrelated gardening text", "plants"),
    (4, "data pipelines with window operations", "spark data"),
]
FIELD_QUERIES = [("f0", "spark window"), ("f1", "data"), ("f2", "gardening plants")]
BOOSTS = {"text": 1.0, "title": 2.5}


def _oracle_fields(docs, query, boosts, k=10):
    scores = {}
    for fi, field in (("text", 1), ("title", 2)):
        corpus = {d[0]: d[{"text": 1, "title": 2}[fi]] for d in docs}
        for doc, s in bm25_rank(corpus, query, k=len(docs)):
            scores[doc] = scores.get(doc, 0.0) + boosts[fi] * s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def test_search_fields_matches_oracle(spark):
    docs = spark.createDataFrame(pd.DataFrame(FIELD_DOCS, columns=["doc_id", "text", "title"]))
    indexes = build_multifield_index(spark, docs, ["text", "title"], block_size=4)
    qdf = spark.createDataFrame(pd.DataFrame(FIELD_QUERIES, columns=["qid", "query"]))
    res = search_fields(indexes, qdf, BOOSTS, k=5)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid, query in FIELD_QUERIES:
        expected = _oracle_fields(FIELD_DOCS, query, BOOSTS, k=5)
        actual = sorted(got.get(qid, []))
        assert [a[1] for a in actual] == [e[0] for e in expected], (qid, actual, expected)
        for (_, _, s), (_, es) in zip(actual, expected):
            assert s == pytest.approx(es, abs=1e-9)


def test_zero_boost_field_is_ignored(spark):
    docs = spark.createDataFrame(pd.DataFrame(FIELD_DOCS, columns=["doc_id", "text", "title"]))
    indexes = build_multifield_index(spark, docs, ["text", "title"], block_size=4)
    qdf = spark.createDataFrame([("f0", "spark window")], "qid string, query string")
    only_text = search_fields(indexes, qdf, {"text": 1.0}, k=5).collect()
    corpus = {d[0]: d[1] for d in FIELD_DOCS}
    expected = bm25_rank(corpus, "spark window", k=5)
    assert [(r.doc_id) for r in sorted(only_text, key=lambda r: r.rank)] == [e[0] for e in expected]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [
        {"id": "a", "contents": "alpha text body", "title": "Alpha"},
        {"docid": "b", "text": "beta body only"},
        {"_id": "c", "text": "gamma content", "title": None},
        {"contents": "orphan without id"},
    ]
    with open(d / "part0.jsonl", "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(d / "part1.jsonl.gz", "wt") as f:
        for r in rows[2:]:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_jsonl_corpus_mixed_keys_and_gzip(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir)
    rows = {r.docid: r.text for r in df.collect()}
    # orphan row (no id) dropped in non-strict mode
    assert rows == {
        "a": "Alpha alpha text body",  # title concat (A2)
        "b": "beta body only",
        "c": "gamma content",
    }


def test_read_jsonl_corpus_no_concat(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir, concat_title=False)
    rows = {r.docid: r.text for r in df.collect()}
    assert rows["a"] == "alpha text body"


def test_read_jsonl_strict_raises(spark, jsonl_dir):
    with pytest.raises(ValueError):
        read_jsonl_corpus(spark, jsonl_dir, strict=True)


def test_jsonl_corpus_is_indexable(spark, jsonl_dir):
    from rustserini_spark.operators.index_build import build_index
    from rustserini_spark.operators.search import bm25_search_pruned

    corpus = read_jsonl_corpus(spark, jsonl_dir).withColumn(
        "doc_id", F.xxhash64("docid")
    )
    index = build_index(spark, corpus, block_size=4)
    qdf = spark.createDataFrame([("j0", "alpha body")], "qid string, query string")
    res = bm25_search_pruned(index, qdf, k=3).collect()
    assert len(res) >= 2  # alpha + beta both contain 'body'/'alpha' stems


def test_write_embeddings_jsonl_roundtrip(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("embsink") / "emb")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    write_embeddings_jsonl(emb, out)
    back = spark.read.json(out)
    assert back.count() == 20
    assert {"id", "contents", "vector"} <= set(back.columns)


def test_dot_topk_prf_returns_query_vector(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = dot_topk_prf(emb, emb.filter(F.col("vec_id") < 2), k=3).collect()
    assert len(res) == 6
    by_qid = {}
    for r in res:
        by_qid.setdefault(r.qid, set()).add(tuple(round(x, 5) for x in r.prf_vector))
    for qid, vecs in by_qid.items():
        assert len(vecs) == 1  # same prf vector on every hit of the query


def test_parse_delimited_contents(spark):
    from rustserini_spark.sources.readers import parse_delimited_contents

    df = spark.createDataFrame(
        [("a", "Title A\nbody text a\n"), ("b", "Title B\nbody b")],
        "docid string, contents string",
    )
    out = parse_delimited_contents(df, ["title", "text"], delimiter="\n")
    rows = {r.docid: (r.title, r.text) for r in out.collect()}
    assert rows == {"a": ("Title A", "body text a"), "b": ("Title B", "body b")}


def test_bpe_ish_token_counts(spark):
    import pandas as pd

    from rustserini_spark.functions.text import token_counts, with_tokens

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["Don't stop, it's 42 tokens!", "hello   world", ""],
            }
        )
    )
    out = {r.doc_id: r for r in with_tokens(df).select("doc_id", *token_counts("text", "toks")).collect()}
    # "don" "'t" "stop" "," "it" "'s" "42" "tokens" "!"
    assert out[0].n_bpe_ish_tokens == 9
    assert out[0].n_ws_tokens == 5
    assert out[0].n_simple_tokens == 7  # don t stop it s 42 tokens
    assert out[1].n_ws_tokens == 2 and out[1].n_bpe_ish_tokens == 2
    assert out[2].n_ws_tokens == 0 and out[2].n_bpe_ish_tokens == 0
