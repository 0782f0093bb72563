"""Encoder plumbing (A3/A4 shape) + sanitize byte-identity (S5) + topics
loaders — end-to-end shape mirroring /root/reference/tests/encoder_test.rs:
encode a fixture corpus, write the embedding artifacts, search, check top-1.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.functions.text import sanitize_col, sanitize_str
from rustserini_spark.operators.encode import HashingEncoder, encode_documents
from rustserini_spark.operators.similarity import cosine_topk
from rustserini_spark.sources.readers import write_embeddings_jsonl
from rustserini_spark.sources.topics import (
    queries_from_topics,
    read_topics_jsonl,
    read_topics_tsv,
)

CORPUS = [
    ("d0", "the manhattan project atomic research history", "Manhattan"),
    ("d1", "coral reef biology and oceanography studies", "Oceans"),
    ("d2", "distributed query engines shuffle and partition data", "Engines"),
    ("d3", "", None),  # empty text, no title
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(CORPUS, columns=["docid", "text", "title"])
    )


def test_sanitize_byte_identity(spark):
    """sanitize_col (Catalyst) == sanitize_str (Python) == the reference's
    sanitize_string, byte for byte, on adversarial inputs."""
    cases = ['a"b\\c', '""', "\\\\", 'no-op', 'quote " and \\ slash', "emoji✨\"x"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.out for r in df.select(sanitize_col("s").alias("out")).collect()]
    expected = [c.replace('"', "").replace("\\", "") for c in cases]
    assert got == expected
    assert [sanitize_str(c) for c in cases] == expected


def test_encoder_deterministic_and_normalized(corpus_df):
    enc = HashingEncoder(dim=32)
    out = encode_documents(corpus_df, enc, title_col="title").collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in out}
    assert set(vecs) == {"d0", "d1", "d2", "d3"}
    for vid, v in vecs.items():
        assert v.shape == (32,)
        if vid != "d3":
            assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    assert np.allclose(vecs["d3"], 0.0)  # empty doc -> zero vector
    # determinism across a second run at different partitioning
    out2 = encode_documents(corpus_df.repartition(4), enc, title_col="title").collect()
    for r in out2:
        assert np.allclose(np.array(r.embedding), vecs[r.vec_id])


def test_encoder_pooling_modes_differ(corpus_df):
    enc = HashingEncoder(dim=32)
    mean = {r.vec_id: np.array(r.embedding) for r in encode_documents(corpus_df, enc).collect()}
    cls = {r.vec_id: np.array(r.embedding) for r in
           encode_documents(corpus_df, enc, pooler_type="cls").collect()}
    assert not np.allclose(mean["d0"], cls["d0"])  # multi-token doc: pooling matters


def test_encoder_applies_sanitize_and_title_concat(spark):
    enc = HashingEncoder(dim=32)
    pair = spark.createDataFrame(
        pd.DataFrame(
            [("a", 'manhattan "project"', "T"), ("b", "manhattan project", "T")],
            columns=["docid", "text", "title"],
        )
    )
    vecs = {r.vec_id: np.array(r.embedding) for r in
            encode_documents(pair, enc, title_col="title").collect()}
    assert np.allclose(vecs["a"], vecs["b"])  # sanitize strips the quotes
    no_title = {r.vec_id: np.array(r.embedding) for r in encode_documents(pair, enc).collect()}
    assert not np.allclose(vecs["a"], no_title["a"])  # title concat changes input


def test_encode_write_search_end_to_end(spark, corpus_df, tmp_path):
    """The encoder_test.rs shape: encode corpus -> write embedding artifact ->
    encode queries with the SAME encoder -> top-1 is the matching doc."""
    enc = HashingEncoder(dim=64)
    emb = encode_documents(corpus_df, enc, title_col="title")
    # reference S6 sink roundtrip
    write_embeddings_jsonl(emb.withColumnRenamed("vec_id", "id"), str(tmp_path / "emb"))
    back = spark.read.json(str(tmp_path / "emb"))
    assert back.count() == 4 and set(back.columns) >= {"id", "vector"}

    # integer ids for the search path (O17-style resolve is tested elsewhere)
    with_ord = emb.withColumn("vec_id", F.expr("cast(substring(vec_id, 2) as long)"))
    queries = spark.createDataFrame(
        pd.DataFrame(
            [("0", "manhattan atomic history"), ("2", "query engines partition")],
            columns=["docid", "text"],
        )
    )
    qemb = encode_documents(queries, enc).withColumn(
        "vec_id", F.expr("cast(vec_id as long)")
    )
    res = cosine_topk(with_ord, qemb, k=1).collect()
    top1 = {r.qid: r.vec_id for r in res}
    assert top1 == {0: 0, 2: 2}


def test_topics_tsv_and_jsonl(spark, tmp_path):
    tsv = tmp_path / "topics.tsv"
    tsv.write_text("q1\twhat is the manhattan project\nq2\tcoral reefs\n")
    t = read_topics_tsv(spark, str(tsv))
    q = {r.qid: r.query for r in queries_from_topics(t).collect()}
    assert q == {"q1": "what is the manhattan project", "q2": "coral reefs"}

    jl = tmp_path / "topics.jsonl"
    jl.write_text(
        '{"qid": "q1", "title": "manhattan project", "description": "longer narrative"}\n'
        '{"qid": "q2", "title": "coral reefs", "description": "reef bio"}\n'
    )
    tj = read_topics_jsonl(spark, str(jl))
    assert {r.qid: r.query for r in queries_from_topics(tj, "title").collect()} == {
        "q1": "manhattan project", "q2": "coral reefs",
    }
    assert {r.qid: r.query for r in queries_from_topics(tj, "description").collect()}[
        "q1"
    ] == "longer narrative"


# --------------------------------------------------- golden-vector harness --


def test_encoder_golden_vectors_first10():
    """Golden-vector gate mirroring the reference's encoder test shape
    (/root/reference/tests/encoder_test.rs:17-88: fixed texts+titles, assert
    the first 10 dims at rounded precision, cls vs mean pooling). Locks the
    A3/A4 contract against the deterministic stand-in — a real transformer
    encoder drops into this exact harness by swapping HashingEncoder for a
    model wrapper and replacing the golden literals with the model's outputs
    (e.g. encoder_test.rs's bert-base-uncased first-10 dims)."""
    import numpy as np

    from rustserini_spark.operators.encode import HashingEncoder

    enc = HashingEncoder(dim=64)
    texts = ["Hello, I am a sentence!", "And another sentence."]
    titles = ["Title 1", "Title 2"]

    cls = enc.encode_batch(texts, titles, "cls")
    mean = enc.encode_batch(texts, titles, "mean")
    assert cls.shape == mean.shape == (2, 64)

    golden_cls_0 = [
        -0.146532, 0.070951, -0.0304, -0.021121, -0.041583,
        0.104079, -0.080362, 0.029707, 0.215531, -0.277913,
    ]
    golden_mean_0 = [
        -0.119746, 0.110012, 0.168667, -0.00134, 0.064243,
        -0.051021, -0.046244, -0.055679, 0.13737, -0.085442,
    ]
    golden_mean_1 = [
        -0.110326, 0.023717, -0.072105, -0.010615, -0.005522,
        0.081887, -0.017124, 0.052846, 0.225029, -0.098997,
    ]
    np.testing.assert_allclose(cls[0, :10], golden_cls_0, atol=5e-7)
    np.testing.assert_allclose(mean[0, :10], golden_mean_0, atol=5e-7)
    np.testing.assert_allclose(mean[1, :10], golden_mean_1, atol=5e-7)
    # structural cls-vs-mean distinction (auto.rs:176-199): cls embeds ONLY
    # the first token — both docs share first token "Title", so their cls
    # vectors coincide while their mean vectors differ
    np.testing.assert_allclose(cls[0], cls[1], atol=0)
    assert not np.allclose(mean[0], mean[1])
    # rows are L2-normalized (auto.rs:200-206)
    np.testing.assert_allclose(np.linalg.norm(mean, axis=1), 1.0, atol=1e-6)


def test_encode_topk_fused_matches_composition(spark, documents):
    """The fused encode+score pass (encode_topk) must be HASH-identical to
    encode_documents ∘ cosine_topk — same float32 encode, same float64 widen,
    same shared r4 top-k kernel. Exact equality, not tolerance."""
    from rustserini_spark.operators.encode import encode_topk
    from rustserini_spark.session import local_rows_df

    enc = HashingEncoder(dim=16)
    docs = documents.select("doc_id", "text")
    emb = encode_documents(docs, enc, id_col="doc_id").withColumn(
        "vec_id", F.col("vec_id").cast("long")
    )
    qpairs = sorted(
        (int(r.doc_id), r.text) for r in docs.filter(F.col("doc_id") < 3).collect()
    )
    qmat = enc.encode_batch([sanitize_str("" if t is None else str(t)) for _, t in qpairs])
    queries = local_rows_df(
        spark,
        [(i, [float(x) for x in v]) for (i, _), v in zip(qpairs, qmat)],
        "vec_id long, embedding array<float>",
    )
    unfused = {(r.qid, r.vec_id, r.cos, r.rank) for r in cosine_topk(emb, queries, k=7).collect()}
    fused = {
        (r.qid, r.vec_id, r.cos, r.rank)
        for r in encode_topk(docs, enc, qpairs, k=7, id_col="doc_id").collect()
    }
    assert fused == unfused and len(fused) == 21


def test_encode_topk_rejects_non_integral_id(spark):
    from rustserini_spark.operators.encode import encode_topk

    df = spark.createDataFrame(pd.DataFrame(CORPUS, columns=["docid", "text", "title"]))
    with pytest.raises(TypeError, match="integral"):
        encode_topk(df, HashingEncoder(dim=8), [(0, "x")], id_col="docid")
