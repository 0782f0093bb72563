"""Incremental (cross-corpus) minhash dedup + unigram-LM perplexity scoring.

The incremental ops are the daily-snapshot append shape: the base corpus is
represented only by its materialized signature table, the new snapshot is the
only side ever tokenized. Planted fixture: verbatim copies MUST collide,
id-salted fresh docs MUST survive, shingle-less docs MUST survive.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.curation import lm_perplexity_scores, unigram_lm
from rustserini_spark.operators.dedup import (
    build_minhash_band_table,
    build_minhash_table,
    dedup_increment,
    minhash_probe_pairs,
)

BASE_TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "large scale corpus deduplication uses banded minhash signatures daily"),
    (2, "completely different content about oceanography and coral reef biology"),
    (3, "another page describing distributed query engines and shuffle plans"),
]


@pytest.fixture(scope="module")
def base_docs(spark):
    return spark.createDataFrame(pd.DataFrame(BASE_TEXTS, columns=["doc_id", "text"]))


@pytest.fixture(scope="module")
def base_sig(spark, base_docs, tmp_path_factory):
    return build_minhash_table(base_docs, str(tmp_path_factory.mktemp("sig") / "t"))


@pytest.fixture(scope="module")
def new_docs(spark):
    rows = [
        (100, BASE_TEXTS[0][1]),  # verbatim copy of base 0 -> must collide
        (101, BASE_TEXTS[1][1] + " extra tail"),  # superset near-dup of base 1
        (102, "entirely novel text about alpine glacier meltwater chemistry models"),
        (103, "xy"),  # < 3 tokens -> no shingles -> must survive
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_probe_pairs_hit_copies(base_sig, new_docs):
    pairs = {
        (r.new_id, r.base_id)
        for r in minhash_probe_pairs(new_docs, base_sig).collect()
    }
    assert (100, 0) in pairs  # identical text -> identical signature -> all bands collide
    assert (101, 1) in pairs  # shared 3-gram shingles dominate -> >=1 band collides
    assert all(n != 102 and n != 103 for n, _ in pairs)


def test_dedup_increment_survivors(base_sig, new_docs):
    kept = {r.doc_id for r in dedup_increment(new_docs, base_sig).collect()}
    assert 100 not in kept and 101 not in kept
    assert kept >= {102, 103}


def test_band_table_probe_matches_sig_table_probe(spark, base_docs, base_sig, new_docs, tmp_path):
    bands = build_minhash_band_table(base_docs, str(tmp_path / "bands"))
    via_bands = sorted(
        (r.new_id, r.base_id)
        for r in minhash_probe_pairs(new_docs, base_bands=bands).collect()
    )
    via_sig = sorted(
        (r.new_id, r.base_id)
        for r in minhash_probe_pairs(new_docs, base_sig).collect()
    )
    assert via_bands == via_sig and via_bands
    # the broadcast-pinned plan (the documented 100-TB deployment shape)
    # must return the identical pair set
    via_bcast = sorted(
        (r.new_id, r.base_id)
        for r in minhash_probe_pairs(
            new_docs, base_bands=bands, broadcast_new=True
        ).collect()
    )
    assert via_bcast == via_sig
    # a band table persisted under the pre-BIGINT string key format must
    # fail fast, not silently join to zero pairs through an implicit cast
    import pyspark.sql.functions as F
    import pytest

    stale = bands.withColumn("band_hash", F.col("band_hash").cast("string"))
    with pytest.raises(TypeError, match="band_hash must be BIGINT"):
        minhash_probe_pairs(new_docs, base_bands=stale)
    # capped band table drops hot buckets at build time
    viral = build_minhash_band_table(
        spark.createDataFrame(
            pd.DataFrame([(i, BASE_TEXTS[0][1]) for i in range(5)], columns=["doc_id", "text"])
        ),
        str(tmp_path / "viral_bands"),
        max_bucket=4,
    )
    assert minhash_probe_pairs(new_docs, base_bands=viral).count() == 0


def test_probe_max_bucket_caps_base_buckets(spark, new_docs, tmp_path):
    # a base corpus of 5 identical docs = one 5-member bucket per band;
    # max_bucket=4 drops those buckets, so even the verbatim copy misses.
    viral = spark.createDataFrame(
        pd.DataFrame([(i, BASE_TEXTS[0][1]) for i in range(5)], columns=["doc_id", "text"])
    )
    sig = build_minhash_table(viral, str(tmp_path / "viral_sig"))
    assert minhash_probe_pairs(new_docs, sig, max_bucket=4).count() == 0
    assert minhash_probe_pairs(new_docs, sig, max_bucket=5).count() == 5


def test_lm_perplexity_matches_hand_computation(spark):
    rows = [(0, "a a b"), (1, "a b c"), (2, "")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.doc_id: r for r in lm_perplexity_scores(docs, alpha=0.5).collect()}
    # counts: a=3, b=2, c=1; N=6, V=3, denom = 6 + 0.5*3 = 7.5
    pa, pb, pc = 3.5 / 7.5, 2.5 / 7.5, 1.5 / 7.5
    exp0 = -(2 * math.log(pa) + math.log(pb)) / 3
    exp1 = -(math.log(pa) + math.log(pb) + math.log(pc)) / 3
    assert out[0].n_toks == 3 and out[1].n_toks == 3
    assert abs(out[0].avg_nll - exp0) < 1e-12
    assert abs(out[1].avg_nll - exp1) < 1e-12
    assert abs(out[1].ppl - math.exp(exp1)) < 1e-9
    assert 2 not in out  # zero-token docs are unscored
    # the common-token doc is less perplexing than the uniform one
    assert out[0].avg_nll < out[1].avg_nll


def test_lm_external_model_oov_falls_back_to_alpha_mass(spark):
    train = spark.createDataFrame(pd.DataFrame([(0, "a a b")], columns=["doc_id", "text"]))
    lm = unigram_lm(train)  # a=2, b=1; N=3, V=2, denom = 3 + 0.5*2 = 4
    score = spark.createDataFrame(pd.DataFrame([(7, "a zzz")], columns=["doc_id", "text"]))
    row = lm_perplexity_scores(score, lm=lm, alpha=0.5).collect()[0]
    exp = -(math.log(2.5 / 4.0) + math.log(0.5 / 4.0)) / 2
    assert abs(row.avg_nll - exp) < 1e-12


def test_lm_broadcast_path_identical_and_broadcast_planned(spark, base_docs):
    plain = lm_perplexity_scores(base_docs).orderBy("doc_id").collect()
    bdf = lm_perplexity_scores(base_docs, broadcast_lm=True)
    assert plain == bdf.orderBy("doc_id").collect()
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
