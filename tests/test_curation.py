"""Composed curation pipeline: each stage does its job on a corpus with
known planted defects, keepers are the smallest ids, and the entry-contract
result matches its DuckDB oracle value-exactly."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.curation import curate_corpus
from rustserini_spark.session import local_rows_df

GOOD = (
    "the quick brown fox jumps over the lazy dog while people work with good "
    "time and new ideas about life the world and other things we know"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD),                                   # survives
        (1, GOOD),                                   # exact dup of 0 -> dropped
        (2, " ".join(reversed(GOOD.split()))),       # permuted bag -> SimHash dup of 0
        (3, "too short to pass"),                    # < min_tokens
        (4, "der hund und die katze sind nicht mit dem mann in das haus "
            "gegangen aber sie waren auch nicht auf der strasse oder im garten"),  # de
        (5, "spam spam spam spam spam spam spam spam spam spam spam spam "
            "spam spam spam spam"),                  # distinct_ratio too low
        (6, "people think that work and time with new friends can make life "
            "good because we see the world change in many ways every day"),  # survives
    ]
    return local_rows_df(spark, rows, "doc_id long, text string")


def test_each_stage_filters_its_planted_defect(spark, corpus):
    got = {r.doc_id: r for r in curate_corpus(corpus).collect()}
    assert sorted(got) == [0, 6]
    assert all(r.lang_pred == "en" for r in got.values())
    assert got[0].n_tokens >= 15 and got[0].distinct_ratio >= 0.35


def test_keeper_is_min_id_even_when_planted_first(spark, corpus):
    # renumber so the EXACT dup has the smaller id (10 < 20) and the permuted
    # SimHash dup the largest (30): the exact stage must keep 10 over 20, and
    # the SimHash stage must then keep 10 over 30 — min-id keeper at both
    # stages regardless of planting order
    flipped = corpus.withColumn(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit(20))
        .when(F.col("doc_id") == 1, F.lit(10))
        .when(F.col("doc_id") == 2, F.lit(30))
        .otherwise(F.col("doc_id")),
    )
    ids = sorted(r.doc_id for r in curate_corpus(flipped).collect())
    assert ids == [6, 10]


def test_decontaminate_drops_exactly_the_planted_leak(spark):
    from rustserini_spark.operators.curation import ngram_decontaminate

    docs = local_rows_df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),   # source of the leak
            (2, "totally unrelated words about different things here"),
            (3, "prefix words then alpha beta gamma delta epsilon zeta suffix"),  # shares 6-gram
            (4, "alpha beta gamma but the run stops early here now"),  # only a 3-gram: kept
        ],
        "doc_id long, text string",
    )
    bench = local_rows_df(
        spark, [("alpha beta gamma delta epsilon zeta",)], "text string"
    )
    kept = sorted(r.doc_id for r in ngram_decontaminate(docs, bench, n=6).collect())
    assert kept == [2, 4]


def test_training_mix_is_deterministic_and_stratified(spark):
    from rustserini_spark.operators.curation import training_mix_sample

    docs = local_rows_df(
        spark,
        [(i, "en" if i % 2 else "de") for i in range(400)],
        "doc_id long, lang_pred string",
    )
    a = sorted(r.doc_id for r in training_mix_sample(docs, {"en": 0.5, "de": 1.0}).collect())
    b = sorted(r.doc_id for r in training_mix_sample(docs, {"en": 0.5, "de": 1.0}).collect())
    assert a == b  # pure function of (salt, stratum, id)
    de = [i for i in a if i % 2 == 0]
    en = [i for i in a if i % 2 == 1]
    assert len(de) == 200  # rate 1.0 keeps every de doc
    assert 60 <= len(en) <= 140  # rate 0.5 keeps ~half of 200
    # resampling-stable: a doc's decision never depends on the other docs
    half = docs.filter(F.col("doc_id") < 200)
    a_half = sorted(
        r.doc_id for r in training_mix_sample(half, {"en": 0.5, "de": 1.0}).collect()
    )
    assert a_half == [i for i in a if i < 200]
    # strata absent from rates are dropped
    assert training_mix_sample(docs, {"fr": 1.0}).count() == 0


def test_entry_decontaminate_and_mix_match_duckdb_oracle(spark, sf_dir):
    import __spark_entry__ as e

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]

    got = sorted(r.doc_id for r in e.q_decontaminate(spark, sf_dir).collect())
    want = sorted(r[0] for r in con.sql(e.oracle_sql()["decontaminate"]).fetchall())
    assert got == want and 0 < len(got) < n_docs  # the planted leak is dropped

    got = sorted(map(tuple, e.q_training_mix(spark, sf_dir).collect()))
    want = sorted(map(tuple, con.sql(e.oracle_sql()["training_mix"]).fetchall()))
    assert got == want and 0 < len(got) < n_docs


def test_entry_curation_matches_duckdb_oracle(spark, sf_dir):
    """Value-exact parity of the full entry-contract pipeline (planted dups
    included) against its DuckDB oracle — the same gate the driver runs."""
    import __spark_entry__ as e

    got = (
        e.q_curation_pipeline(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.sql(e._curation_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c
