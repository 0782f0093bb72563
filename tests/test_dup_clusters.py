"""Connected-component dup-cluster resolution over near-dup pair graphs:
transitivity on chains (where drop-doc_b-of-every-pair over-deletes),
component minima as cluster ids, multi-component graphs, convergence
beyond one propagation round, and the docs-level neardup_dedup survivors."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.dedup import (
    dup_clusters,
    neardup_dedup,
    simhash_neardup_pairs,
)
from rustserini_spark.session import local_rows_df


def _pairs(spark, edges):
    return local_rows_df(spark, list(edges), "doc_a long, doc_b long")


def _clusters(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_chain_is_one_cluster(spark):
    # path graph 1-2-3-4-5: near-dup is NOT transitive, so no direct 1-5
    # edge exists, yet all five are one component with min label 1. Needs
    # 4 propagation rounds — exercises the loop past its first iteration.
    got = _clusters(dup_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_components_are_separate(spark):
    got = _clusters(
        dup_clusters(_pairs(spark, [(10, 20), (20, 30), (7, 8), (40, 41), (41, 40)]))
    )
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7, 40: 40, 41: 40}


def test_min_label_flows_against_edge_direction(spark):
    # smallest id on the doc_b side and at the FAR end of the chain: the
    # label must propagate backwards through every edge
    got = _clusters(dup_clusters(_pairs(spark, [(9, 8), (8, 7), (7, 1)])))
    assert got == {1: 1, 7: 1, 8: 1, 9: 1}


def test_empty_pairs(spark):
    out = dup_clusters(_pairs(spark, []).filter(F.lit(False)))
    assert out.columns == ["doc_id", "cluster_id"] and out.count() == 0


def test_neardup_dedup_keeps_one_per_component_and_all_unpaired(spark):
    docs = local_rows_df(
        spark,
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 5, 99)],
        "doc_id long, text string",
    )
    out = neardup_dedup(docs, _pairs(spark, [(1, 2), (2, 3), (4, 5)]))
    assert sorted(r.doc_id for r in out.collect()) == [1, 4, 99]
    assert out.columns == docs.columns


def test_entry_dup_clusters_matches_duckdb_oracle(spark, sf_dir):
    """Value-exact parity of the entry-contract dup_clusters (min-label
    propagation over the simhash pair graph) against its recursive-CTE
    DuckDB oracle — the same gate the driver runs."""
    import __spark_entry__ as e

    got = (
        e.q_dup_clusters(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = (
        con.sql(e.oracle_sql()["dup_clusters"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    assert (got["cluster_id"] < got["doc_id"]).any()  # non-vacuous: real merges
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c


def test_entry_neardup_dedup_matches_duckdb_oracle(spark, sf_dir):
    """Survivor set of the docs-level near-dup deletion matches the
    recursive-CTE oracle's NOT IN (losers) set, and actually deletes."""
    import __spark_entry__ as e

    got = sorted(r.doc_id for r in e.q_neardup_dedup(spark, sf_dir).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = sorted(r[0] for r in con.sql(e.oracle_sql()["neardup_dedup"]).fetchall())
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert got == want and 0 < len(got) < n_docs


def test_clusters_over_real_simhash_pairs(spark, documents):
    # exact and token-permuted copies simhash-collide at hamming 0: each
    # planted group must resolve to one cluster rooted at the original
    docs = documents.select("doc_id", "text").limit(32)
    perm = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias("text"),
    )
    copy = docs.select((F.col("doc_id") + 2000).alias("doc_id"), "text")
    pairs = simhash_neardup_pairs(
        docs.unionByName(perm).unionByName(copy), max_hamming=0
    )
    got = _clusters(dup_clusters(pairs))
    originals = [r.doc_id for r in docs.collect()]
    for i in originals:
        assert got.get(i + 1000) == got.get(i + 2000) == got.get(i, i)


def test_dup_clusters_raises_when_max_iters_exhausted(spark):
    # a 4-edge chain cannot converge in one round; silent non-converged
    # labels would corrupt keeper resolution downstream, so it must raise
    with pytest.raises(RuntimeError, match="converge"):
        dup_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_iters=1)


def test_dup_clusters_frees_superseded_checkpoints(spark):
    """Each round localCheckpoints a new labels snapshot; superseded ones
    (and the edge checkpoint) must be unpersisted — only the RETURNED labels
    may stay in executor storage (their lineage is truncated)."""
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    out = dup_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]))
    assert out.count() == 7
    growth = sc._jsc.getPersistentRDDs().size() - before
    assert growth <= 1, f"{growth} persisted RDDs accumulated (expected only the result)"
