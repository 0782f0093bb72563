"""Replicates the driver's correctness gate: every __spark_entry__ queries()
entry vs its oracle_sql() DuckDB mirror at sf0.01 — row count, column names,
and order-insensitive value equality."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("documents", "embeddings", "events")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(ALL_QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _normalize(ALL_QUERIES[name](spark, SF_DIR).toPandas())
    odf = _normalize(duck.sql(ORACLES[name]).df())
    assert list(sdf.columns) == list(odf.columns), (sdf.columns, odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, atol=1e-9, rtol=0)


def test_no_rows_only_queries_remain():
    """Every declared query has a full value oracle (round-7 closed the last
    three no-oracle entries); this pins that invariant instead of carrying a
    perpetually-skipped empty parametrization."""
    assert set(ALL_QUERIES) == set(ORACLES), sorted(
        set(ALL_QUERIES) ^ set(ORACLES)
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"qid", "doc_id", "score", "rank"} <= set(df.columns)
    # canonical Manhattan-Project query returns nothing or something, but the
    # fixed corpus queries (q0-q4) must hit:
    qids = {r.qid for r in rows}
    assert {"q0", "q1", "q2", "q3", "q4"} <= qids
    for r in rows:
        assert not math.isnan(r.score)


def test_side_oracles_follow_sf_dir(spark):
    """oracle_sql(sf_dir=...) re-points the porter/encode SIDE-TABLE dumps to
    the requested scale factor (round-5 verdict #8) — previously they pinned
    to sf0.01 and silently skipped at any other scale. Green here = side
    oracles value-exact at a non-default sf."""
    alt = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{alt}/{t}.parquet'")
    oracles = entry_mod.oracle_sql(sf_dir=alt)
    for name in ("bm25_topk_porter", "encode_knn"):
        sdf = _normalize(ALL_QUERIES[name](spark, alt).toPandas())
        odf = _normalize(con.sql(oracles[name]).df())
        assert list(sdf.columns) == list(odf.columns)
        assert len(sdf) == len(odf) > 0
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, atol=1e-9, rtol=0)
