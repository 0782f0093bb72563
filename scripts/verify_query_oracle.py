"""Check declared queries vs their DuckDB oracle at an arbitrary SF dir.

Usage: python scripts/verify_query_oracle.py <sf_dir> <query> [query ...]
Same normalization as tests/test_entry_oracle.py, any scale factor.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as entry_mod
    from rustserini_spark import get_spark

    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("verify_oracle", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    rc = 0
    for name in names:
        sdf = _normalize(q[name](spark, sf_dir).toPandas())
        odf = _normalize(con.sql(o[name]).df())
        ok = list(sdf.columns) == list(odf.columns) and len(sdf) == len(odf)
        if ok:
            try:
                pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, atol=1e-9, rtol=0)
            except AssertionError as e:
                ok = False
        print(f"{name}: rows={len(sdf)} oracle={len(odf)} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            rc = 1
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
