"""Capture .explain("formatted") for every declared bench query.

Usage:
    python scripts/capture_plans.py <out_dir> [query ...]

Writes <out_dir>/<query>.txt for each query (default: all BENCH_QUERIES from
bench.py). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — plan
SHAPE (Exchange count, join strategy, PushedFilters, Python eval nodes) is
scale-independent for these queries, so sf0.1 keeps the capture fast.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES
    from rustserini_spark import get_spark

    spark = get_spark("capture_plans", shuffle_partitions=32)
    q = entry_mod.queries()
    for name in names or BENCH_QUERIES:
        df = q[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", os.path.join(out_dir, f"{name}.txt"))
    spark.stop()


if __name__ == "__main__":
    main()
