"""Time a subset of declared bench queries (same methodology as bench.py:
count() materialization, one Spark session) — for fast optimization loops.

Usage: python scripts/bench_subset.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measurement scale),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from rustserini_spark import get_spark

    names = sys.argv[1:]
    spark = get_spark("bench_subset", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    q = entry_mod.queries()
    reps: list[dict[str, float]] = []
    for _ in range(REPS):
        t: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            q[name](spark, SF_DIR).count()
            t[name] = round(time.perf_counter() - t0, 3)
        reps.append(t)
    mins = {k: min(r[k] for r in reps) for k in names}
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "min": mins}))
    spark.stop()


if __name__ == "__main__":
    main()
