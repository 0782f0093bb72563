"""Headline benchmark: one JSON line for the driver.

Runs the engine's flagship operations at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Times are end-to-end wall seconds per operation
(plan + execute + materialize counts), excluding Spark session startup.

Protocol (self-described in the output's "protocol" field):
  * SPARK_GRAFT_BENCH_REPS (default 3) full repetitions of the whole suite in
    ONE Spark session; the reported per-query time is the MIN across reps
    (this host is a shared-hypervisor VM whose throughput swings up to ~2x
    with neighbor load — min is the least-weather-biased point estimate).
    All raw reps are kept in BENCH/bench_reps.json (pointer in
    "extra.reps_raw_file") so the variance stays visible without bloating
    the headline JSON line past the driver's tail-capture window.
    Rep 1 alone pays ~8s of python-worker spin-up + JVM JIT on a fresh
    session (measured: index_build_porter [9.5, 3.3, 2.4, 2.4, 1.5] over 5
    reps) — the single-rep numbers rounds 1-2 reported mixed that cold start
    into the flagship queries; min-across-reps reports steady state.
  * the index is rebuilt (and its cache dropped) every rep — no rep ever
    reads a previous rep's cached postings.
  * the driver's own wrapper may add fields (e.g. "n") outside this dict.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

BENCH_QUERIES = (
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "simhash_groups",
    "simhash_neardup_pairs",
    "lsh_neardup",
    "text_quality",
    "lang_id",
    "fingerprint",
    "embedding_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "encode_knn",
)


def run_suite(spark, docs, queries_df, entry_mod) -> dict[str, float]:
    """One full pass over every benchmarked operation; fresh index each call."""
    from rustserini_spark.operators.index_build import build_index
    from rustserini_spark.operators.search import bm25_search, bm25_search_pruned

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # 1. index build (the reference's lucene_indexer analog), forced to
    #    materialize every posting block
    index = timed(
        "index_build_porter",
        lambda: build_index(spark, docs, analyzer="porter").materialize(),
    )

    # 2. query paths over the built index
    timed("bm25_pruned_topk", lambda: bm25_search_pruned(index, queries_df, k=10).count())
    timed("bm25_exhaustive_topk", lambda: bm25_search(index, queries_df, k=10).count())
    index.postings.unpersist()
    index.dictionary.unpersist()

    # 3. curation / dedup / similarity / encode operators from the entry contract
    q = entry_mod.queries()
    for name in BENCH_QUERIES:
        timed(name, lambda name=name: q[name](spark, SF_DIR).count())
    return timings


def main() -> None:
    import __spark_entry__ as entry_mod
    from rustserini_spark import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    queries_df = entry_mod._queries_df(spark)

    reps = [run_suite(spark, docs, queries_df, entry_mod) for _ in range(REPS)]
    timings = {k: min(r[k] for r in reps) for k in reps[0]}
    extra: dict = {
        "index_docs_per_sec": round(n_docs / timings["index_build_porter"], 1)
    }
    if REPS > 1:
        # Raw per-rep timings go to a SIDE FILE, not the headline line: round 3
        # inlined them and the 3 full per-query dicts pushed the single JSON
        # line past the driver's tail-capture window ("parsed": null — a bench
        # the driver can't read is a bench that didn't happen).
        reps_path = os.path.join(REPO, "BENCH", "bench_reps.json")
        os.makedirs(os.path.dirname(reps_path), exist_ok=True)
        with open(reps_path, "w") as f:
            json.dump({"reps_raw": reps}, f, indent=1)
        extra["reps_raw_file"] = "BENCH/bench_reps.json"

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "e2e_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": extra,
                "n_docs": n_docs,
                "cpus": int(CPUS),
                "protocol": {
                    "reps": REPS,
                    "aggregation": "min-per-query across reps (fresh index per rep)",
                    "host_note": "shared-hypervisor VM; throughput swings ~2x with neighbor load",
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
