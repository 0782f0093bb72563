"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8, N -> 4N).

Runs the identical index-build + query job at local[8] and local[32] on the
same pre-written webtext parquet (one JVM per level, sequential so the levels
never share CPU), then writes BENCH/BASELINE.md with throughput at both levels
and the scaling efficiency thr(4N) / (4 * thr(N)).

Usage:
    python scripts/scaling_report.py               # full report
    python scripts/scaling_report.py --once 8      # one level, prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "600000"))
# local[N] pandas-UDF pipelines use ~2N threads (N JVM tasks + N Arrow python
# workers); levels are sized so BOTH fit the physical cores — otherwise the 4N
# level measures scheduler thrash, not scaling. On a 32-core host: 4 -> 16.
LEVELS = tuple(int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(","))
DATA_DIR = os.environ.get("SCALING_DATA_DIR", f"/tmp/rustserini_scaling/webtext_{N_DOCS}")
N_QUERIES = 256


def _queries():
    # deterministic mixed head/mid/tail query set over the synth vocabulary
    qs = [
        ("cq", "did scientific minds lead to the success of the manhattan project"),
        ("c1", "atomic bomb world war"),
        ("c2", "history of modern physics"),
        ("c3", "research data table query"),
    ]
    for i in range(N_QUERIES - len(qs)):
        qs.append((f"g{i}", f"w{(7 * i) % 1800:04d} w{(13 * i) % 600:04d} research w{i % 50:04d}"))
    return qs


def prepare_data() -> None:
    if os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        return
    from rustserini_spark import get_spark
    from rustserini_spark.sources.synth import synth_webtext

    spark = get_spark("scaling-prep", master="local[32]")
    synth_webtext(spark, n_docs=N_DOCS).write.mode("overwrite").parquet(DATA_DIR)
    spark.stop()


def run_once(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from rustserini_spark import get_spark
    from rustserini_spark.operators.search import bm25_search_pruned
    from rustserini_spark.operators.webtext import index_webtext

    # AQE off for the measured job: its per-exchange materialization rounds
    # add fixed driver latency that swamps small-corpus runs; skew is handled
    # structurally by the salted build, not by AQE, so the plan is unchanged.
    aqe = os.environ.get("SCALING_AQE", "false")
    # shuffle partitions FIXED across levels: identical physical plan, only
    # executor parallelism differs (and small tasks avoid spill at the low
    # level) — on a real cluster you size this to the data, not the cores.
    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SCALING_SHUFFLE_PARTITIONS", "64")),
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.adaptive.enabled": aqe,
        },
    )
    webtext = spark.read.parquet(DATA_DIR)
    n_en = webtext.filter(F.col("lang") == "en").count()  # warms the scan

    # untimed warm-up: spawn the python worker pool + trigger codegen so the
    # timed section measures steady-state throughput, not process startup
    from rustserini_spark.operators.index_build import tokenize_docs
    warm = webtext.limit(4 * cpus * 64).repartition(2 * cpus)
    tokenize_docs(warm, "text", "url", "porter").select(F.sum(F.size("tokens"))).collect()

    t0 = time.perf_counter()
    wt = index_webtext(spark, webtext, lang="en", verify_extraction=True)
    wt.index.materialize()
    build_sec = time.perf_counter() - t0

    qdf = spark.createDataFrame(_queries(), "qid string, query string")
    t0 = time.perf_counter()
    n_results = bm25_search_pruned(wt.index, qdf, k=10).count()
    query_sec = time.perf_counter() - t0

    out = {
        "cpus": cpus,
        "n_docs_indexed": n_en,
        "build_sec": round(build_sec, 2),
        "index_docs_per_sec": round(n_en / build_sec, 1),
        "n_queries": N_QUERIES,
        "query_sec": round(query_sec, 2),
        "queries_per_sec": round(N_QUERIES / query_sec, 1),
        "n_results": n_results,
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--once":
        print("SCALING_JSON " + json.dumps(run_once(int(sys.argv[2]))))
        return

    prepare_data()
    results = {}
    for cpus in LEVELS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--once", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
            env={**os.environ, "SPARK_GRAFT_MASTER": ""},
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("SCALING_JSON ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"level {cpus} failed")
        results[cpus] = json.loads(line[0][len("SCALING_JSON "):])
        print(json.dumps(results[cpus]))

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    factor = LEVELS[1] / LEVELS[0]
    eff_build = hi["index_docs_per_sec"] / (factor * lo["index_docs_per_sec"])
    eff_query = hi["queries_per_sec"] / (factor * lo["queries_per_sec"])
    speedup_build = hi["index_docs_per_sec"] / lo["index_docs_per_sec"]

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North rule: throughput scaling efficiency >= 0.8 going from N to 4N executors.
Sandbox stand-in (no real cluster): the identical job — synth webtext parquet
({N_DOCS} docs, seed 42) -> extraction parity check -> lang filter -> docmap ->
salted block-compressed BM25 index build -> {N_QUERIES}-query pruned top-10
batch — run at local[{LEVELS[0]}] and local[{LEVELS[1]}] on a {os.cpu_count()}-core host,
one JVM per level, sequential. Each level uses ~2x its task threads
(JVM + Arrow python workers), so both levels fit the physical cores.

| metric | local[{LEVELS[0]}] (N) | local[{LEVELS[1]}] (4N) | speedup | efficiency |
|---|---|---|---|---|
| index build (docs/sec) | {lo['index_docs_per_sec']} | {hi['index_docs_per_sec']} | {speedup_build:.2f}x | {eff_build:.3f} |
| query batch (queries/sec) | {lo['queries_per_sec']} | {hi['queries_per_sec']} | {hi['queries_per_sec']/lo['queries_per_sec']:.2f}x | {eff_query:.3f} |

Raw: build {lo['build_sec']}s vs {hi['build_sec']}s on {lo['n_docs_indexed']} en docs;
query batch {lo['query_sec']}s vs {hi['query_sec']}s ({lo['n_results']} result rows, identical at both levels: {lo['n_results'] == hi['n_results']}).

Efficiency target >= 0.8: {"MET" if eff_build >= 0.8 else "NOT MET"} (build).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"levels": results, "efficiency_build": eff_build, "efficiency_query": eff_query}, f, indent=1)
    print(md)


if __name__ == "__main__":
    main()
