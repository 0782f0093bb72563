"""Parallelism-scaling evidence (north-rule two-cluster-size criterion) for
the round-7 operators: incremental-dedup probe and LM-perplexity scoring.

Same protocol as scripts/curation_parallel_scaling.py (sequential adjacent
N-vs-4N pairs on local-cluster[1,4] / local-cluster[4,4], frequency-state
controlled with integer spinners on unused cpus, warmed JVMs, fixed
shuffle_partitions=128, AQE ON — the engine session default — result parity
asserted across levels). Measured jobs sized to stay above the multi-stage
AQE sequencing floor the 200k lsh_verified measurement documented:

  incr_probe     — minhash_probe_pairs(snapshot, base sig table,
                   max_bucket=16): the recurring cost of the
                   incremental-dedup shape, signature-table path (base-side
                   band explode + cap agg paid per probe). The base sig
                   table is pre-built ONCE at local[32] as shared
                   level-independent input (same discipline as the 2M
                   floor-recovery measurement); the snapshot
                   tokenize+sign+band-join is what's timed.
  incr_probe_banded — the DEPLOYMENT probe plan: pre-capped band table
                   (zero base-side compute) + broadcast_new=True (the base
                   relation is scanned map-side, never shuffled; the only
                   shuffle is the candidate-sized distinct).
  lm_perplexity  — lm_perplexity_scores over the corpus (LM trained
                   inline, materialized to a per-level temp path): explode
                   -> vocab join -> per-doc agg, the suite's classic
                   two-shuffle aggregation shape.

Run detached, alone on the machine (timing run):
  setsid nohup env PYTHONPATH=/root/repo \
      python scripts/newops_parallel_scaling.py > /tmp/newops_par.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("NEWPAR_DOCS", "200000"))
SNAP_DOCS = int(os.environ.get("NEWPAR_SNAP", "50000"))
REPS = int(os.environ.get("NEWPAR_REPS", "9"))
LEVELS = ((1, 4), (4, 4))
EXEC_MEM_MB = 10240
WORK = "/tmp/newops_par"
DATA_DIR = f"{WORK}/docs_{N_DOCS}"
SNAP_DIR = f"{WORK}/snap_{SNAP_DOCS}"
SIG_DIR = f"{WORK}/sig_{N_DOCS}"  # shared, pre-built once at local[32]
BANDS_DIR = f"{WORK}/bands_{N_DOCS}"  # pre-capped band table, same discipline
OUT_PATH = os.environ.get(
    "NEWPAR_OUT", os.path.join(REPO, "BENCH", "newops_parallel_scaling.json")
)
OPS = ("incr_probe", "incr_probe_banded", "lm_perplexity")


def synth_snapshot(spark, n_base: int, n_snap: int):
    """Same shape as incremental_dedup_scaling.synth_snapshot, defined in
    __main__ so cloudpickle ships it by value; _final_text is imported inside
    the generator from the addPyFile-shipped curation_scaling module."""
    n_copies = n_snap // 2
    stride = max(1, n_base // n_copies)

    def gen(batches):
        import pandas as pd
        from curation_scaling import _final_text

        for pdf in batches:
            out = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i < n_copies:
                    src = (i * stride) % n_base
                    out.append((1_000_000_000 + src, _final_text(src)))
                else:
                    out.append((2_000_000_000 + i, _final_text(10_000_000 + i)))
            yield pd.DataFrame(out, columns=["doc_id", "text"])

    return spark.range(0, n_snap, 1, 32).mapInPandas(gen, "doc_id long, text string")


def one_pass(spark, docs, snap, sig, bands, tag: str) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from rustserini_spark.functions.parity import r4
    from rustserini_spark.operators.curation import lm_perplexity_scores
    from rustserini_spark.operators.dedup import minhash_probe_pairs

    t: dict = {}
    par: dict = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        par[name] = fn()
        t[name] = round(time.perf_counter() - t0, 3)

    timed("incr_probe", lambda: minhash_probe_pairs(
        snap, sig, max_bucket=16).count())
    timed("incr_probe_banded", lambda: minhash_probe_pairs(
        snap, base_bands=bands, broadcast_new=True).count())
    lm_path = f"{WORK}/lm_{tag}"
    shutil.rmtree(lm_path, ignore_errors=True)
    # parity checksum: exact integer sum of per-doc floor(r4(avg_nll)*1e4)
    # (order-independent, forces the full scoring pass to materialize)
    timed("lm_perplexity", lambda: tuple(
        lm_perplexity_scores(docs, lm_path=lm_path)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_toks").alias("toks"),
             F.sum((r4(F.col("avg_nll")) * 10000).cast("long")).alias("ck"))
        .first()))
    shutil.rmtree(lm_path, ignore_errors=True)
    return t, par


def run_once(workers: int, cores: int) -> dict:
    from rustserini_spark import get_spark

    spark = get_spark(
        f"newpar-{workers}x{cores}",
        master=f"local-cluster[{workers},{cores},{EXEC_MEM_MB}]",
        shuffle_partitions=128,
        extra_conf={
            "spark.driver.memory": "8g",
            # local-cluster's third arg is WORKER capacity; the executor
            # request still defaults to 1g and the 2M-doc hash aggs blow a
            # 1g heap (cannotAllocateMemoryToGrowBytesToBytesMap). Same
            # per-executor memory at both levels — aggregate memory scales
            # with executor count exactly as machine count would.
            "spark.executor.memory": "9g",
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.sql.adaptive.enabled": "true",
            "spark.ui.enabled": "false",
        },
    )
    docs = spark.read.parquet(DATA_DIR)
    snap = spark.read.parquet(SNAP_DIR)
    sig = spark.read.parquet(SIG_DIR)
    bands = spark.read.parquet(BANDS_DIR)
    docs.count(); snap.count(); sig.count(); bands.count()  # cache + warm
    one_pass(spark, docs, snap, sig, bands, f"{workers}x{cores}_warm")  # C2-JIT warm
    t, par = one_pass(spark, docs, snap, sig, bands, f"{workers}x{cores}_timed")
    spark.stop()
    return {"workers": workers, "cores": cores, "sec": t, "parity": par}


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--once":
        print("NEWPAR_JSON " + json.dumps(run_once(int(sys.argv[2]), int(sys.argv[3]))))
        return

    os.makedirs(WORK, exist_ok=True)
    if not (os.path.isdir(DATA_DIR) and os.path.isdir(SNAP_DIR)
            and os.path.isdir(SIG_DIR) and os.path.isdir(BANDS_DIR)):
        scripts_dir = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, scripts_dir)
        import curation_scaling as cs

        from rustserini_spark import get_spark
        from rustserini_spark.operators.dedup import (
            build_minhash_band_table,
            build_minhash_table,
        )

        spark = get_spark("newpar-prep", master="local[32]", shuffle_partitions=32)
        spark.sparkContext.addPyFile(os.path.join(scripts_dir, "curation_scaling.py"))
        if not os.path.isdir(DATA_DIR):
            cs.synth_docs(spark, N_DOCS).write.mode("overwrite").parquet(DATA_DIR)
        if not os.path.isdir(SNAP_DIR):
            synth_snapshot(spark, N_DOCS, SNAP_DOCS).write.mode("overwrite").parquet(SNAP_DIR)
        if not os.path.isdir(SIG_DIR):
            build_minhash_table(spark.read.parquet(DATA_DIR), SIG_DIR)
        if not os.path.isdir(BANDS_DIR):
            build_minhash_band_table(
                spark.read.parquet(SIG_DIR), BANDS_DIR, max_bucket=16, is_sig=True
            )
        spark.stop()

    n_cpus = os.cpu_count() or 32

    def run_level(workers: int, cores: int) -> dict | None:
        used = min(n_cpus, 3 * workers * cores)
        cpuset = f"0-{used - 1}"
        for attempt in (1, 2):
            fillers = [
                subprocess.Popen(
                    ["taskset", "-c", str(cpu), "sh", "-c", "while : ; do : ; done"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                for cpu in range(used, n_cpus)
            ]
            try:
                proc = subprocess.Popen(
                    ["taskset", "-c", cpuset, sys.executable,
                     os.path.abspath(__file__), "--once", str(workers), str(cores)],
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                    cwd=REPO,
                    env={**os.environ, "SPARK_GRAFT_MASTER": "", "PYTHONPATH": REPO},
                )
                out, err = proc.communicate()
            finally:
                for fp in fillers:
                    fp.kill()
            line = [ln for ln in out.splitlines() if ln.startswith("NEWPAR_JSON ")]
            if line:
                rep = json.loads(line[0][len("NEWPAR_JSON "):])
                rep["cpuset"] = cpuset
                return rep
            sys.stderr.write(out[-2000:] + err[-4000:])
            sys.stderr.write(f"\nlevel {workers}x{cores} attempt {attempt} failed\n")
        return None

    reps: dict = {f"{w}x{c}": [] for w, c in LEVELS}
    failed_pairs = 0
    for r in range(REPS):
        pair = {}
        for workers, cores in LEVELS:
            rep = run_level(workers, cores)
            if rep is None:
                break
            pair[f"{workers}x{cores}"] = rep
            print(json.dumps(rep), flush=True)
        if len(pair) == len(LEVELS):
            for key, rep in pair.items():
                reps[key].append(rep)
        else:
            failed_pairs += 1
            print(f'{{"dropped_pair": {r}}}', flush=True)
    if not reps[f"{LEVELS[0][0]}x{LEVELS[0][1]}"]:
        raise SystemExit("no complete pairs")

    nk, fk = f"{LEVELS[0][0]}x{LEVELS[0][1]}", f"{LEVELS[1][0]}x{LEVELS[1][1]}"
    slot_ratio = (LEVELS[1][0] * LEVELS[1][1]) / (LEVELS[0][0] * LEVELS[0][1])
    pair_eff = {
        op: [
            round((a["sec"][op] / b["sec"][op]) / slot_ratio, 3)
            for a, b in zip(reps[nk], reps[fk])
        ]
        for op in OPS
    }
    med = {op: sorted(v)[len(v) // 2] for op, v in pair_eff.items()}
    parity_ok = all(
        a["parity"][op] == b["parity"][op]
        for op in OPS
        for a in reps[nk] + reps[fk]
        for b in (reps[fk][0],)
    )
    out = {
        "protocol": (
            f"local-cluster[{LEVELS[0][0]},{LEVELS[0][1]},{EXEC_MEM_MB}] (N) vs "
            f"local-cluster[{LEVELS[1][0]},{LEVELS[1][1]},{EXEC_MEM_MB}] (4N), "
            "sequential adjacent pairs, frequency-state controlled (integer "
            "spinners on unused cpus), slot-normalized cpusets (3 cpus/slot), "
            "warmed JVMs (one untimed full pass), shuffle_partitions=128 and "
            f"AQE ON at both levels. incr_probe: {SNAP_DOCS}-doc snapshot vs a "
            f"{N_DOCS}-doc base signature table pre-built once at local[32] "
            "(level-independent shared input; base-side band+cap work paid "
            "per probe). incr_probe_banded: same snapshot vs the pre-capped "
            "band table with broadcast_new=True — the deployment plan (base "
            "scanned map-side, never shuffled). lm_perplexity: full "
            f"{N_DOCS}-doc corpus, LM trained inline per pass. eff = "
            "(t_N / t_4N) / 4; parity = identical op results across all runs "
            "of both levels (lm checksum = exact integer sum of per-doc "
            "floor(r4(avg_nll)*1e4))."
        ),
        "n_docs": N_DOCS,
        "n_snapshot": SNAP_DOCS,
        "dropped_pairs": failed_pairs,
        "reps": reps,
        "pair_efficiency": pair_eff,
        "median_efficiency": med,
        "parity_ok": parity_ok,
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
