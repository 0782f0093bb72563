"""Scale-proof of the incremental (cross-corpus) dedup ops: probe cost must
track the SNAPSHOT, not the base corpus.

The claim behind minhash_probe_pairs / dedup_increment is the one that
matters at 100 TB: deduping a fresh crawl snapshot against the accumulated
corpus should never re-tokenize the accumulated corpus. The base is touched
only through its materialized (doc_id, h0..h15) signature table — a
fixed-width relation ~512 bytes/doc regardless of document length — so probe
time = snapshot tokenize+sign (constant for a fixed snapshot) + a scan of
the base sig table (linear in base rows but ~100x lighter than base text).
The alternative without the op is a full re-dedup of base+snapshot, which
re-pays the base corpus pass every day.

This script measures both against the same corpora at base = 50k / 200k /
500k docs with a FIXED 5k-doc snapshot (half verbatim copies of evenly
spaced base docs, half never-seen docs from a disjoint ordinal range):

  * sig_build      — build_minhash_table(base): the ONE-TIME cost, amortized
                     over every later snapshot (and already measured to be
                     near-linear in BENCH/curation_scaling.json).
  * probe          — minhash_probe_pairs(snapshot, sig_table, max_bucket):
                     the recurring cost. Expected: near-flat slope vs base
                     (only the sig-table scan grows).
  * increment      — dedup_increment(...): probe + anti-join survivors.
  * full_rededup   — minhash_lsh_pairs(base UNION snapshot, max_bucket): the
                     comparator a pipeline without the incremental op pays
                     per snapshot. Expected: ~linear in base, i.e. the gap
                     vs probe widens with base size.

Correctness accounting in the same timed pass:
  * copy_recall    — fraction of the 2,500 planted verbatim copies the probe
                     reports as (new_id, its base source) pairs,
  * n_survivors    — dedup_increment row count (fresh docs minus any with
                     natural band collisions; copies must never survive).

Both probe and comparator run with max_bucket=16 (the web-scale capped
semantics — the fixture's boilerplate prefixes create exactly the hot
band-buckets the cap exists for, on BOTH the base and probe paths).

Run detached, alone on the machine (timing run):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/incremental_dedup_scaling.py > /tmp/incr_scaling.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curation_scaling import CPUS, MINHASH_MAX_BUCKET, _final_text, synth_docs  # noqa: E402

BASE_SCALES = [int(s) for s in os.environ.get("INCR_SCALES", "50000,200000,500000").split(",")]
SNAPSHOT_DOCS = 5_000
N_COPIES = SNAPSHOT_DOCS // 2
COPY_ID_BASE = 1_000_000_000  # new_id of a copy = COPY_ID_BASE + base source id
FRESH_ID_BASE = 2_000_000_000
FRESH_ORDINAL_BASE = 10_000_000  # disjoint generator range -> never-seen text
OUT_PATH = os.environ.get(
    "INCR_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "BENCH", "incremental_dedup_scaling.json"),
)
WORK_DIR = "/tmp/incr_scaling"


def synth_snapshot(spark, n_base: int):
    """Fixed-size snapshot: N_COPIES verbatim copies of evenly spaced base
    docs + N_COPIES fresh docs from a disjoint ordinal range. Pure function
    of (ordinal, n_base) — partitioning-independent like the base corpus."""
    import pandas as pd

    stride = max(1, n_base // N_COPIES)

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i < N_COPIES:
                    src = (i * stride) % n_base
                    out.append((COPY_ID_BASE + src, _final_text(src)))
                else:
                    out.append(
                        (FRESH_ID_BASE + i, _final_text(FRESH_ORDINAL_BASE + i))
                    )
            yield pd.DataFrame(out, columns=["doc_id", "text"])

    rng = spark.range(0, SNAPSHOT_DOCS, 1, CPUS)
    return rng.mapInPandas(gen, "doc_id long, text string")


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 3), int(n)


def run_scale(spark, n_base: int) -> dict:
    from pyspark.sql import functions as F

    from rustserini_spark.operators.dedup import (
        build_minhash_band_table,
        build_minhash_table,
        dedup_increment,
        minhash_lsh_pairs,
        minhash_probe_pairs,
    )

    base_dir = f"{WORK_DIR}/base_{n_base}"
    snap_dir = f"{WORK_DIR}/snap_{n_base}"
    sig_dir = f"{WORK_DIR}/sig_{n_base}"
    synth_docs(spark, n_base).write.mode("overwrite").parquet(base_dir)
    synth_snapshot(spark, n_base).write.mode("overwrite").parquet(snap_dir)
    base = spark.read.parquet(base_dir)
    snap = spark.read.parquet(snap_dir)
    base.count(); snap.count()  # warm page cache; timings exclude generation

    # untimed warmup: python workers, codegen, JIT (the smoke run showed a
    # first-heavy-plan penalty of 3-10x on an otherwise-steady op)
    minhash_lsh_pairs(snap, max_bucket=MINHASH_MAX_BUCKET).count()

    r: dict = {"n_base": n_base, "n_snapshot": SNAPSHOT_DOCS, "ops": {}, "counts": {}}

    def rec(name, fn, reps: int = 2):
        best, n = None, None
        for _ in range(reps):
            sec, n = timed(fn)
            best = sec if best is None else min(best, sec)
        r["ops"][name], r["counts"][name] = best, n
        print(f"  [base={n_base}] {name}: {best}s ({n} rows, min of {reps})", flush=True)

    sig = {}
    # one rep: a parquet write is not idempotent-cheap, and its near-linear
    # curve is already established in BENCH/curation_scaling.json
    rec("sig_build", lambda: sig.setdefault(
        "df", build_minhash_table(base, sig_dir)).count(), reps=1)

    # probe + copy recall in ONE timed pass (a planted copy's pair is
    # (COPY_ID_BASE + src, src); a verbatim copy shares all 8 bands with its
    # source, so only the bucket cap could lose it — measured, not assumed)
    def probe_pass():
        pairs = minhash_probe_pairs(snap, sig["df"], max_bucket=MINHASH_MAX_BUCKET)
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(
                F.when(F.col("new_id") - F.lit(COPY_ID_BASE) == F.col("base_id"),
                       F.col("new_id"))
            ).alias("copies_hit"),
        ).first()
        n_copy_ids = min(N_COPIES, n_base)  # stride wraps only if base < N_COPIES
        r["copy_recall"] = round(row["copies_hit"] / n_copy_ids, 4)
        return row["n"]

    rec("probe", probe_pass)
    print(f"  [base={n_base}] copy recall: {r['copy_recall']}", flush=True)
    rec("increment", lambda: dedup_increment(
        snap, sig["df"], max_bucket=MINHASH_MAX_BUCKET).count())

    # the band-table path: base-side band hashing + bucket capping paid ONCE
    # at build, so the recurring probe is snapshot-sign + one parquet scan
    band_dir = f"{WORK_DIR}/bands_{n_base}"
    bands = {}
    rec("band_table_build", lambda: bands.setdefault(
        "df", build_minhash_band_table(
            sig["df"], band_dir, max_bucket=MINHASH_MAX_BUCKET, is_sig=True)
    ).count(), reps=1)
    rec("probe_banded", lambda: minhash_probe_pairs(
        snap, base_bands=bands["df"]).count())
    rec("increment_banded", lambda: dedup_increment(
        snap, base_bands=bands["df"]).count())

    # comparator: the full capped re-dedup a pipeline without the op pays
    rec("full_rededup", lambda: minhash_lsh_pairs(
        base.unionByName(snap), max_bucket=MINHASH_MAX_BUCKET).count())

    for d in (base_dir, snap_dir, sig_dir, band_dir):
        shutil.rmtree(d, ignore_errors=True)
    return r


def main() -> None:
    from rustserini_spark import get_spark

    os.makedirs(WORK_DIR, exist_ok=True)
    spark = get_spark("incr_dedup_scaling", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # generator closures reference curation_scaling._final_text — ship the
    # module so executor python workers can unpickle them
    spark.sparkContext.addPyFile(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "curation_scaling.py")
    )
    results = []
    for n in BASE_SCALES:
        print(f"=== base {n} docs, snapshot {SNAPSHOT_DOCS} ===", flush=True)
        results.append(run_scale(spark, n))

    growth = {}
    for op in results[0]["ops"]:
        series = [r["ops"].get(op) for r in results]
        growth[op] = [round(b / a, 2) if (a and b) else None
                      for a, b in zip(series, series[1:])]
    out = {
        "protocol": (
            f"local[{CPUS}], shuffle_partitions={CPUS}, min of 2 timed passes "
            "per op per scale (1 for sig_build) after an untimed warmup op, "
            "corpora parquet written+page-cached before timing; "
            f"fixed {SNAPSHOT_DOCS}-doc snapshot = {N_COPIES} verbatim copies "
            f"of evenly spaced base docs + {N_COPIES} fresh docs from a "
            "disjoint ordinal range; probe and comparator both run capped "
            f"(max_bucket<={MINHASH_MAX_BUCKET}). The scale claim under test: "
            "probe/increment slopes track the base SIG-TABLE scan (fixed-width, "
            "~512 B/doc) while full_rededup re-pays the base text pass — the "
            "gap must widen with base size. copy_recall = fraction of planted "
            "verbatim copies probed back to their base source in the same "
            "timed pass. probe_banded/increment_banded run against the "
            "pre-capped band table (build_minhash_band_table; its build cost "
            "is band_table_build) — zero base-side compute per probe, so the "
            "banded curves must be ~flat in base size."
        ),
        "base_scales": BASE_SCALES,
        "results": results,
        "adjacent_time_growth": growth,
        "adjacent_base_rows_growth": [
            round(b / a, 2) for a, b in zip(BASE_SCALES, BASE_SCALES[1:])
        ],
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
