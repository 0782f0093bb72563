"""Substring-dedup scale-proof at Lee-et-al. span width (round-6 verdict #5).

`scripts/curation_scaling.py` exercises the span ops at w=10 because its
corpus is short web snippets (20-160 tokens). The cited procedure (Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better") removes
exact duplicated substrings of >= 50 TOKENS from long documents — this script
measures duplicate_span_stats / strip_duplicate_spans at w=50 over corpora of
long docs (100-400 tokens) with PLANTED long duplicated passages, at 5k / 50k
/ 500k docs, recording wall time + planted-passage recall into
BENCH/span_scaling.json.

Corpus (deterministic per ordinal, partitioning-independent):
  * every doc: 100-400 high-entropy tokens (50k-word vocab, ~10% glue words);
    random 50-token windows never collide, so background dup_spans is 0;
  * doc_id % 5 == 0 embeds one of 20 fixed 80-token PASSAGES (passage index
    (doc_id//5) % 20) at a deterministic offset — the quoted-boilerplate /
    syndicated-passage structure substring dedup exists for. Each passage
    occurs in n_docs/100 documents, so occurrence counts (and therefore both
    ops' work) grow LINEARLY with corpus size; an 80-token passage contains
    31 duplicated 50-token windows per occurrence.

Recall accounting (exact, not sampled — counted in the timed pass):
  * stats_recall  = fraction of planted docs duplicate_span_stats flags with
    dup_spans > 0 (must be 1.0: every planted occurrence duplicates);
  * strip_recall  = fraction of NON-CANONICAL planted docs whose text_clean
    shrank (must be 1.0; the 20 global-first occurrences legitimately keep
    their passage, so they are excluded);
  * false_flags   = docs flagged that carry no planted passage (must be 0:
    the high-entropy background cannot repeat a 50-token window).

Run detached, alone on the machine:
  setsid nohup env PYTHONPATH=/root/repo python scripts/span_scaling.py \
      > /tmp/span_scaling.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import shutil
import time

SCALES = [int(s) for s in os.environ.get("SPAN_SCALES", "5000,50000,500000").split(",")]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 271828
W = 50
PASSAGE_TOKENS = 80
N_PASSAGES = 20
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "span_scaling.json",
)
WORK_DIR = "/tmp/span_scaling"

GLUE = ["the", "and", "of", "to", "in", "for", "with", "was", "is", "that"]


def _tokens(rng, n: int) -> list[str]:
    ids = rng.integers(0, 50_000, n)
    glue = rng.random(n) < 0.10
    return [GLUE[v % len(GLUE)] if g else f"w{v:05d}" for v, g in zip(ids, glue)]


def _passage(j: int) -> list[str]:
    import numpy as np

    # high-entropy but FIXED passages; disjoint vocab block (x-prefix) so a
    # passage window can never collide with background tokens by accident
    rng = np.random.default_rng(SEED + 10_000_019 * (j + 1))
    return [f"x{v:05d}" for v in rng.integers(0, 50_000, PASSAGE_TOKENS)]


def _final_text(i: int) -> str:
    import numpy as np

    i = int(i)
    rng = np.random.default_rng(SEED + i)
    n_tokens = int(100 + rng.integers(0, 300))
    toks = _tokens(rng, n_tokens)
    if i % 5 == 0:
        p = _passage((i // 5) % N_PASSAGES)
        at = int(rng.integers(0, n_tokens - 1))
        toks = toks[:at] + p + toks[at:]
    return " ".join(toks)


def synth_long_docs(spark, n_docs: int):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({"doc_id": ids, "text": [_final_text(i) for i in ids]})

    return spark.range(0, n_docs, 1, CPUS).mapInPandas(gen, "doc_id long, text string")


def run_scale(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from rustserini_spark.operators.dedup import (
        duplicate_span_stats,
        strip_duplicate_spans,
    )

    # spill-aware shuffle sizing: the window-hash relation is ~250 rows/doc
    # (one 32-byte md5 per token position on these long docs) — at 500k docs
    # that is ~165M shuffle rows, and 32 partitions put ~5M rows (~0.5 GB
    # with agg state) in each hash-agg task. Scale the INITIAL partition
    # count with the data (AQE coalesces small scales back down), exactly
    # the sizing rule a 100-TB run applies via spark.sql.shuffle.partitions.
    spark.conf.set("spark.sql.shuffle.partitions", str(max(CPUS, n_docs // 4000)))

    data_dir = f"{WORK_DIR}/docs_{n_docs}"
    synth_long_docs(spark, n_docs).write.mode("overwrite").parquet(data_dir)
    docs = spark.read.parquet(data_dir)
    docs.count()  # page-cache + python-worker warm
    r: dict = {"n_docs": n_docs}

    planted = F.col("doc_id") % 5 == 0
    n_planted = (n_docs + 4) // 5

    t0 = time.perf_counter()
    stats = duplicate_span_stats(docs, w=W)
    row = stats.agg(
        F.sum(F.when(F.col("dup_spans") > 0, 1).otherwise(0)).alias("flagged"),
        F.sum(F.when((F.col("dup_spans") > 0) & planted, 1).otherwise(0)).alias("hit"),
        F.sum(F.when((F.col("dup_spans") > 0) & ~planted, 1).otherwise(0)).alias("false_flags"),
    ).first()
    r["span_stats_s"] = round(time.perf_counter() - t0, 3)
    r["stats_recall"] = round(row["hit"] / n_planted, 4)
    r["false_flags"] = int(row["false_flags"])
    print(f"  [{n_docs}] span_stats w={W}: {r['span_stats_s']}s recall "
          f"{r['stats_recall']} false {r['false_flags']}", flush=True)

    # canonical keepers: the global-first occurrence of each passage = the
    # N_PASSAGES smallest planted doc_ids per passage index
    t0 = time.perf_counter()
    stripped = strip_duplicate_spans(docs, w=W)
    changed = stripped.join(docs, "doc_id").filter(F.col("text_clean") != F.col("text"))
    row = changed.agg(
        F.count(F.lit(1)).alias("n_changed"),
        F.sum(F.when(planted, 1).otherwise(0)).alias("planted_changed"),
        F.sum(F.length("text_clean")).alias("chk"),
    ).first()
    r["strip_spans_s"] = round(time.perf_counter() - t0, 3)
    n_canonical = min(N_PASSAGES, n_planted)
    r["strip_recall"] = round((row["planted_changed"] or 0) / max(n_planted - n_canonical, 1), 4)
    r["strip_false"] = int((row["n_changed"] or 0) - (row["planted_changed"] or 0))
    r["strip_checksum"] = int(row["chk"] or 0)
    print(f"  [{n_docs}] strip_spans w={W}: {r['strip_spans_s']}s recall "
          f"{r['strip_recall']} false {r['strip_false']}", flush=True)

    shutil.rmtree(data_dir, ignore_errors=True)
    return r


def main() -> None:
    from rustserini_spark import get_spark

    os.makedirs(WORK_DIR, exist_ok=True)
    spark = get_spark("span_scaling", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    results = [run_scale(spark, n) for n in SCALES]
    growth = {
        op: [
            round(b[op] / a[op], 2) for a, b in zip(results, results[1:])
        ]
        for op in ("span_stats_s", "strip_spans_s")
    }
    out = {
        "protocol": (
            f"local[{CPUS}], shuffle partitions scaled with the data "
            f"(max({CPUS}, n_docs/4000) initial, AQE coalesces small scales) — "
            "the spill-aware sizing rule a 100-TB run applies; one timed pass "
            f"per op per scale after a page-cache warm; w={W} (Lee et al. span "
            "width) over "
            "long docs (100-400 background tokens, 50k-word high-entropy vocab); "
            f"20% of docs embed one of {N_PASSAGES} fixed {PASSAGE_TOKENS}-token "
            "passages at a deterministic offset (linear occurrence growth). "
            "stats_recall = planted docs flagged dup_spans>0 (expect 1.0); "
            "strip_recall = non-canonical planted docs whose text changed "
            "(expect 1.0); false counts expect 0 (background windows cannot "
            "repeat)."
        ),
        "w": W,
        "scales": SCALES,
        "results": results,
        "adjacent_time_growth": growth,
        "adjacent_rows_growth": [round(b / a, 2) for a, b in zip(SCALES, SCALES[1:])],
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
