"""Empirical scale-proof of the curation/dedup suite (round-5 verdict #1, #4).

The suite's 100-TB arguments are plan-shape arguments (banded LSH, bounded
bucket fan-out, map-only feature passes); this script measures them: the same
operators over deterministically synthesized corpora at sf0.1-equivalent row
counts x1 / x10 / x100 (5k / 50k / 500k docs), recording wall time per
(op, n_docs) into BENCH/curation_scaling.json so the curves themselves show

  * near-linear growth for every composed-path operator (capped minhash LSH,
    simhash banded pairs, dup_clusters, exact dedup, curate_corpus,
    decontaminate),
  * the hot-shingle cap WINNING at scale: ngram_jaccard_pairs uncapped grows
    superlinearly (hot-shingle join fan-out is sum(df^2), quadratic in corpus
    size when boilerplate shingles have df ~ 0.1*n_docs) while the capped
    variant stays near-linear — at sf0.1 the cap's df-count overhead LOSES
    (round-5 verdict: 4.05s vs 3.24s); the crossover is the point of
    measuring,
  * the SAME story one level up for minhash LSH: with rows-per-band=2 the
    band-collision probability is ~8*s^2, and boilerplate prefixes give
    unrelated short docs s~0.2, so uncapped candidate pairs grow QUADRATICALLY
    inside each boilerplate cohort (hot band-buckets of size ~0.09*cohort);
    ``max_bucket`` drops those buckets and keeps candidates ~linear while
    planted-near-dup RECALL stays 1.0 (a true J~0.9 pair collides in ~all 8
    bands, most keyed by rare shingles' minima -> tiny surviving buckets) —
    recall is recorded per op so the cap's safety is measured, not asserted,
  * the materialized signature table (build_minhash_table /
    build_simhash_table) beating the inline recompute-per-join-branch path
    once the corpus pass dominates (round-5 verdict #4).

Corpus: distributed, seeded, partitioning-independent (same generator family
as sources/synth.py — every row derives from the doc ordinal alone), with
PLANTED structure so the dedup ops find real work at every scale:
  - doc_id % 10 == 9  -> near-dup of doc_id-1 (last 3 tokens dropped)
  - doc_id % 37 == 36 -> exact dup of doc_id-2
so pair/cluster counts must scale ~linearly with n_docs — recorded alongside
the times as a correctness sanity check on the curves.

Uncapped jaccard / uncapped minhash are SKIPPED (recorded, with the
projection, not silent) at a scale where the quadratic projection from the
previous point exceeds UNCAPPED_BUDGET_S — that blow-up is the measured
finding, not a gap.

Run detached, alone on the machine (timing run):
  setsid nohup env PYTHONPATH=/root/repo python scripts/curation_scaling.py \
      > /tmp/curation_scaling.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import shutil
import time

SCALES = [int(s) for s in os.environ.get("CURATION_SCALES", "5000,50000,500000").split(",")]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42
JACCARD_DF_CAP = 50  # same cap the entry contract benches at sf0.1
MINHASH_MAX_BUCKET = 16  # planted clusters are size 2-4; boilerplate hot
# buckets are ~0.09*cohort (~43 docs already at 5k) so the cap bites at
# every measured scale and the capped curve is one consistent semantics
UNCAPPED_BUDGET_S = 900.0
OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "curation_scaling.json")
WORK_DIR = "/tmp/curation_scaling"


BOILERPLATE = [
    "subscribe to our newsletter for the latest updates and exclusive offers today",
    "all rights reserved terms of service privacy policy cookie settings contact us",
    "click here to read more about this story and share it with your friends",
]
GLUE = ["the", "and", "of", "to", "in", "for", "with", "was", "is", "that"]


def _final_text(i: int) -> str:
    """Pure function ordinal -> text; recursion depth <= 2 by construction
    (a near-dup source is never itself a near-dup: (i-1)%10 != 9)."""
    import numpy as np

    i = int(i)
    if i % 10 == 9 and i >= 1:
        toks = _final_text(i - 1).split(" ")
        return " ".join(toks[: max(5, len(toks) - 3)])  # near-dup: drop 3 tokens
    if i % 37 == 36 and i >= 2:
        return _final_text(i - 2)  # exact dup
    rng = np.random.default_rng(SEED + i)
    n_tokens = int(20 + rng.integers(0, 140))
    # high-entropy vocabulary (real web text: unrelated docs are simhash-far)
    # with ~10% shared glue words (stopword/quality paths stay exercised)
    ids = rng.integers(0, 50_000, n_tokens)
    glue_mask = rng.random(n_tokens) < 0.10
    toks = [GLUE[v % len(GLUE)] if g else f"w{v:05d}" for v, g in zip(ids, glue_mask)]
    # ~29% of docs open with one of 3 fixed boilerplate sentences: hot
    # shingles with df ~ 0.1*n_docs, the quadratic join fan-out the
    # hot-shingle cap exists for (Jaccard vs full docs stays << 0.8, so
    # boilerplate never creates reported pairs — only join work)
    if i % 7 in (0, 1):
        return BOILERPLATE[i % 3] + " " + " ".join(toks)
    return " ".join(toks)


def synth_docs(spark, n_docs: int):
    """(doc_id, text) with planted near/exact dups + boilerplate prefixes;
    deterministic per ordinal, partitioning-independent."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({"doc_id": ids, "text": [_final_text(i) for i in ids]})

    rng = spark.range(0, n_docs, 1, CPUS)
    return rng.mapInPandas(gen, "doc_id long, text string")


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 3), int(n)


def run_scale(spark, n_docs: int, projections: dict) -> dict:
    from pyspark.sql import functions as F

    from rustserini_spark.operators.curation import curate_corpus, ngram_decontaminate
    from rustserini_spark.operators.dedup import (
        build_minhash_table,
        build_simhash_table,
        dup_clusters,
        exact_dedup,
        duplicate_span_stats,
        minhash_lsh_pairs,
        minhash_verified_pairs,
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
        strip_duplicate_spans,
    )

    data_dir = f"{WORK_DIR}/docs_{n_docs}"
    synth_docs(spark, n_docs).write.mode("overwrite").parquet(data_dir)
    docs = spark.read.parquet(data_dir)
    docs.count()  # warm page cache so op timings exclude generation
    exact_dedup(docs).count()  # untimed warmup: python workers, codegen, JIT

    r: dict = {"n_docs": n_docs, "ops": {}, "counts": {}, "recall": {}}
    # planted near-dups: (i-1, i) for i % 10 == 9 — exactly n_docs // 10 pairs
    n_planted = n_docs // 10
    planted = (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 10 == 9)

    def rec(name, fn):
        sec, n = timed(fn)
        r["ops"][name] = sec
        r["counts"][name] = n
        print(f"  [{n_docs}] {name}: {sec}s ({n} rows)", flush=True)
        return sec

    def rec_pairs(name, pairs_df):
        """Timed single-pass count + planted-near-dup recall over a pair DF."""
        def one_pass():
            row = pairs_df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(planted, 1).otherwise(0)).alias("hit"),
            ).first()
            r["recall"][name] = round((row["hit"] or 0) / n_planted, 4)
            return row["n"]
        sec = rec(name, one_pass)
        print(f"  [{n_docs}] {name} planted-pair recall: {r['recall'][name]}", flush=True)
        return sec

    def skip(name, projection):
        r["ops"][name] = None
        r["counts"][name] = None
        r[f"{name}_projected_s"] = round(projection, 1)
        print(f"  [{n_docs}] {name}: SKIPPED (quadratic projection "
              f"{projection:.0f}s > {UNCAPPED_BUDGET_S}s budget — the blow-up "
              "is the finding)", flush=True)

    rec("exact_dedup", lambda: exact_dedup(docs).filter(F.col("n_dups") > 1).count())

    # --- minhash: uncapped candidate expansion is quadratic on a
    # boilerplate-heavy corpus (hot band-buckets); max_bucket is the web-scale
    # path. Both measured; uncapped skip-with-projection past the budget.
    proj = projections.get("minhash_uncapped")
    if proj is not None and proj > UNCAPPED_BUDGET_S:
        skip("minhash_uncapped", proj)
    else:
        rec_pairs("minhash_uncapped", minhash_lsh_pairs(docs))
    rec_pairs("minhash_capped",
              minhash_lsh_pairs(docs, max_bucket=MINHASH_MAX_BUCKET))
    mh_path = f"{WORK_DIR}/mh_{n_docs}"
    mh_sig = {}
    rec("minhash_sig_build", lambda: mh_sig.setdefault(
        "df", build_minhash_table(docs, mh_path)).count())
    rec_pairs("minhash_probe_indexed", minhash_lsh_pairs(
        docs, sig=mh_sig["df"], max_bucket=MINHASH_MAX_BUCKET))
    # --- the composed scale path: capped LSH candidates + exact verify on
    # candidates only — exact jaccard (no lower-bound caveat), near-linear
    rec_pairs("lsh_verified", minhash_verified_pairs(
        docs, threshold=0.8, sig=mh_sig["df"], max_bucket=MINHASH_MAX_BUCKET))

    # --- simhash: inline vs build+probe (high-entropy vocab keeps unrelated
    # docs Hamming-far, so no cap is needed: counts stay ~linear)
    rec_pairs("simhash_inline", simhash_neardup_pairs(docs, max_hamming=3))
    sh_path = f"{WORK_DIR}/sh_{n_docs}"
    sh_sig = {}
    rec("simhash_sig_build", lambda: sh_sig.setdefault(
        "df", build_simhash_table(docs, sh_path)).count())
    rec_pairs("simhash_probe_indexed", simhash_neardup_pairs(
        docs, max_hamming=3, sig=sh_sig["df"]))

    # --- jaccard: capped stays near-linear; uncapped is quadratic by design
    rec_pairs("jaccard_capped", ngram_jaccard_pairs(
        docs, threshold=0.8, max_shingle_df=JACCARD_DF_CAP))
    proj = projections.get("jaccard_uncapped")
    if proj is not None and proj > UNCAPPED_BUDGET_S:
        skip("jaccard_uncapped", proj)
    else:
        rec_pairs("jaccard_uncapped", ngram_jaccard_pairs(docs, threshold=0.8))

    # --- dup_clusters over the materialized simhash pairs (CC timed alone)
    pairs_path = f"{WORK_DIR}/pairs_{n_docs}"
    simhash_neardup_pairs(docs, max_hamming=3, sig=sh_sig["df"]).write.mode(
        "overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    rec("dup_clusters", lambda: dup_clusters(pairs).count())
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        jmap.get(k).unpersist(False)

    # --- composed pipeline + decontamination
    rec("curation_pipeline", lambda: curate_corpus(docs).count())
    bench = docs.filter(F.col("doc_id") % 1000 == 3).select("text")
    rec("decontaminate", lambda: ngram_decontaminate(docs, bench).count())

    # --- substring-level dedup (Lee et al. exact duplicated spans, w=10):
    # boilerplate prefixes (13 tokens) and the near/exact-dup plants all
    # duplicate at span granularity -> counts must grow ~linearly
    rec("span_stats", lambda: duplicate_span_stats(docs, w=10)
        .filter(F.col("dup_spans") > 0).count())
    rec("strip_spans", lambda: strip_duplicate_spans(docs, w=10)
        .join(docs, "doc_id")
        .filter(F.col("text_clean") != F.col("text")).count())

    shutil.rmtree(data_dir, ignore_errors=True)
    shutil.rmtree(mh_path, ignore_errors=True)
    shutil.rmtree(sh_path, ignore_errors=True)
    shutil.rmtree(pairs_path, ignore_errors=True)
    return r


def main() -> None:
    from rustserini_spark import get_spark

    os.makedirs(WORK_DIR, exist_ok=True)
    spark = get_spark("curation_scaling", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    results = []
    projections: dict = {}
    for i, n in enumerate(SCALES):
        print(f"=== scale {n} docs ===", flush=True)
        res = run_scale(spark, n, projections)
        results.append(res)
        # quadratic projection for the next (10x) scale from this scale's
        # measured uncapped time: t * (next/n)^2
        if i + 1 < len(SCALES):
            ratio = (SCALES[i + 1] / n) ** 2
            for op in ("jaccard_uncapped", "minhash_uncapped"):
                t = res["ops"].get(op)
                if t is not None:
                    projections[op] = t * ratio
                else:
                    projections[op] = (res.get(f"{op}_projected_s") or 1e9) * ratio

    # growth factors between adjacent scales (rows grow by SCALES ratio;
    # near-linear = time factor ~ rows factor)
    growth = {}
    for op in results[0]["ops"]:
        series = [r["ops"].get(op) for r in results]
        growth[op] = [
            round(b / a, 2) if (a and b) else None
            for a, b in zip(series, series[1:])
        ]
    out = {
        "protocol": (
            f"local[{CPUS}], shuffle_partitions={CPUS}, one timed pass per op per "
            "scale, corpus parquet written+page-cached before timing; planted "
            "10% near-dups + ~2.7% exact dups + ~29% boilerplate prefixes; "
            f"jaccard cap df<={JACCARD_DF_CAP}; minhash cap "
            f"max_bucket<={MINHASH_MAX_BUCKET}; uncapped jaccard/minhash "
            "skipped-with-projection when quadratic projection exceeds "
            f"{UNCAPPED_BUDGET_S}s (recorded, not silent); 'recall' = fraction "
            "of the n_docs/10 planted near-dup pairs the op reports, counted "
            "in the same timed pass. Recall semantics: simhash(hamming<=3) is "
            "a stricter near-dup notion than the drop-3-tokens plant, so its "
            "~0.4 recall is the op's definition, not a bucketing loss; "
            "jaccard_capped's <1 recall is the documented lower-bound caveat "
            "(capped shingles subtract Jaccard mass for boilerplate-prefixed "
            "plants); lsh_verified is the composed fix — exact jaccard on "
            "capped-LSH candidates, recall ~1.0 at near-linear cost"
        ),
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
