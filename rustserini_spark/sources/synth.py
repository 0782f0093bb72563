"""Deterministic Common-Crawl-style webtext synthesis (BASELINE.json input_hint).

Produces the exact input-table shape the engine targets::

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Generation is seeded and *partitioning-independent*: every column derives from
the doc ordinal alone (per-doc NumPy generator seeded with seed+doc_id), so the
same (n_docs, seed) yields byte-identical tables at any parallelism — which is
what lets the two-cluster-size scaling run compare like for like.

Docs 0-9 carry fixed Manhattan-Project-style passages so the reference's
canonical query ("did scientific minds lead to the success of the manhattan
project", /root/reference/tests/searcher_test.rs:92-93) has a known top answer
(doc 0), mirroring the 10-doc fixture corpus shape of
/root/reference/tests/test_files/embeddings.jsonl.gz.

``html`` wraps ``text`` in trivial deterministic markup; ``extract_text_col``
inverts it. The north-rule invariant — extracted text byte-identical to the
``text`` column per url — is asserted in tests/test_webtext_e2e.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED_DEFAULT = 42
VOCAB_SIZE = 2000
BASE_TS = pd.Timestamp("2024-06-01T00:00:00Z")

FIXED_PASSAGES = [
    "The presence of communication amid scientific minds was equally important "
    "to the success of the Manhattan Project as scientific intellect was. The "
    "only cloud hanging over the impressive achievement of the atomic "
    "researchers and engineers is what their success truly meant.",
    "The Manhattan Project and its atomic bomb helped bring an end to World "
    "War II. Its legacy of peaceful uses of atomic energy continues to have "
    "an impact on history and science.",
    "Essay on the manhattan project. The manhattan project was the name for a "
    "project conducted during World War II, to develop the first atomic bomb.",
    "Nor will it attempt to substitute for the courtroom the responsibility of "
    "judging the conduct of any person.",
    "One of the main reasons Hanford was selected as a site for the Manhattan "
    "Project was its proximity to the Columbia River.",
    "The scientific community gathered at the conference to discuss advances "
    "in nuclear physics and engineering practice.",
    "Versions of the periodic table were printed for the laboratory staff and "
    "distributed among the research divisions.",
    "The committee reviewed the safety procedures for handling radioactive "
    "material at the national laboratory facilities.",
    "In the decades that followed, the project remained a case study in "
    "large scale research organization and logistics.",
    "A brief history of modern physics would be incomplete without the story "
    "of the scientists who led these efforts.",
]

WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")


def _vocab() -> list[str]:
    # deterministic pseudo-words: wNN plus a handful of real glue words so the
    # analyzer's stop/stem paths are exercised
    glue = [
        "the", "and", "of", "to", "was", "is", "that", "scientific", "minds",
        "project", "research", "history", "data", "table", "query", "windows",
        "running", "communication", "success", "atomic",
    ]
    return glue + [f"w{i:04d}" for i in range(VOCAB_SIZE - len(glue))]


def _zipf_cdf(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return np.cumsum(w / w.sum())


def _doc_text(doc_id: int, seed: int, vocab: list[str], cdf: np.ndarray) -> str:
    if doc_id < len(FIXED_PASSAGES):
        return FIXED_PASSAGES[doc_id]
    rng = np.random.default_rng(seed + doc_id)
    n_tokens = int(20 + rng.integers(0, 140))
    idx = np.searchsorted(cdf, rng.random(n_tokens))
    return " ".join(vocab[i] for i in idx)


def _wrap_html(text: str) -> bytes:
    return b"<html><head><title>doc</title></head><body><p>" + text.encode("utf-8") + b"</p></body></html>"


def synth_webtext(
    spark: SparkSession, n_docs: int = 2000, seed: int = SEED_DEFAULT, n_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation via mapInPandas over spark.range —
    scales to any n_docs without ever materializing the corpus on the driver."""
    vocab = _vocab()
    cdf = _zipf_cdf(len(vocab))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = [_doc_text(int(i), seed, vocab, cdf) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [f"https://example.org/doc/{i:010d}" for i in ids],
                    "warc_ts": [BASE_TS + pd.Timedelta(seconds=int(i)) for i in ids],
                    "html": [_wrap_html(t) for t in texts],
                    "text": texts,
                    "lang": [_LANGS[int(i) % len(_LANGS)] for i in ids],
                }
            )

    rng_df = spark.range(0, n_docs, 1, n_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, WEBTEXT_SCHEMA)


def extract_text_col(html: Column | str) -> Column:
    """HTML -> text extraction for the trivial deterministic markup (the real
    decode of arbitrary crawl HTML would slot in here as the same-shaped
    Arrow UDF). Pure Catalyst: decode + regexp strip of the known wrapper."""
    c = F.col(html) if isinstance(html, str) else html
    s = F.decode(c, "UTF-8")
    return F.regexp_replace(
        F.regexp_replace(s, "^<html><head><title>doc</title></head><body><p>", ""),
        "</p></body></html>$",
        "",
    )


def docmap_from_urls(webtext: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """(doc_id, url): dense ordinals assigned by url sort order — the engine's
    analog of the reference's line-ordinal docid file
    (/root/reference/src/searcher/faiss/searcher.rs:66-79).

    Parallel and parallelism-independent: range-partition by url, per-partition
    rank (window keyed by spark_partition_id — partition-local, no global
    sort funnel), plus broadcast per-partition offsets (the classic
    distributed dense-rank, entirely JVM-side; a python-RDD zipWithIndex
    would pickle every row through Python). A row_number() over a global
    Window would funnel 10^12 rows through a single task; this never does."""
    from pyspark.sql import Window

    spark = webtext.sparkSession
    p = n_partitions or spark.sparkContext.defaultParallelism
    urls = (
        webtext.select("url")
        .repartitionByRange(p, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["n"] for r in urls.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy("url")
    out = (
        urls.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .select("url", "doc_id")
    )
    return out
