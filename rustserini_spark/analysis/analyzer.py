"""Lucene-EnglishAnalyzer-compatible text analysis, Arrow-vectorized.

Pipeline parity target (reference operator A1, SURVEY.md §2.2): the reference
hands analysis to Lucene's EnglishAnalyzer via JNI
(/root/reference/src/searcher/lucene/index.rs:81-83,
/root/reference/src/searcher/lucene/searcher.rs:86-90):

    StandardTokenizer -> EnglishPossessiveFilter -> LowerCase -> StopFilter
    (33-word English set) -> PorterStemFilter

This module implements the same stages natively. ONE shared function serves
both the index build and the query path, guaranteeing index/query analysis
parity (the property Lucene gets by construction).

Two tokenizer modes:
  * "porter"  — the full pipeline above (rank-parity mode; not SQL-expressible,
    gated by the NumPy oracle in oracle/bm25_ref.py).
  * "simple"  — lowercase + split on non-alphanumeric, no stop/stem. This mode
    is expressible in both Spark SQL and DuckDB SQL, so it is what the driver's
    DuckDB oracle checks (__spark_entry__.py oracle_sql()).

All heavy lifting happens per Arrow batch inside a pandas UDF: C-level regex
tokenization plus a batch-local stem memo (unique-token dict), no per-row
Python UDFs (BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from rustserini_spark.analysis.porter import porter_stem
from rustserini_spark.analysis.stopwords import LUCENE_ENGLISH_STOPWORDS

# StandardTokenizer approximation: runs of Unicode letters/digits, keeping
# internal apostrophes (UAX#29 Single_Quote/MidNumLet — Lucene indexes "don't"
# as one token WITH the apostrophe); possessive 's / ’s stripped
# afterwards like EnglishPossessiveFilter. maxTokenLength=255 splits longer runs.
_TOKEN_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)
_SIMPLE_RE = re.compile(r"[0-9a-z]+")
_MAX_TOKEN_LEN = 255


def analyze_text(text: str) -> list[str]:
    """Full pipeline on one string (driver-side / oracle use)."""
    if text is None:
        return []
    out = []
    for raw in _TOKEN_RE.findall(text.lower()):
        for tok in (
            (raw,) if len(raw) <= _MAX_TOKEN_LEN
            else (raw[i : i + _MAX_TOKEN_LEN] for i in range(0, len(raw), _MAX_TOKEN_LEN))
        ):
            if tok.endswith(("'s", "’s")):
                tok = tok[:-2]
            if not tok or tok in LUCENE_ENGLISH_STOPWORDS:
                continue
            out.append(porter_stem(tok))
    return out


def simple_tokenize_text(text: str) -> list[str]:
    """SQL-parity tokenizer: lowercase, split on non-[a-z0-9], drop empties."""
    if text is None:
        return []
    return _SIMPLE_RE.findall(text.lower())


def _analyze_series(s: pd.Series) -> pd.Series:
    # Batch-local memo: stem each distinct surface form once per Arrow batch
    # (on web text the distinct/total token ratio is tiny, so this keeps the
    # Python-side cost near O(distinct) while regex runs at C speed).
    memo: dict[str, str | None] = {}
    stop = LUCENE_ENGLISH_STOPWORDS
    findall = _TOKEN_RE.findall

    def stem_one(tok: str):
        st = memo.get(tok)
        if st is None and tok not in memo:
            t = tok[:-2] if tok.endswith(("'s", "’s")) else tok
            st = None if (not t or t in stop) else porter_stem(t)
            memo[tok] = st
        return st

    def one(text):
        if text is None:
            return []
        out = []
        for raw in findall(text.lower()):
            if len(raw) <= _MAX_TOKEN_LEN:
                st = stem_one(raw)
                if st is not None:
                    out.append(st)
            else:
                for i in range(0, len(raw), _MAX_TOKEN_LEN):
                    st = stem_one(raw[i : i + _MAX_TOKEN_LEN])
                    if st is not None:
                        out.append(st)
        return out

    return s.map(one)


analyze_udf = F.pandas_udf(_analyze_series, ArrayType(StringType()))

# ---- map-side term frequencies ------------------------------------------
# tf is a per-document computation, so the analyzer can emit the EXPLODED
# (term, doc_id, dl, tf) relation directly from one Arrow pass: no corpus
# groupBy for tf, no nested map/array columns crossing the Arrow boundary
# (map serialization and JVM map-explode measured 3-5x slower), just flat
# numpy columns. At 10^12 docs this removes a full-corpus exchange AND keeps
# the Python<->JVM hop at primitive-column speed.


def term_freq_batches_factory(analyze_fn):
    """mapInPandas generator: (doc_id, <text>) batches -> (term, doc_id, dl, tf, seg).

    ``seg`` is the doc's *segment id*, assigned here — the one place where a
    document's rows are provably all together — so every doc belongs to
    exactly one segment no matter how downstream joins or Arrow batch splits
    reorder the relation. Segments are doc-disjoint by construction, which is
    the invariant the sharded query evaluation and the segment-local posting
    encoder rely on.
    """
    import numpy as np
    from collections import Counter

    SEG_DOCS = 65536  # docs per segment: bounds the whole-segment encode group

    def gen(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        seg_counter = 0
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf.iloc[:, 0].to_numpy()
            texts = pdf.iloc[:, 1]
            for lo in range(0, len(pdf), SEG_DOCS):
                hi = min(lo + SEG_DOCS, len(pdf))
                seg = (pid << 32) | seg_counter  # int64: same scheme as the
                # one-pass encoder (index_build.encode_docs_factory) — partition
                # ids to 2^31 and 2^32 segments per task, no overflow at scale
                seg_counter += 1
                terms, docs, dls, tfs = [], [], [], []
                for doc_id, text in zip(doc_ids[lo:hi], texts.iloc[lo:hi]):
                    toks = analyze_fn(text)
                    if not toks:
                        continue
                    c = Counter(toks)
                    n = len(c)
                    terms.extend(c.keys())
                    tfs.extend(c.values())
                    docs.append(np.full(n, doc_id, dtype=np.int64))
                    dls.append(np.full(n, len(toks), dtype=np.int64))
                if not terms:
                    continue
                yield pd.DataFrame(
                    {
                        "term": np.asarray(terms, dtype=object),
                        "doc_id": np.concatenate(docs),
                        "dl": np.concatenate(dls),
                        "tf": np.asarray(tfs, dtype=np.int64),
                        "seg": np.int64(seg),
                    }
                )

    return gen


TF_RELATION_SCHEMA = "term string, doc_id long, dl long, tf long, seg long"


def analyze_col(text: Column | str) -> Column:
    """tokens = analyze(text); Arrow-vectorized, shared by index & query paths."""
    return analyze_udf(F.col(text) if isinstance(text, str) else text)


def simple_tokens_col(text: Column | str) -> Column:
    """SQL-parity tokenizer as a pure Catalyst expression (whole-stage codegen,
    zero Python). DuckDB equivalent:
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")
