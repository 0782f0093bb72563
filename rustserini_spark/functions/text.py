"""Text-analysis column functions for large-scale corpus curation.

All functions here are pure Catalyst expressions (whole-stage codegen, zero
Python) over the SQL-parity tokenizer, so each has an exact DuckDB oracle in
__spark_entry__.oracle_sql(). They extend the reference's corpus-prep surface
(sanitize S5, concat A2 — /root/reference/examples/faiss_embedding_writer.rs:80-82)
with the curation ops a 100 TB training-data pipeline needs: token counting,
quality scoring, language ID, and document fingerprinting.

Every function takes a *tokens array column* (produce it once with
``with_tokens``): materializing the token array in one projection keeps the
regex tokenizer from being re-evaluated per consuming expression — at corpus
scale that difference is O(tokens) vs O(tokens^2) regex work per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustserini_spark.analysis import LUCENE_ENGLISH_STOPWORDS
from rustserini_spark.analysis.analyzer import simple_tokens_col
from rustserini_spark.functions.parity import r4

# language marker words for the n-gram/stopword-heuristic language id
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "werden"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
    "es": ("el", "los", "las", "es", "un", "una", "para", "por", "con", "del"),
}
_LANG_ORDER = ("en", "de", "fr", "es")

_STOP_SORTED = tuple(sorted(LUCENE_ENGLISH_STOPWORDS))


def with_tokens(df: DataFrame, text_col: str = "text", out_col: str = "toks") -> DataFrame:
    """Materialize the SQL-parity token array once for downstream functions."""
    return df.withColumn(out_col, simple_tokens_col(text_col))


def sanitize_col(text: Column | str) -> Column:
    """Reference S5: strip double quotes and backslashes
    (/root/reference/examples/faiss_embedding_writer.rs:80-82). Byte-identity
    with sanitize_str (and the reference's sanitize_string) is tested."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, '["\\\\]', "")


def sanitize_str(s: str) -> str:
    """Driver/Arrow-side twin of sanitize_col — the reference's exact
    sanitize_string: s.replace('"', '').replace('\\\\', '')."""
    return s.replace('"', "").replace("\\", "")


def _as_col(tokens: Column | str) -> Column:
    return F.col(tokens) if isinstance(tokens, str) else tokens


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def token_count_col(tokens: Column | str) -> Column:
    return F.size(_as_col(tokens))


# BPE-ish pre-tokenizer pieces (GPT-2-style word/number/punct split with
# common English contraction suffixes, WITHOUT lookaheads so the same pattern
# runs identically under Java regex (Spark) and RE2 (DuckDB oracle)). Token
# counts from this split approximate subword-tokenizer budget accounting far
# better than whitespace counts on web text. Whitespace is an EXPLICIT char
# class, not \s: Java's \s includes \x0b (vertical tab) while RE2's does not,
# so \s would let the two engines disagree on VT-containing text.
WS_CLASS = r" \t\n\x0B\f\r"
BPE_ISH_PATTERN = rf"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9{WS_CLASS}]+"


def bpe_ish_tokens_col(text: Column | str) -> Column:
    """Piece array under the BPE-ish pre-tokenizer (lowercased)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0))


def token_counts(text_col: str = "text", tokens: Column | str = "toks") -> list[Column]:
    """whitespace-word, simple-token and BPE-ish piece counts per doc — the
    token-budget accounting columns of a training-data pipeline."""
    c = F.col(text_col)
    ws = F.size(F.filter(F.split(c, rf"[{WS_CLASS}]+"), lambda t: t != ""))
    return [
        ws.cast("long").alias("n_ws_tokens"),
        F.size(_as_col(tokens)).cast("long").alias("n_simple_tokens"),
        F.size(bpe_ish_tokens_col(text_col)).cast("long").alias("n_bpe_ish_tokens"),
    ]


def quality_features(text_col: str = "text", tokens: Column | str = "toks") -> list[Column]:
    """n_chars, n_tokens, avg_token_len, stopword_ratio, distinct_ratio —
    the length/stopword-ratio quality heuristics used to filter web corpora."""
    toks = _as_col(tokens)
    n = F.size(toks)
    nd = n.cast("double")
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return [
        F.length(F.col(text_col)).alias("n_chars"),
        n.alias("n_tokens"),
        r4(F.when(n > 0, total_len / nd).otherwise(F.lit(0.0))).alias("avg_token_len"),
        r4(
            F.when(n > 0, _count_in(toks, _STOP_SORTED) / nd).otherwise(F.lit(0.0))
        ).alias("stopword_ratio"),
        r4(
            F.when(n > 0, F.size(F.array_distinct(toks)) / nd).otherwise(F.lit(0.0))
        ).alias("distinct_ratio"),
    ]


def lang_id_col(tokens: Column | str = "toks") -> Column:
    """Marker-word-count argmax over {en,de,fr,es}; 'und' when no marker hits.
    Ties resolve in fixed order en > de > fr > es (same CASE shape as the SQL
    oracle, so predictions match bit-for-bit)."""
    toks = _as_col(tokens)
    counts = {lang: _count_in(toks, LANG_MARKERS[lang]) for lang in _LANG_ORDER}
    expr = F.lit("und")
    # build CASE from last to first so earlier langs win ties
    for i in range(len(_LANG_ORDER) - 1, -1, -1):
        lang = _LANG_ORDER[i]
        cond = counts[lang] > 0
        for other in _LANG_ORDER[i + 1 :]:
            cond = cond & (counts[lang] >= counts[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_col(tokens: Column | str = "toks") -> Column:
    """Normalized-content fingerprint: md5 over the space-joined token stream.
    Whitespace/punctuation/case changes do not alter it; any token change does."""
    return F.md5(F.concat_ws(" ", _as_col(tokens)))


def shingles_col(tokens: Column | str = "toks", n: int = 3) -> Column:
    """n-gram (word shingle) array from a materialized token column; empty when
    the document has fewer than n tokens."""
    toks = _as_col(tokens)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    make = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        F.size(toks) >= n, F.transform(idx, make)
    ).otherwise(F.array().cast("array<string>"))
