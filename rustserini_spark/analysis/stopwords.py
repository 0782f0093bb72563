"""Lucene English default stop set (33 words).

This is the stop set used by Lucene's EnglishAnalyzer, which the reference's
sparse path applies via Anserini's DefaultLuceneDocumentGenerator
(/root/reference/src/searcher/lucene/index.rs:22-23). The word list itself is
public (Lucene documentation / the classic Salton & Buckley SMART subset).
"""

from __future__ import annotations

LUCENE_ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)

assert len(LUCENE_ENGLISH_STOPWORDS) == 33
