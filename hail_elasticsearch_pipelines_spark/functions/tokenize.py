"""Tokenization / normalization.

The reference never tokenizes (Elasticsearch's analyzers do it after
export; strings are mapped as un-analyzed ``keyword``, see
hail_scripts/v02/utils/elasticsearch_utils.py:14).  Our engine indexes
natively, so tokenization is a first-class, *pinned* function: one
definition shared by the JVM-side hot path, the pure-Python oracle, and
the DuckDB correctness SQL — this is the graft's analog of the
reference's byte-identical dummy annotator
(luigi_pipeline/lib/hail_vep_runners.py:21).

Pinned semantics (no locale, no ICU):
  1. NFC-normalize, lowercase (Python ``str.lower`` == Java
     ``Locale.ROOT`` lower for the ASCII+Latin-1 range we emit).
  2. Split on runs of characters outside ``[a-z0-9]`` (ASCII only — any
     non-ASCII codepoint is a separator in both Python and Java regex
     engines for this class).
  3. Drop empty tokens.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java and Python re agree on this class: ASCII-only alternatives.
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)

# The same tokenizer expressed for the DuckDB oracle SQL.
DUCKDB_TOKENIZE_SQL = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)


def py_tokenize(text: str | None) -> list[str]:
    """Pure-Python twin of :func:`tokenize_col` (test/oracle path)."""
    if text is None:
        return []
    text = unicodedata.normalize("NFC", text).lower()
    return [t for t in _SPLIT_RE.split(text) if t]


def py_termvector(text: "str | None") -> "list[tuple[str, int, list[int]]]":
    """ES ``_termvectors`` kernel (on-the-fly re-analysis): per-term
    (term, tf, 0-based positions) of one document's analyzed text,
    term-ascending — positions 1:1 with the positional index."""
    acc: dict[str, list[int]] = {}
    for i, t in enumerate(py_tokenize(text)):
        acc.setdefault(t, []).append(i)
    return [(t, len(p), p) for t, p in sorted(acc.items())]


def tokenize_col(col: Column | str) -> Column:
    """JVM-side tokenizer: stays inside WholeStageCodegen (no Python).

    NFC note: Spark has no builtin NFC; our corpus generator emits
    NFC-normalized text, and extraction (functions/extract.py) NFC-
    normalizes its output, so by the time text reaches this column it is
    already NFC — asserted by tests/test_tokenize.py.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_PATTERN), lambda t: t != "")


def token_count_col(col: Column | str) -> Column:
    """Number of tokens (doc length ``dl`` for BM25)."""
    return F.size(tokenize_col(col))
