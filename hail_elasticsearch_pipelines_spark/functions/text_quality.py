"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All JVM-side column expressions (whole-stage codegen; zero Python in
the plan) with pinned, SQL-expressible semantics so the DuckDB oracle
can replicate them exactly.

Reference analog: the declarative derived-field layer
(seqr_mt_schema.py's @row_annotation fields) — these are the web-text
equivalents of the reference's per-row quality/derived fields, applied
through functions/fields.FieldRegistry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import tokenize_col

FP_PRIME = 2147483647  # 2^31 - 1: keeps (acc*131 + c) inside int64
FP_BASE = 131

# tiny per-language stopword marker sets (heuristic lang-ID; pinned)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "como"],
    "fr": ["le", "les", "des", "est", "que", "dans", "pour", "une"],
}

EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "was", "on", "with", "as", "by", "at", "from", "are", "this", "be",
]


def token_count(col: Column | str) -> Column:
    return F.size(tokenize_col(col))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """fraction of tokens that are (English) stopwords; 0 for empty."""
    toks = tokenize_col(col)
    sw = stopwords or EN_STOPWORDS
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    toks = tokenize_col(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def alnum_ratio(col: Column | str) -> Column:
    """fraction of characters that are [a-z0-9] after lowercasing."""
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    alnum = F.length(F.regexp_replace(lc, "[^a-z0-9]", ""))
    return F.when(F.length(lc) > 0, alnum / F.length(lc)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Pinned quality heuristic in [0,1]:
        0.4 * min(n_tokens/100, 1)
      + 0.3 * alnum_ratio
      + 0.2 * (1 - |mean_token_len - 5| / 10, floored at 0)
      + 0.1 * min(stopword_ratio * 5, 1)
    Long-enough, clean, natural-prose-like text scores high."""
    n = token_count(col)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    alnum_term = alnum_ratio(col)
    mtl = mean_token_len(col)
    shape_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(mtl - F.lit(5.0)) / F.lit(10.0))
    sw_term = F.least(stopword_ratio(col) * F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_term
        + F.lit(0.3) * alnum_term
        + F.lit(0.2) * shape_term
        + F.lit(0.1) * sw_term
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language marker-token hit
    ratios; 'unknown' when no markers hit.  Deterministic tie-break by
    language-code order (en < de < es < fr checked via strict >)."""
    toks = tokenize_col(col)
    n = F.size(toks)
    ratios = {
        lang: F.when(
            n > 0, F.size(F.filter(toks, lambda t: t.isin(words))) / n
        ).otherwise(F.lit(0.0))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*ratios.values())
    expr = F.lit("unknown")
    # reversed order so earlier langs win exact ties via later override
    for lang in ["fr", "es", "de", "en"]:
        expr = F.when((ratios[lang] >= best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling document fingerprint, all-JVM:

        tv(token)  = foldl(chars, acc=0: (acc*131 + ascii(char)) % p)
        fp(doc)    = ( Σ_i (i+1) * tv(token_i) ) % p,   p = 2^31-1

    Bounded arithmetic (every intermediate < 2^53) so the identical
    computation is expressible in ANSI SQL for the oracle."""
    toks = tokenize_col(col)

    def tv(t: Column) -> Column:
        chars = F.filter(F.split(t, ""), lambda ch: ch != "")
        return F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_PRIME,
        )

    weighted = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: tv(t) * i.cast("long"),
    )
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(toks) > 0, total % FP_PRIME).otherwise(F.lit(0).cast("long"))


def token_hash_values(col: Column | str) -> Column:
    """array<long> of the pinned polynomial char hash per token instance
    (token_fingerprint's tv, exposed standalone): tv(token) =
    foldl(chars, acc=0: (acc*131 + ascii(char)) % (2^31-1)).  All-JVM,
    ANSI-SQL-expressible — used by the oracle-checkable simhash."""
    toks = tokenize_col(col)
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.filter(F.split(t, ""), lambda ch: ch != ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_PRIME,
        ),
    )


def py_token_hash(token: str) -> int:
    """Pure-Python twin of token_hash_values' per-token tv."""
    acc = 0
    for ch in token:
        acc = (acc * FP_BASE + ord(ch)) % FP_PRIME
    return acc


def py_token_fingerprint(text: str) -> int:
    """Pure-Python twin of token_fingerprint (oracle/tests)."""
    from .tokenize import py_tokenize

    toks = py_tokenize(text)
    total = 0
    for i, t in enumerate(toks):
        acc = 0
        for ch in t:
            acc = (acc * FP_BASE + ord(ch)) % FP_PRIME
        total += (i + 1) * acc
    return total % FP_PRIME if toks else 0
