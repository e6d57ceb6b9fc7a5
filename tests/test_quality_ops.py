"""Corpus-quality operators: Gopher repetition metrics, duplicate-line
fraction, benchmark decontamination (operators/quality.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.functions.tokenize import py_tokenize
from hail_elasticsearch_pipelines_spark.operators.quality import (
    duplicate_line_fraction,
    ngram_overlap,
    repetition_stats,
)

TEXTS = [
    "the cat sat on the mat the cat sat again",   # repeated bigrams
    "a b a b a b a b",                             # one dominant bigram
    "unique words only here now",                  # no repeats
    "x",                                           # shorter than n
    "",                                            # empty
    "Tick tock, tick tock; tick TOCK!",            # case/punct folding
]


def _pdf():
    return pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})


def _brute_rep(text: str, n: int):
    toks = py_tokenize(text)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0, 0.0, 0.0
    from collections import Counter

    c = Counter(grams)
    total = len(grams)
    dup = sum(v for v in c.values() if v > 1)
    return total, dup / total, max(c.values()) / total


@pytest.mark.parametrize("n", [2, 3])
def test_repetition_stats_vs_bruteforce(spark, n):
    df = spark.createDataFrame(_pdf())
    got = {
        r.doc_id: (r.n_grams, r.dup_gram_frac, r.top_gram_frac)
        for r in repetition_stats(df, n=n).collect()
    }
    assert set(got) == set(range(len(TEXTS)))
    for i, text in enumerate(TEXTS):
        total, dup, top = _brute_rep(text, n)
        assert got[i][0] == total, (i, n)
        assert got[i][1] == pytest.approx(dup), (i, n)
        assert got[i][2] == pytest.approx(top), (i, n)


def test_repetition_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        repetition_stats(spark.createDataFrame(_pdf()), n=0)


def test_duplicate_line_fraction(spark):
    import pyspark.sql.functions as F

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a\nb\na\n\n  a  ",   # 5 lines, 1 empty → 4 kept, 2 distinct
                "one\ntwo\nthree",
                "same\nsame\nsame",
                "",
            ],
        }
    )
    got = {
        r.doc_id: r.f
        for r in spark.createDataFrame(rows)
        .select("doc_id", duplicate_line_fraction("text").alias("f"))
        .collect()
    }
    assert got[0] == pytest.approx(1.0 - 2 / 4)
    assert got[1] == 0.0
    assert got[2] == pytest.approx(1.0 - 1 / 3)
    assert got[3] == 0.0


def _brute_overlap(texts, bench_texts, n):
    bench = set()
    for t in bench_texts:
        toks = py_tokenize(t)
        bench |= {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    for i, t in enumerate(texts):
        toks = py_tokenize(t)
        grams = {
            " ".join(toks[i2 : i2 + n]) for i2 in range(len(toks) - n + 1)
        }
        ov = len(grams & bench)
        out[i] = (len(grams), ov, ov / len(grams) if grams else 0.0)
    return out


@pytest.mark.parametrize("hashed", [False, True])
def test_ngram_overlap_vs_bruteforce(spark, hashed):
    docs = spark.createDataFrame(_pdf())
    bench_texts = ["the cat sat on the mat", "a b a b", "benchmark only text"]
    bench = spark.createDataFrame(pd.DataFrame({"text": bench_texts}))
    got = {
        r.doc_id: (r.n_grams, r.n_overlap, r.overlap_frac)
        for r in ngram_overlap(docs, bench, n=3, hashed=hashed).collect()
    }
    expected = _brute_overlap(TEXTS, bench_texts, 3)
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0], i
        assert got[i][1] == expected[i][1], i
        assert got[i][2] == pytest.approx(expected[i][2]), i
    # doc 0 is partially contaminated, doc 2 is clean
    assert got[0][1] > 0 and got[2][1] == 0


def test_ngram_overlap_broadcasts_benchmark(spark):
    """The benchmark side must reach the plan as a broadcast join —
    the corpus scan never shuffles for the membership test."""
    docs = spark.createDataFrame(_pdf())
    bench = spark.createDataFrame(pd.DataFrame({"text": ["a b c d"]}))
    plan = ngram_overlap(docs, bench, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_gopher_filter_rules_and_reasons(spark):
    from hail_elasticsearch_pipelines_spark.operators.quality import (
        GOPHER_RULES,
        gopher_filter,
    )

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                # clean: 72 tokens, stopwords present, every bigram unique
                " ".join(
                    f"the word{i}a of word{i}b and word{i}c"
                    for i in range(12)
                ),
                "short text",                          # too few tokens
                " ".join(["spam"] * 80),               # repetitive, no stopwords
                "a\na\na\n" + " ".join(
                    f"of token{i:03d} piece" for i in range(20)
                ),                                     # dup lines
            ],
        }
    )
    got = {
        r.doc_id: (r.keep, r.n_failed, r.reasons)
        for r in gopher_filter(spark.createDataFrame(rows)).collect()
    }
    assert got[0] == (True, 0, "")
    assert not got[1][0] and "too_few_tokens" in got[1][2]
    assert not got[2][0]
    r2 = got[2][2].split(",")
    assert {"too_few_stopwords", "dup_ngrams", "top_ngram_dominates"} <= set(r2)
    # pinned order: reasons appear in GOPHER_RULES order
    assert r2 == [r for r in GOPHER_RULES if r in set(r2)]
    assert not got[3][0] and "dup_lines" in got[3][2]
    assert got[3][1] == got[3][2].count(",") + 1


def test_gopher_filter_threshold_override_and_validation(spark):
    from hail_elasticsearch_pipelines_spark.operators.quality import (
        gopher_filter,
    )

    rows = pd.DataFrame({"doc_id": [0], "text": ["the of and " * 30]})
    df = spark.createDataFrame(rows)
    strict = gopher_filter(df, min_tokens=1000).collect()[0]
    assert not strict.keep and "too_few_tokens" in strict.reasons
    with pytest.raises(ValueError):
        gopher_filter(df, nope=1)
