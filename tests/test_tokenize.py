from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.functions.tokenize import (
    py_tokenize,
    token_count_col,
    tokenize_col,
)

CASES = [
    "hello world",
    "Hello, World!  multiple   spaces",
    "",
    "ünïcode séparators go here",
    "digits123 mixed4you 42",
    "...leading and trailing...",
    "tab\tand\nnewline",
    "ALLCAPS lower MiXeD",
    "a",
    "日本語 text ascii only survives",
]


def test_python_tokenizer_basics():
    assert py_tokenize("Hello, World!") == ["hello", "world"]
    assert py_tokenize("") == []
    assert py_tokenize(None) == []
    assert py_tokenize("a-b_c.d") == ["a", "b", "c", "d"]
    # non-ASCII are separators
    assert py_tokenize("ünïcode") == ["n", "code"]


def test_jvm_python_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": CASES}))
    got = df.select(tokenize_col("text").alias("toks"), token_count_col("text").alias("n")).collect()
    for row, case in zip(got, CASES):
        expected = py_tokenize(case)
        assert list(row["toks"]) == expected, case
        assert row["n"] == len(expected)


def test_corpus_parity(spark, small_pages_pdf):
    texts = small_pages_pdf["text"].dropna().tolist()[:50]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [list(r["t"]) for r in df.select(tokenize_col("text").alias("t")).collect()]
    assert got == [py_tokenize(t) for t in texts]
