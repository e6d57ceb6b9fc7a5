"""URL canonicalization: JVM column expression ↔ python reference
parity on the messy shapes Common-Crawl urls actually take."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.functions.urls import (
    canonicalize_url_col,
    py_canonicalize_url,
)

CASES = [
    # (input, expected)
    ("HTTP://Example.COM/", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a/", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com:8080/", "http://example.com:8080/"),
    ("https://ex.com/a?utm_source=x&b=2&a=1#frag", "https://ex.com/a?a=1&b=2"),
    ("https://ex.com/a?gclid=99&fbclid=7", "https://ex.com/a"),
    ("https://ex.com/a?z=1&y=2&z=0", "https://ex.com/a?y=2&z=0&z=1"),
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com///", "https://ex.com/"),
    ("https://ex.com/Path/Case", "https://ex.com/Path/Case"),  # path keeps case
    ("https://ex.com/a?", "https://ex.com/a"),
    ("https://ex.com/a#only-frag", "https://ex.com/a"),
    ("ftp://Files.Example/X", "ftp://files.example/X"),
    ("  not-a-url  ", "not-a-url"),  # schemeless → trimmed passthrough
    ("https://ex.com/a?utm_campaign", "https://ex.com/a"),  # bare utm key
]


@pytest.mark.parametrize("raw,want", CASES)
def test_py_canonicalize(raw, want):
    assert py_canonicalize_url(raw) == want


def test_jvm_matches_python(spark):
    pdf = pd.DataFrame({"i": range(len(CASES)), "url": [c[0] for c in CASES]})
    got = (
        spark.createDataFrame(pdf)
        .select("i", canonicalize_url_col(F.col("url")).alias("c"))
        .orderBy("i")
        .collect()
    )
    for row, (raw, want) in zip(got, CASES):
        assert row["c"] == want == py_canonicalize_url(raw), raw


def test_canonical_dedupe_keys_collapse(spark):
    """The operator's purpose: crawl variants of one page key equal."""
    variants = [
        "HTTP://Site.com/a?utm_source=x&b=1#f",
        "http://site.com:80/a?b=1",
        "http://site.com/a/?b=1",
    ]
    pdf = pd.DataFrame({"url": variants})
    keys = {
        r["k"]
        for r in spark.createDataFrame(pdf)
        .select(canonicalize_url_col(F.col("url")).alias("k"))
        .collect()
    }
    assert keys == {"http://site.com/a?b=1"}
