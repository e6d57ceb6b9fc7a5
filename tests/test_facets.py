"""Facet filtering (ES filter-context analog): `lang:en` constrains
matches via synthetic index tokens but never contributes to scores."""

from __future__ import annotations

import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index[0])


def test_facet_atom_parses_as_filter():
    ast = bq.parse("the AND lang:en")
    assert bq.positive_terms(ast) == ["the"]
    assert "__lang_en__" in bq.all_terms(ast)


@pytest.mark.parametrize("lang", ["en", "de"])
def test_lang_filter_matches_oracle(searcher, small_index, small_oracle, lang):
    oracle, pdf = small_oracle
    q = f"the AND lang:{lang}"
    expected = oracle.bool_topk(q, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.search_bool(q, k=10).collect()]
    assert got == expected, q
    # every hit really has that lang; scores equal the UNfiltered scores
    langs = pdf["lang"].tolist()
    unfiltered = dict(oracle.topk(["the"], "OR", oracle.n_docs))
    for d, s in got:
        assert langs[d] == lang
        assert s == unfiltered[d]


def test_lang_filter_local_searcher(small_index, small_oracle):
    oracle, _ = small_oracle
    q = "the AND (lang:de OR lang:fr)"
    expected = oracle.bool_topk(q, k=10)
    got = LocalSearcher(small_index[0]).search_bool(q, k=10)
    assert got == expected


def test_facet_negation(searcher, small_oracle):
    oracle, pdf = small_oracle
    q = "the AND NOT lang:en"
    got = [r["doc_id"] for r in searcher.search_bool(q, k=50).collect()]
    langs = pdf["lang"].tolist()
    assert got and all(langs[d] != "en" for d in got)


NONNORMAL_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


@pytest.fixture(scope="module")
def nonnormal_index(spark, tmp_path_factory):
    """Corpus whose facet values are NOT tokenizer-normal ('EN',
    'pt-BR', NULL) — regression for facets indexed under tokens the
    query parser could never produce."""
    import datetime

    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index

    ts = datetime.datetime(2025, 1, 1)
    rows = [
        (f"http://x/{i:03d}", ts, None, f"shared text number {i}", lang)
        for i, lang in enumerate(["EN", "pt-BR", "EN", None, "fr"])
    ]
    out = str(tmp_path_factory.mktemp("facetnorm") / "idx")
    build_index(
        spark,
        spark.createDataFrame(rows, schema=NONNORMAL_SCHEMA),
        out,
        docs_per_part=4,
        seg_group=1,
        n_term_buckets=4,
    )
    return out


@pytest.mark.parametrize(
    "atom,expected",
    [
        ("lang:EN", [0, 2]),      # raw uppercase form
        ("lang:en", [0, 2]),      # normalized form
        ("lang:pt-BR", [1]),      # raw hyphenated form
        ("lang:pt_br", [1]),      # normalized form
        ("lang:unknown", [3]),    # NULL facet value
    ],
)
def test_nonnormal_facet_values_filterable(spark, nonnormal_index, atom, expected):
    s = IndexSearcher(spark, nonnormal_index)
    got = sorted(r["doc_id"] for r in s.search_bool(f"shared AND {atom}", k=10).collect())
    assert got == expected, atom
    got_local = sorted(d for d, _ in LocalSearcher(nonnormal_index).search_bool(f"shared AND {atom}", k=10))
    assert got_local == expected, atom


def test_facet_value_normalization_parity(spark):
    """py_facet_value (parser side) and facet_value_col (index side)
    agree on adversarial values."""
    from pyspark.sql import functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        facet_value_col,
        py_facet_value,
    )

    values = ["EN", "pt-BR", "zh_Hans", "  fr  ", "a.b.c", "123", "", "???", None]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r["n"] for r in df.select(facet_value_col(F.col("v")).alias("n")).collect()]
    want = [(py_facet_value(v) or "unknown") for v in values]
    assert got == want


def test_dlen_bucket_facet_matches_oracle(searcher, small_oracle):
    """A2 exact analog: per-doc bucketed filter tokens — `dlen:B`
    selects docs with doc_len in [B, 2B) (reference:
    seqr_mt_schema.py:260-305 bucketed set-valued fields)."""
    from collections import Counter

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        py_dlen_bucket,
    )

    oracle, _ = small_oracle
    bucket = Counter(py_dlen_bucket(v) for v in oracle.doc_len.values()).most_common(1)[0][0]
    q = f"the AND dlen:{bucket}"
    expected = oracle.bool_topk(q, k=20)
    got = [(r["doc_id"], r["score"]) for r in searcher.search_bool(q, k=20).collect()]
    assert got == expected and got, q
    for d, _ in got:
        assert bucket <= oracle.doc_len[d] < 2 * bucket


def test_dlen_bucket_jvm_python_parity(spark):
    from pyspark.sql import functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        dlen_bucket_token_col,
        py_dlen_bucket,
    )

    vals = [1, 2, 3, 127, 128, 129, 2000, 65536, 0]
    df = spark.createDataFrame([(v,) for v in vals], "dl int")
    got = [r["t"] for r in df.select(dlen_bucket_token_col(F.col("dl")).alias("t")).collect()]
    want = [f"__dlen_{py_dlen_bucket(v)}__" for v in vals]
    assert got == want
