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
