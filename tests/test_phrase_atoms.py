"""Quoted-phrase atoms in the boolean query language (`"big table"` /
`"big table"~2` — the ES query_string match_phrase clause, filter
context here), composed with terms, facets, ranges, NOT, and OR."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


@pytest.fixture(scope="module")
def searchers(spark, small_index):
    out, _m = small_index
    return IndexSearcher(spark, out), LocalSearcher(out)


def test_parse_phrase_atoms():
    ast = bq.parse('(fast OR key) AND "row scan"~1 AND NOT "big table"')
    atoms = bq.phrase_atoms(ast)
    assert [(a.tokens, a.slop) for a in atoms] == [
        (("row", "scan"), 1),
        (("big", "table"), 0),
    ]
    # filter context: phrase tokens never score, never fetch postings
    assert bq.positive_terms(ast) == ["fast", "key"]
    assert bq.all_terms(ast) == ["fast", "key"]
    # single-token phrase degrades to a scoring term
    assert bq.parse('"single"') == bq.parse("single")
    with pytest.raises(bq.QueryParseError):
        bq.parse('""')
    # dedupe by key
    assert len(bq.phrase_atoms(bq.parse('"a b" AND x OR "a b"'))) == 1


def test_bool_phrase_parity_and_semantics(searchers):
    s, L = searchers
    q = 'the AND "of the"'
    d = [(r.doc_id, r.score) for r in s.search_bool(q, k=300).collect()]
    loc = L.search_bool(q, k=300)
    assert d == loc and d
    # the filter keeps exactly the phrase-containing docs
    ph_docs = {i for i, _ in L.search_phrase(["of", "the"], k=10_000)}
    assert {i for i, _ in d} == ph_docs & {
        i for i, _ in L.search_bool("the", k=10_000)
    }
    # filter context: surviving scores equal the unfiltered term scores
    base = dict(L.search(["the"], mode="OR", k=10_000))
    assert all(sc == base[i] for i, sc in d)
    # NOT composition excludes phrase docs
    n = L.search_bool('the AND NOT "of the"', k=10_000)
    assert {i for i, _ in n} == {
        i for i, _ in L.search_bool("the", k=10_000)
    } - ph_docs
    # slop widens (never shrinks) the allowed set
    w = {i for i, _ in L.search_bool('the AND "of the"~3', k=10_000)}
    assert w >= {i for i, _ in d}


def test_phrase_atoms_compose_with_ranges_and_aggs(searchers):
    s, L = searchers
    q = 'the AND "of the" AND doc_len:[50 TO 400]'
    d = [(r.doc_id, r.score) for r in s.search_bool(q, k=100).collect()]
    assert d == L.search_bool(q, k=100)
    # aggregation front half resolves phrase atoms on both engines
    a = sorted(r.doc_id for r in s.matched_ids(q, "BOOL").collect())
    b = sorted(L.matched_ids(q, "BOOL").tolist())
    assert a == b == sorted(i for i, _ in d) or (a == b and len(a) >= len(d))
    st_d = s.search_field_stats(q, "doc_len", mode="BOOL").collect()[0]
    st_l = L.search_field_stats(q, "doc_len", mode="BOOL")
    assert st_d.n_hits == st_l["n_hits"] == len(a)
    # counts route through the front half too
    assert s.search_count(q, "BOOL").collect()[0][0] == len(a)
    assert L.search_count(q, "BOOL") == len(a)


def test_phrase_atoms_in_msearch_and_filters(searchers):
    s, L = searchers
    q = 'the AND "of the"'
    specs = [{"query_id": "p", "mode": "BOOL", "query": q, "k": 20}]
    m = [
        (r.doc_id, r.score)
        for r in s.search_many(specs).orderBy("rank").collect()
    ]
    assert m == [(r.doc_id, r.score) for r in s.search_bool(q, k=20).collect()]
    f = {r.name: r.doc_count for r in s.search_filters({"ph": q, "t": "the"}).collect()}
    assert f == dict(L.search_filters({"ph": q, "t": "the"}))
    assert f["ph"] == L.search_count(q, "BOOL")
