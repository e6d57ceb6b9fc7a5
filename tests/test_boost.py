"""Query-time term boosting (`foo^2` — ES query_string clause
boosting).  Boosts fold into idf, so every evaluation path (doc-set,
block-skip, cross-segment-pruned serving, msearch) scales exactly."""

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


def test_parse_boosts():
    ast = bq.parse("fast^3 OR key OR table^0.5")
    assert bq.term_boosts(ast) == {"fast": 3.0, "table": 0.5}
    # negated boosts never score; filter-context boosts are errors
    assert bq.term_boosts(bq.parse("a AND NOT b^4")) == {}
    for bad in ("lang:en^2", "n_chars:[1 TO 2]^3", "a^0", "a^-1"):
        with pytest.raises(bq.QueryParseError):
            bq.parse(bad)
    # boost distributes over wildcard/fuzzy expansions
    ast = bq.expand_wildcards(
        bq.parse("pre*^4 OR fz~1^5"),
        lambda p: ["pre1", "pre2"],
        lambda t, e: ["fz"],
    )
    assert bq.term_boosts(ast) == {"pre1": 4.0, "pre2": 4.0, "fz": 5.0}
    # duplicate mentions take the max boost
    assert bq.term_boosts(bq.parse("a^2 OR a^3")) == {"a": 3.0}


def test_boost_scales_contributions(searchers):
    s, L = searchers
    base = {d: sc for d, sc in L.search_bool("term0020 OR term0025", k=500)}
    boosted = {d: sc for d, sc in L.search_bool("term0020^2 OR term0025", k=500)}
    assert set(base) == set(boosted)
    only20 = {d for d, _ in L.search_bool("term0020 AND NOT term0025", k=500)}
    assert only20  # non-vacuous
    for d in only20:
        # docs holding only the boosted term score exactly 2x
        assert boosted[d] == 2.0 * base[d]


def test_boost_parity_all_paths(searchers):
    s, L = searchers
    queries = [
        "term0020^3 OR term0025 OR the^0.5",       # doc-set path (pure OR)
        "the^2 AND term0020",                       # required → block-skip path
        "(term0020^4 OR term0025) AND NOT term0030",
        "the^2 AND doc_len:[50 TO 400]",            # boost + range atom
    ]
    for q in queries:
        d = [(r.doc_id, r.score) for r in s.search_bool(q, k=15).collect()]
        loc = L.search_bool(q, k=15)
        assert d == loc and d, q
    # msearch twin returns the same boosted scores
    specs = [{"query_id": "b1", "mode": "BOOL", "query": queries[0], "k": 15}]
    m = [
        (r.doc_id, r.score)
        for r in s.search_many(specs).orderBy("rank").collect()
    ]
    assert m == [(r.doc_id, r.score) for r in s.search_bool(queries[0], k=15).collect()]


def test_boost_changes_ranking(searchers):
    _s, L = searchers
    base = [d for d, _ in L.search_bool("term0020 OR the", k=20)]
    boosted = [d for d, _ in L.search_bool("term0020 OR the^9", k=20)]
    assert base != boosted  # non-vacuous: the boost rearranged the top-k
