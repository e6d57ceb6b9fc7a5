"""Query-time synonyms (ES synonym_graph in the search analyzer,
re-expressed as a query rewrite)."""

from __future__ import annotations

import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def test_rewrite_shapes():
    ast = bq.parse("fast AND NOT slow")
    out = bq.expand_synonyms(ast, {"fast": ["quick", "Rapid"], "slow": ["late"]})
    # scoring term → OR of itself + normalized synonyms
    fast_or = out.parts[0]
    assert isinstance(fast_or, bq.Or)
    assert [t.term for t in fast_or.parts] == ["fast", "quick", "rapid"]
    # NOT side expands too (analyzer semantics)
    not_node = out.parts[1]
    assert isinstance(not_node.part, bq.Or)
    assert [t.term for t in not_node.part.parts] == ["slow", "late"]
    # boosts inherit; filter/wildcard/fuzzy atoms untouched
    b = bq.expand_synonyms(bq.parse("fast^2"), {"fast": ["quick"]})
    assert all(t.boost == 2.0 for t in b.parts)
    w = bq.expand_synonyms(bq.parse("fas* AND lang:en"), {"fas": ["x"]})
    assert w.parts[0].wildcard and w.parts[1].filter
    with pytest.raises(bq.QueryParseError, match="single index token"):
        bq.expand_synonyms(bq.parse("fast"), {"fast": ["two words"]})


def test_engine_parity_and_equivalence(spark, small_index):
    index_dir, _ = small_index
    s, L = IndexSearcher(spark, index_dir), LocalSearcher(index_dir)
    syn = {"term0042": ["term0043"], "the": ["of"]}
    q = "the AND term0042"
    d = [(r.doc_id, r.score) for r in s.search_bool(q, k=200, synonyms=syn).collect()]
    loc = L.search_bool(q, k=200, synonyms=syn)
    assert d == loc and d
    # rewrite equivalence: identical to spelling the ORs out
    manual = L.search_bool("(the OR of) AND (term0042 OR term0043)", k=200)
    assert loc == manual
    # no synonyms = unchanged results
    assert L.search_bool(q, k=200) == L.search_bool(q, k=200, synonyms={})
