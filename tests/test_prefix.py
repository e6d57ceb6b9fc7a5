"""Prefix/wildcard expansion: termdict range scan → bounded scoring
OR (the ES wildcard query with rewrite=scoring_boolean; reference
analog: regex field matching delegated to ES,
elasticsearch_client.py:166-177)."""

from __future__ import annotations

import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    IndexSearcher,
    PrefixExpansionError,
    prefix_term_range,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def test_prefix_term_range():
    assert prefix_term_range("foo") == ("foo", "fop")
    assert prefix_term_range("a9") == ("a9", "a:")
    assert prefix_term_range("title:fo") == ("title:fo", "title:fp")
    with pytest.raises(ValueError, match="bad prefix"):
        prefix_term_range("Foo")
    with pytest.raises(ValueError, match="bad prefix"):
        prefix_term_range("__lang")
    with pytest.raises(ValueError, match="bad prefix"):
        prefix_term_range("")


def test_expand_prefix_matches_vocabulary(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    # expected: every indexed body term starting with the prefix
    vocab = {t for tk in oracle.doc_tokens.values() for t in tk}
    expected = sorted(t for t in vocab if t.startswith("term004"))
    assert expected  # term0040..term0049 live in the corpus
    s = IndexSearcher(spark, index_dir)
    ls = LocalSearcher(index_dir)
    assert s.expand_prefix("term004") == expected
    assert ls.expand_prefix("term004") == expected


def test_expand_prefix_excludes_facet_and_field_terms(spark, small_index):
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    # the small corpus has no analyzed extra fields, but facet tokens
    # (__lang_*__, __dlen_*__) exist; no [a-z0-9] prefix may reach them
    for t in ls.expand_prefix("t", max_expansions=10_000):
        assert ":" not in t and not t.startswith("__")


def test_expand_prefix_cap_raises(spark, small_index):
    index_dir, _ = small_index
    with pytest.raises(PrefixExpansionError, match="term0"):
        LocalSearcher(index_dir).expand_prefix("term0", max_expansions=10)
    with pytest.raises(PrefixExpansionError, match="term0"):
        IndexSearcher(spark, index_dir).expand_prefix(
            "term0", max_expansions=10
        )


def test_search_prefix_equals_expanded_or(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    ls = LocalSearcher(index_dir)
    terms = ls.expand_prefix("term004")
    expected = oracle.topk(terms, "OR", 15)
    got_local = ls.search_prefix("term004", k=15)
    assert got_local == expected
    s = IndexSearcher(spark, index_dir)
    got_dist = [
        (r["doc_id"], r["score"])
        for r in s.search_prefix("term004", k=15).collect()
    ]
    assert got_dist == expected


def test_search_prefix_no_match(spark, small_index):
    index_dir, _ = small_index
    assert LocalSearcher(index_dir).search_prefix("zzzq", k=5) == []
    s = IndexSearcher(spark, index_dir)
    assert s.search_prefix("zzzq", k=5).count() == 0


def test_bool_wildcard_atom(spark, small_index):
    """`term004* AND the` == the explicit OR expansion."""
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    terms = ls.expand_prefix("term004")
    explicit = f"({' OR '.join(terms)}) AND the"
    got = ls.search_bool("term004* AND the", k=20)
    assert got == ls.search_bool(explicit, k=20)
    s = IndexSearcher(spark, index_dir)
    dist = [
        (r["doc_id"], r["score"])
        for r in s.search_bool("term004* AND the", k=20).collect()
    ]
    assert dist == got


def test_bool_wildcard_no_match_is_empty_side(spark, small_index):
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    # OR with an empty expansion degrades to the other side
    assert ls.search_bool("zzzq* OR term0042", k=10) == ls.search_bool(
        "term0042", k=10
    )
    # AND with an empty expansion matches nothing
    assert ls.search_bool("zzzq* AND the", k=10) == []


def test_wildcard_parse_shapes():
    ast = bq.parse("foo*")
    assert isinstance(ast, bq.Term) and ast.wildcard and ast.term == "foo"
    ast = bq.parse("title:fo*", analyzed_fields={"title"})
    assert ast.wildcard and ast.term == "title:fo"
    with pytest.raises(bq.QueryParseError, match="non-analyzed"):
        bq.parse("title:fo*")  # no analyzed fields declared
    with pytest.raises(bq.QueryParseError):
        bq.parse("fo o*")
    expanded = bq.expand_wildcards(
        bq.parse("foo* AND bar"), lambda p: ["food", "foot"]
    )
    assert isinstance(expanded, bq.And)
    assert isinstance(expanded.parts[0], bq.Or)
    assert [t.term for t in expanded.parts[0].parts] == ["food", "foot"]
