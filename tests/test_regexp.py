"""Regexp term queries (ES `regexp` query analog): anchored-pattern
termdict expansion → bounded disjunctive BM25, on both searchers.

Reference analog: regex-based field matching in the ES client
(hail_scripts/shared/elasticsearch_client.py:166-177)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    IndexSearcher,
    RegexpExpansionError,
    check_regexp,
    regexp_literal_prefix,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


@pytest.fixture(scope="module")
def searchers(spark, small_index):
    out, _m = small_index
    return IndexSearcher(spark, out), LocalSearcher(out)


def test_literal_prefix_extraction():
    assert regexp_literal_prefix("term00") == "term00"
    assert regexp_literal_prefix("term0[0-4]x") == "term0"
    assert regexp_literal_prefix("term.*") == "term"
    # quantifier binds the preceding char — it must leave the prefix
    assert regexp_literal_prefix("terms?") == "term"
    assert regexp_literal_prefix("term+x") == "ter"
    # top-level alternation voids any prefix; grouped alternation doesn't
    assert regexp_literal_prefix("abc|xyz") == ""
    assert regexp_literal_prefix("tab(le|s)") == "tab"


def test_check_regexp_rejects_unsafe():
    for bad in ("", "Foo", "a{2}", "a\\d", "ab^", "a$", "(a"):
        with pytest.raises(ValueError):
            check_regexp(bad)
    check_regexp("te.m00[0-4].|the")  # safe dialect passes


def test_expansion_matches_brute_force(searchers):
    s, L = searchers
    pat = "term00[0-3].|the"
    exp_d, exp_l = s.expand_regexp(pat), L.expand_regexp(pat)
    assert exp_d == exp_l
    # brute force over the full body vocabulary
    all_terms = {
        t
        for t in L._termdict.to_table(columns=["term"])["term"].to_pylist()
        if ":" not in t and not t.startswith("__")
    }
    rex = re.compile(pat)
    assert set(exp_d) == {t for t in all_terms if rex.fullmatch(t)}
    assert exp_d == sorted(exp_d)
    assert len(exp_d) > 1  # non-vacuous


def test_search_parity_and_or_equivalence(searchers):
    s, L = searchers
    pat = "term00[0-3].|the"
    d = [(r.doc_id, r.score) for r in s.search_regexp(pat, k=10).collect()]
    loc = L.search_regexp(pat, k=10)
    assert d == loc and len(d) == 10
    # scoring_boolean rewrite: identical to an OR query over the expansion
    via_or = [
        (r.doc_id, r.score)
        for r in s.search(s.expand_regexp(pat), mode="OR", k=10).collect()
    ]
    assert d == via_or


def test_expansion_cap_raises(searchers):
    s, L = searchers
    for searcher in (s, L):
        with pytest.raises(RegexpExpansionError):
            searcher.expand_regexp(".*", max_expansions=3)


def test_no_match_returns_empty(searchers):
    s, L = searchers
    pat = "zz[0-9]qq"
    assert s.expand_regexp(pat) == L.expand_regexp(pat) == []
    assert s.search_regexp(pat, k=5).count() == 0
    assert L.search_regexp(pat, k=5) == []


def test_field_scoped_regexp(spark, tmp_path_factory):
    """field= restricts the expansion to one analyzed field's terms and
    the expansion keeps the field prefix (BM25F scoring applies)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        build_index,
    )
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(80))
    titles = ["alpha notes", "alps guide", "beta alpha", "gamma ray"]
    pdf["title"] = [titles[i % 4] for i in range(len(pdf))]
    out = str(tmp_path_factory.mktemp("rex_fielded") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        out,
        docs_per_part=16,
        seg_group=2,
        n_term_buckets=8,
        text_fields=("title",),
    )
    s, L = IndexSearcher(spark, out), LocalSearcher(out)
    exp_d = s.expand_regexp("alp(ha|s)", field="title")
    exp_l = L.expand_regexp("alp(ha|s)", field="title")
    assert exp_d == exp_l == ["title:alpha", "title:alps"]
    # body-scope never leaks field terms, even with no literal prefix
    assert all(":" not in t for t in s.expand_regexp("alp.*|zzz"))
    assert all(":" not in t for t in L.expand_regexp("alp.*|zzz"))
    d = [(r.doc_id, r.score) for r in s.search_regexp("alp(ha|s)", field="title", k=8).collect()]
    assert d == L.search_regexp("alp(ha|s)", field="title", k=8) and d
