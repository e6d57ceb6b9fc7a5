"""Fuzzy (edit-distance) queries: termdict expansion with classic
Levenshtein — Spark's JVM expression, the pure-python serving DP, and
the DuckDB oracle all compute the same distance (no transpositions,
unlike ES's Damerau default — documented)."""

from __future__ import annotations

import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    FuzzyExpansionError,
    IndexSearcher,
    py_levenshtein,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def test_py_levenshtein_matches_spark(spark):
    import itertools

    from pyspark.sql import functions as F

    words = ["", "a", "ab", "table", "tabel", "tble", "scan", "scna", "line"]
    pairs = list(itertools.product(words, words))
    rows = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    ).collect()
    for r in rows:
        assert py_levenshtein(r["a"], r["b"]) == r["d"], (r["a"], r["b"])


def test_expand_fuzzy_parity_and_semantics(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    s = IndexSearcher(spark, index_dir)
    ls = LocalSearcher(index_dir)
    vocab = {t for tk in oracle.doc_tokens.values() for t in tk}
    for probe, edits in (("term0042", 1), ("trem0042", 2), ("the", 1)):
        expected = sorted(
            t
            for t in vocab
            if abs(len(t) - len(probe)) <= edits
            and py_levenshtein(t, probe) <= edits
        )
        got_d = s.expand_fuzzy(probe, max_edits=edits, max_expansions=10_000)
        got_l = ls.expand_fuzzy(probe, max_edits=edits, max_expansions=10_000)
        assert got_d == got_l == expected, probe


def test_expand_fuzzy_prefix_length_prunes(spark, small_index):
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    # prefix_length=4 keeps only candidates sharing 'term' as a prefix
    full = ls.expand_fuzzy("term0042", max_edits=2, max_expansions=10_000)
    pruned = ls.expand_fuzzy(
        "term0042", max_edits=2, prefix_length=4, max_expansions=10_000
    )
    assert set(pruned) <= set(full)
    assert all(t.startswith("term") for t in pruned)


def test_expand_fuzzy_cap_raises(spark, small_index):
    index_dir, _ = small_index
    with pytest.raises(FuzzyExpansionError):
        LocalSearcher(index_dir).expand_fuzzy(
            "term0042", max_edits=2, max_expansions=3
        )
    with pytest.raises(FuzzyExpansionError):
        IndexSearcher(spark, index_dir).expand_fuzzy(
            "term0042", max_edits=2, max_expansions=3
        )


def test_search_fuzzy_equals_expanded_or(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    ls = LocalSearcher(index_dir)
    terms = ls.expand_fuzzy("term0042", max_edits=1, max_expansions=10_000)
    expected = oracle.topk(terms, "OR", 15)
    assert (
        ls.search_fuzzy("term0042", k=15, max_expansions=10_000) == expected
    )
    s = IndexSearcher(spark, index_dir)
    got = [
        (r["doc_id"], r["score"])
        for r in s.search_fuzzy(
            "term0042", k=15, max_expansions=10_000
        ).collect()
    ]
    assert got == expected


def test_bool_fuzzy_atom(spark, small_index):
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    terms = ls.expand_fuzzy("term0042", max_edits=1, max_expansions=10_000)
    explicit = f"({' OR '.join(terms)}) AND the"
    got = ls.search_bool("term0042~ AND the", k=20)
    assert got == ls.search_bool(explicit, k=20)
    s = IndexSearcher(spark, index_dir)
    dist = [
        (r["doc_id"], r["score"])
        for r in s.search_bool("term0042~ AND the", k=20).collect()
    ]
    assert dist == got
    # ~2 spelled out; ~0 is exact
    assert ls.search_bool("term0042~0", k=5) == ls.search_bool(
        "term0042", k=5
    )


def test_fuzzy_parse_shapes():
    ast = bq.parse("foo~")
    assert isinstance(ast, bq.Term) and ast.fuzzy == 1 and ast.term == "foo"
    assert bq.parse("foo~2").fuzzy == 2
    assert bq.parse("foo~0").fuzzy == 0  # exact term
    with pytest.raises(bq.QueryParseError, match="caps at 2"):
        bq.parse("foo~3")
    ast = bq.parse("title:fo~2", analyzed_fields={"title"})
    assert ast.fuzzy == 2 and ast.term == "title:fo"
    expanded = bq.expand_wildcards(
        bq.parse("foo~ AND bar"), None, lambda t, e: ["foo", "fool"]
    )
    assert [t.term for t in expanded.parts[0].parts] == ["foo", "fool"]
    # empty fuzzy expansion -> no-match term
    expanded = bq.expand_wildcards(bq.parse("foo~"), None, lambda t, e: [])
    assert expanded.term == bq.NO_MATCH_TERM


def test_levenshtein_within_matches_full_dp():
    """r7 optimization: the banded <=k membership check used by fuzzy
    expansion must agree with the full DP for every k the query
    language allows (0, 1, 2) — exhaustively over short strings."""
    import itertools

    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        py_levenshtein,
        py_levenshtein_within,
    )

    alpha = "ab1"
    words = [
        "".join(w)
        for n in range(0, 5)
        for w in itertools.product(alpha, repeat=n)
    ]
    for a in words:
        for b in words:
            d = py_levenshtein(a, b)
            for k in (0, 1, 2):
                assert py_levenshtein_within(a, b, k) == (d <= k), (a, b, k)
