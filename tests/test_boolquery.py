"""Boolean query language: parser unit tests + rank/score identity of
the distributed and local evaluators against the oracle."""

from __future__ import annotations

import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

QUERIES = [
    "the AND of",
    "the OR term0042",
    "term0042 AND (the OR of)",
    "(the AND of) OR (term0042 AND term0100)",
    "the AND NOT of",
    "the AND NOT (of OR term0042)",
    "The AND OF",  # keyword/term case handling
    "zzznotaterm OR term0042",
    "zzznotaterm AND the",
]


def test_parser_shapes():
    ast = bq.parse("a AND (b OR c) AND NOT d")
    assert isinstance(ast, bq.And)
    assert bq.positive_terms(ast) == ["a", "b", "c"]
    assert bq.all_terms(ast) == ["a", "b", "c", "d"]
    assert bq.positive_terms(bq.parse("NOT NOT a")) == ["a"]


@pytest.mark.parametrize(
    "bad", ["", "AND a", "a AND", "a (b", "a)", "NOT a", "a OR NOT b"]
)
def test_parser_rejects(bad):
    with pytest.raises(bq.QueryParseError):
        ast = bq.parse(bad)
        # pure-negation shapes only fail at eval time
        import numpy as np

        if bq.positive_terms(ast) == []:
            raise bq.QueryParseError("no positive terms")
        bq.eval_docs(ast, {t: np.array([1], dtype="int64") for t in bq.all_terms(ast)})


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index[0])


@pytest.fixture(scope="module")
def local_searcher(small_index):
    return LocalSearcher(small_index[0])


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q.replace(" ", "_"))
def test_bool_matches_oracle(searcher, local_searcher, small_oracle, q):
    oracle, _ = small_oracle
    expected = oracle.bool_topk(q, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.search_bool(q, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], q
    for (gd, gs), (_, es) in zip(got, expected):
        assert gs == es, (q, gd)
    got_local = local_searcher.search_bool(q, k=10)
    assert got_local == expected, q


def test_bool_not_actually_excludes(searcher, small_oracle):
    oracle, _ = small_oracle
    hits = [r["doc_id"] for r in searcher.search_bool("the AND NOT of", k=50).collect()]
    of_docs = set(oracle.posting("of")[0])
    assert hits and not (set(hits) & of_docs)
