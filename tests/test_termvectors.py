"""ES _termvectors (on-the-fly re-analysis of the stored doc text):
per-term tf/df/positions, both engines, positions 1:1 with the
positional index."""

from __future__ import annotations

import numpy as np

from hail_elasticsearch_pipelines_spark.functions.tokenize import (
    py_termvector,
    py_tokenize,
)
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def test_kernel_counts_and_positions():
    tv = dict(
        (t, (tf, pos)) for t, tf, pos in py_termvector("The cat, the hat!")
    )
    assert tv == {
        "the": (2, [0, 2]),
        "cat": (1, [1]),
        "hat": (1, [3]),
    }
    assert py_termvector(None) == [] and py_termvector("") == []


def test_engine_parity_and_index_agreement(spark, small_index, small_pages_pdf):
    index_dir, _ = small_index
    s, L = IndexSearcher(spark, index_dir), LocalSearcher(index_dir)
    # the corpus table the index was built from (dedupe-latest by url,
    # url-ordered — the engine's dense doc_id order)
    pdf = small_pages_pdf.sort_values("warc_ts").drop_duplicates(
        "url", keep="last"
    )
    pdf = pdf.sort_values("url").reset_index(drop=True)
    docs = spark.createDataFrame(
        pdf.reset_index().rename(columns={"index": "doc_id"})[
            ["doc_id", "text"]
        ]
    )
    doc_id = 3
    text = pdf["text"].iloc[doc_id]
    d = [
        (r.term, r.tf, r.df, list(r.positions))
        for r in s.termvectors(docs, doc_id).collect()
    ]
    loc = [(t, tf, df, pos) for t, tf, df, pos in L.termvectors(text)]
    assert d == loc and d
    # tf equals the analyzed token counts; positions are the token
    # positions the positional index stores (match_positions agreement)
    toks = py_tokenize(text)
    got = {t: (tf, pos) for t, tf, _df, pos in loc}
    for t, (tf, pos) in got.items():
        assert tf == toks.count(t)
        assert pos == [i for i, x in enumerate(toks) if x == t]
    some_term = max(got, key=lambda t: got[t][0])
    mp = (
        s.match_positions([doc_id], [some_term])
        .filter("doc_id = %d" % doc_id)
        .collect()
    )
    assert sorted(r.pos for r in mp) == got[some_term][1]
    # df comes from the termdict
    assert all(
        df == L.global_dfs([t])[t] for t, _tf, df, _p in loc
    )


def test_missing_doc_is_empty(spark, small_index):
    index_dir, _ = small_index
    s = IndexSearcher(spark, index_dir)
    docs = spark.createDataFrame([(999999, "x")], "doc_id long, text string")
    assert s.termvectors(docs, 5).count() == 0
