"""Snippet assembly (ES highlight analog): best window selection, tag
splicing, ellipses, parity between the distributed highlighter and the
serving twin, and consistency with match_char_spans offsets."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.functions.snippets import (
    best_window,
    match_spans,
    py_highlight,
)
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def test_best_window_prefers_densest_then_earliest():
    spans = [(0, 3, "a"), (50, 53, "a"), (55, 58, "b"), (60, 63, "a")]
    assert best_window(spans, 20) == (1, 4)  # 3 spans fit in [50, 63]
    # tie (every span alone) → earliest
    spans = [(0, 3, "a"), (100, 103, "a"), (200, 203, "a")]
    assert best_window(spans, 10) == (0, 1)


def test_py_highlight_basic():
    text = "alpha beta gamma " * 20 + "needle in the haystack " + "x " * 50
    snippet, n = py_highlight(text, {"needle", "haystack"}, window_chars=40)
    assert n == 2
    assert "<em>needle</em>" in snippet and "<em>haystack</em>" in snippet
    assert snippet.startswith("…") and snippet.endswith("…")
    # no match → None
    assert py_highlight(text, {"zzz"}) == (None, 0)
    assert py_highlight(None, {"a"}) == (None, 0)


def test_py_highlight_no_token_split_at_cut():
    text = "aaaa " * 100 + "needle " + "bbbb " * 100
    snippet, n = py_highlight(text, {"needle"}, window_chars=30)
    assert n == 1
    body = snippet.strip("…")
    # every token in the fragment is whole (no clipped aaa/bbb stubs
    # shorter than the source tokens at the boundaries)
    toks = body.replace("<em>", "").replace("</em>", "").split()
    assert all(t in ("aaaa", "bbbb", "needle") for t in toks), toks


def test_py_highlight_preserves_original_casing():
    text = "Alpha beta GAMMA alpha"
    snippet, n = py_highlight(text, {"alpha"}, window_chars=200)
    assert n == 2
    assert snippet == "<em>Alpha</em> beta GAMMA <em>alpha</em>"


def test_highlight_matches_char_spans(spark):
    """Spans marked by match_char_spans appear tagged in the snippet
    when the window covers them."""
    import pandas as pd

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, None),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(texts, columns=["doc_id", "text"])
    )
    terms = ["fox", "box", "the"]
    spans = IndexSearcher.match_char_spans(docs, [0, 1, 2], terms).collect()
    hl = {
        r["doc_id"]: r
        for r in IndexSearcher.highlight(
            docs, [0, 1, 2], terms, window_chars=1000
        ).collect()
    }
    assert set(hl) == {0, 1}
    for r in spans:
        snip = hl[r["doc_id"]]["snippet"]
        assert f"<em>{r['term']}</em>" in snip
    assert hl[0]["n_matches"] == 3  # the, fox, the
    # full-window snippet reproduces the text with tags stripped
    assert (
        hl[0]["snippet"].replace("<em>", "").replace("</em>", "")
        == texts[0][1]
    )


def test_highlight_serving_parity(spark, small_pages_pdf):
    """Distributed and serving highlighters produce byte-identical
    fragments over the shared corpus."""
    import pandas as pd

    pdf = (
        small_pages_pdf.sort_values("warc_ts")
        .drop_duplicates("url", keep="last")
        .sort_values("url")
        .reset_index(drop=True)
    )
    pdf = pdf[pdf["text"].notna()].head(40)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": pdf.index.to_numpy(np.int64), "text": pdf["text"]}
        )
    )
    terms = ["the", "term0042", "term0010"]
    ids = pdf.index.tolist()
    dist = {
        r["doc_id"]: (r["snippet"], r["n_matches"])
        for r in IndexSearcher.highlight(
            docs, ids, terms, window_chars=80
        ).collect()
    }
    local = LocalSearcher.highlight(
        dict(zip(ids, pdf["text"])), terms, window_chars=80
    )
    assert dist == local
    assert dist  # something matched
    for snip, n in dist.values():
        assert n >= 1 and "<em>" in snip
