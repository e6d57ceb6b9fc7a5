"""ES stats/histogram aggregations + term suggester: distributed vs
serving parity and oracle-vs-corpus ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


def _ground_truth(oracle, terms, mode):
    """Matching doc ids + dls from the pure-python oracle corpus."""
    hits = set()
    for d, tk in oracle.doc_tokens.items():
        present = [t for t in terms if t in tk]
        ok = len(present) == len(terms) if mode == "AND" else bool(present)
        if ok:
            hits.add(d)
    return {d: oracle.doc_len[d] for d in hits}


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "term0042"], "OR"), (["the", "of"], "AND"), (["zzz"], "OR")],
)
def test_search_stats_parity(spark, small_index, small_oracle, terms, mode):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    truth = _ground_truth(oracle, terms, mode)
    s = IndexSearcher(spark, index_dir)
    row = s.search_stats(terms, mode).collect()[0]
    local = LocalSearcher(index_dir).search_stats(terms, mode)
    if not truth:
        assert local["n_hits"] == 0 and (row["n_hits"] or 0) == 0
        return
    dls = list(truth.values())
    expected = {
        "n_hits": len(dls),
        "min_dl": min(dls),
        "max_dl": max(dls),
        "sum_dl": sum(dls),
        "avg_dl": sum(dls) / len(dls),
    }
    assert local == expected
    got = {k: row[k] for k in expected}
    assert got == pytest.approx(expected)


def test_search_histogram_parity(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    truth = _ground_truth(oracle, ["the", "term0042"], "OR")
    exp: dict[int, int] = {}
    for dl in truth.values():
        b = dl // 32 * 32
        exp[b] = exp.get(b, 0) + 1
    expected = sorted(exp.items())
    s = IndexSearcher(spark, index_dir)
    got = [
        (r["bucket"], r["doc_count"])
        for r in s.search_histogram(["the", "term0042"], 32, "OR").collect()
    ]
    assert got == expected
    assert LocalSearcher(index_dir).search_histogram(
        ["the", "term0042"], 32, "OR"
    ) == expected
    with pytest.raises(ValueError, match="interval"):
        LocalSearcher(index_dir).search_histogram(["the"], 0)


def test_stats_bool_query(spark, small_index, small_oracle):
    """BOOL mode routes through the shared match kernel (with
    wildcard expansion)."""
    index_dir, _ = small_index
    oracle, _ = small_oracle
    ls = LocalSearcher(index_dir)
    got = ls.search_stats("the AND term004*", "BOOL")
    terms = ls.expand_prefix("term004")
    truth = {
        d: oracle.doc_len[d]
        for d, tk in oracle.doc_tokens.items()
        if "the" in tk and any(t in tk for t in terms)
    }
    assert got["n_hits"] == len(truth)
    assert got["sum_dl"] == sum(truth.values())


def test_suggest_terms_parity(spark, small_index, small_oracle):
    index_dir, _ = small_index
    oracle, _ = small_oracle
    vocab: dict[str, int] = {}
    for tk in oracle.doc_tokens.values():
        for t in set(tk):
            if t.startswith("term00"):
                vocab[t] = vocab.get(t, 0) + 1
    expected = sorted(vocab.items(), key=lambda x: (-x[1], x[0]))[:5]
    s = IndexSearcher(spark, index_dir)
    got = [
        (r["term"], r["df"])
        for r in s.suggest_terms("term00", size=5).collect()
    ]
    assert got == expected
    assert LocalSearcher(index_dir).suggest_terms("term00", size=5) == expected


def test_suggest_fuzzy_did_you_mean(spark, small_index):
    """max_edits>0 = the did-you-mean path: misspelling suggests the
    real high-df term first."""
    index_dir, _ = small_index
    ls = LocalSearcher(index_dir)
    got = ls.suggest_terms("tha", size=3, max_edits=1)
    assert got and got[0][0] == "the"


def test_more_like_this_parity(spark, small_index, small_oracle):
    """MLT term selection (tf-idf, df floor, deterministic ties) +
    scoring parity: distributed == serving == oracle OR over the
    selected terms."""
    index_dir, _ = small_index
    oracle, _ = small_oracle
    like = " ".join(oracle.doc_tokens[3])
    s = IndexSearcher(spark, index_dir)
    sel = s._mlt_terms(like, 8, 1, 2)
    assert 0 < len(sel) <= 8
    # every selected term passes the df floor; ranking is tf*idf
    for t in sel:
        assert oracle.df(t) >= 2
    expected = oracle.topk(sel, "OR", 15)
    got = [
        (r["doc_id"], r["score"])
        for r in s.more_like_this(like, k=15, max_query_terms=8).collect()
    ]
    assert got == expected
    assert got[0][0] == 3  # the source doc ranks itself first
    assert (
        LocalSearcher(index_dir).more_like_this(like, k=15, max_query_terms=8)
        == expected
    )


def test_min_should_match(spark, small_index, small_oracle):
    """msm=2 of 3 OR terms: docs with >=2 matches, disjunctive scores;
    msm=1 == plain OR; msm=n == AND; parity across searchers."""
    index_dir, _ = small_index
    oracle, _ = small_oracle
    terms = ["the", "of", "term0042"]
    full = dict(oracle.topk(terms, "OR", 10_000))
    counts = {
        d: sum(1 for t in terms if t in tk)
        for d, tk in oracle.doc_tokens.items()
    }
    expected = sorted(
        ((d, s) for d, s in full.items() if counts[d] >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    ls = LocalSearcher(index_dir)
    assert ls.search(terms, "OR", 15, min_should_match=2) == expected
    s = IndexSearcher(spark, index_dir)
    got = [
        (r["doc_id"], r["score"])
        for r in s.search(terms, "OR", 15, min_should_match=2).collect()
    ]
    assert got == expected
    # boundary identities
    assert ls.search(terms, "OR", 15, min_should_match=1) == ls.search(
        terms, "OR", 15
    )
    assert ls.search(terms, "OR", 15, min_should_match=3) == ls.search(
        terms, "AND", 15
    )
    with pytest.raises(ValueError, match="OR"):
        ls.search(terms, "AND", 5, min_should_match=2)


def test_significant_text_parity(spark, small_index, small_pages_pdf):
    """ES significant_text: sampled-hit text re-analysis vs global df,
    distributed == serving, lift math verified brute-force."""
    from hail_elasticsearch_pipelines_spark.functions.extract import (
        py_extract_text,
    )
    from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    index_dir, _m = small_index
    # doc_id -> text, same dedupe + dense url-order ids as the build
    pdf = small_pages_pdf.sort_values("warc_ts").drop_duplicates("url", keep="last")
    pdf = pdf.sort_values("url").reset_index(drop=True)
    texts = {
        i: (r["text"] if r["text"] is not None else py_extract_text(r["html"]))
        for i, r in pdf.iterrows()
    }
    s, L = IndexSearcher(spark, index_dir), LocalSearcher(index_dir)
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    d = [tuple(r) for r in s.significant_text(docs, ["term0042", "the"], size=8, sample_size=25).collect()]
    loc = L.significant_text(texts, ["term0042", "the"], size=8, sample_size=25)
    assert d == loc and len(d) == 8
    # lift math: fg over the sample, bg from the corpus
    from collections import Counter

    from hail_elasticsearch_pipelines_spark.functions.tokenize import py_tokenize

    ids = [i for i, _sc in L.search(["term0042", "the"], mode="OR", k=25)]
    fg = Counter()
    for i in ids:
        fg.update(set(py_tokenize(texts[i])))
    bg = Counter()
    for t in texts.values():
        bg.update(set(py_tokenize(t)))
    for term, fg_c, bg_c, lift in d:
        assert fg_c == fg[term] and bg_c == bg[term] and fg_c >= 3
        assert lift == (fg_c / len(ids)) / (bg_c / len(texts))
    lifts = [r[3] for r in d]
    assert lifts == sorted(lifts, reverse=True)
    # BOOL query shape works too
    b = L.significant_text(texts, "term0042 OR the", size=5, sample_size=25)
    assert b == loc[:5]
