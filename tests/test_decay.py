"""function_score decay scoring (gauss/exp/linear) over doc-value
fields, plus the missing agg and composite terms agg twins.

Reference analog: seqr boosts/sorts on exported ES date and numeric
fields (mapping derivation hail_scripts/v02/utils/
elasticsearch_utils.py:38-77)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.docvalues import (
    DocValueError,
    check_decay,
    decay_factors,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

Q = ["term0020", "term0025", "the"]


@pytest.fixture(scope="module")
def searchers(spark, small_index):
    out, _m = small_index
    return IndexSearcher(spark, out), LocalSearcher(out)


def test_decay_factor_math():
    v = np.array([0.0, 10.0, 20.0, 35.0], dtype=np.float64)
    for fn in ("gauss", "exp", "linear"):
        f = decay_factors(v, 10.0, 10.0, 0.5, 0.0, fn)
        assert f[1] == 1.0  # at origin
        # at distance == scale the factor IS the decay parameter
        assert math.isclose(f[0], 0.5, rel_tol=1e-12)
        assert math.isclose(f[2], 0.5, rel_tol=1e-12)
        assert f[3] < 0.5  # beyond scale keeps decaying
        assert np.all((0.0 <= f) & (f <= 1.0))
    # linear hits exactly 0 past s = scale/(1-decay)
    lin = decay_factors(np.array([1000.0]), 10.0, 10.0, 0.5, 0.0, "linear")
    assert lin[0] == 0.0
    # offset: flat top of width 2*offset around the origin
    off = decay_factors(np.array([12.0, 8.0]), 10.0, 10.0, 0.5, 5.0, "gauss")
    assert off[0] == 1.0 and off[1] == 1.0


def test_check_decay_validation():
    with pytest.raises(DocValueError):
        check_decay("cosine", 1.0, 0.5, 0.0)
    with pytest.raises(DocValueError):
        check_decay("gauss", 0.0, 0.5, 0.0)
    for bad_decay in (0.0, 1.0, 1.5):
        with pytest.raises(DocValueError):
            check_decay("gauss", 1.0, bad_decay, 0.0)
    with pytest.raises(DocValueError):
        check_decay("gauss", 1.0, 0.5, -1.0)


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_numeric_decay_parity(searchers, fn):
    s, L = searchers
    d = [
        (r.doc_id, r.score)
        for r in s.search_decay(Q, "doc_len", origin=100, scale=50.0, fn=fn, k=12).collect()
    ]
    loc = L.search_decay(Q, "doc_len", origin=100, scale=50.0, fn=fn, k=12)
    assert d == loc and len(d) == 12
    scores = [sc for _i, sc in d]
    assert scores == sorted(scores, reverse=True)


def test_timestamp_decay_parity_and_reranking(searchers):
    s, L = searchers
    origin = "2025-01-20 00:00:00"
    d = [
        (r.doc_id, r.score)
        for r in s.search_decay(
            Q, "warc_ts", origin=origin, scale=2 * 86400.0, k=15
        ).collect()
    ]
    loc = L.search_decay(Q, "warc_ts", origin=origin, scale=2 * 86400.0, k=15)
    assert d == loc and len(d) == 15
    # every decayed score is <= its raw BM25 twin (factor in [0,1])
    raw = dict(L.search(sorted(set(Q)), mode="OR", k=L.n_docs, algo="exhaustive"))
    for i, sc in d:
        assert sc <= raw[i] + 1e-12
    # and the decay actually rearranged the ranking (non-vacuous)
    top_raw = [i for i, _ in sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))][:15]
    assert [i for i, _ in d] != top_raw


def test_and_mode_decay(searchers):
    s, L = searchers
    d = [
        (r.doc_id, r.score)
        for r in s.search_decay(
            ["the", "of"], "doc_len", origin=80, scale=40.0, mode="AND", k=10
        ).collect()
    ]
    assert d == L.search_decay(
        ["the", "of"], "doc_len", origin=80, scale=40.0, mode="AND", k=10
    )


def test_decay_missing_field_keeps_raw_score(spark, tmp_path_factory):
    """ES decay semantics: docs without the field score with factor 1.0
    — they are reweighted to the top when present docs decay hard."""
    import pyspark.sql.functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        build_index,
    )
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(100))
    pdf["rank_v"] = [None if i % 3 == 0 else float((i * 7) % 90) for i in range(len(pdf))]
    out = str(tmp_path_factory.mktemp("decay_null") / "idx")
    pages = spark.createDataFrame(pdf).withColumn(
        "rank_v", F.col("rank_v").cast("double")
    )
    build_index(spark, pages, out, docs_per_part=16, seg_group=2, n_term_buckets=8)
    s, L = IndexSearcher(spark, out), LocalSearcher(out)
    # a brutal decay: anything with a value collapses toward 0
    d = [
        (r.doc_id, r.score)
        for r in s.search_decay(
            ["the"], "rank_v", origin=-1e6, scale=1.0, decay=1e-6, k=20
        ).collect()
    ]
    loc = L.search_decay(["the"], "rank_v", origin=-1e6, scale=1.0, decay=1e-6, k=20)
    assert d == loc
    raw = dict(L.search(["the"], mode="OR", k=L.n_docs, algo="exhaustive"))
    present, _ = L._dv_lookup("rank_v", np.array(sorted(raw), np.int64))
    null_ids = set(np.array(sorted(raw), np.int64)[~present].tolist())
    # the survivors at the top are exactly missing-field docs at raw score
    for i, sc in d:
        if i in null_ids:
            assert sc == raw[i]


def test_missing_and_value_terms_parity(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        build_index,
    )
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(100))
    pdf["grp"] = [None if i % 5 == 0 else f"g{(i * 3) % 7}" for i in range(len(pdf))]
    out = str(tmp_path_factory.mktemp("missing") / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), out,
        docs_per_part=16, seg_group=2, n_term_buckets=8,
    )
    s, L = IndexSearcher(spark, out), LocalSearcher(out)
    md = s.search_missing(["the"], "grp").collect()[0].missing_count
    ml = L.search_missing(["the"], "grp")
    assert md == ml and 0 < md < len(L.matched_ids(["the"]))
    # match_all missing + present == n_live
    tot = s.search_missing(None, "grp").collect()[0].missing_count
    present = len(L._docvalues("grp")[0])
    assert tot + present == len(L.matched_ids(None))
    # composite paging: pages are disjoint, ordered, and exhaustive
    p1 = L.search_value_terms(["the"], "grp", size=3)
    p2 = L.search_value_terms(["the"], "grp", size=3, after=p1[-1][0])
    p3 = L.search_value_terms(["the"], "grp", size=3, after=p2[-1][0])
    got = p1 + p2 + p3
    vals = [v for v, _c in got]
    assert vals == sorted(vals) and len(set(vals)) == len(vals)
    d1 = [(r.value, r.doc_count) for r in s.search_value_terms(["the"], "grp", size=3).collect()]
    d2 = [
        (r.value, r.doc_count)
        for r in s.search_value_terms(["the"], "grp", size=3, after=d1[-1][0]).collect()
    ]
    assert d1 == p1 and d2 == p2
    # exhaustive: one big page == all distinct values of matched docs
    allp = L.search_value_terms(["the"], "grp", size=1000)
    ids = np.sort(L.matched_ids(["the"]))
    v, c = np.unique(L._dv_lookup("grp", ids)[1], return_counts=True)
    assert allp == list(zip(v.tolist(), [int(x) for x in c]))


def test_bool_decay_parity(spark, small_index):
    """Decay over a boolean query (range filter + boost + facet all
    composing) — the filtered-recency-boost shape."""
    out, _m = small_index
    s = IndexSearcher(spark, out)
    L = LocalSearcher(out)
    kw = dict(origin="2025-01-20 00:00:00", scale=2 * 86400.0, k=12, mode="BOOL")
    for q in (
        "the AND doc_len:[50 TO 400]",
        "term0020^2 OR term0025",
        "the AND NOT term0030 AND _exists_:doc_len",
    ):
        d = [(r.doc_id, r.score) for r in s.search_decay(q, "warc_ts", **kw).collect()]
        loc = L.search_decay(q, "warc_ts", **kw)
        assert d == loc and d, q
    # factor semantics: decayed <= raw bool score, equal iff factor 1
    q = "the AND doc_len:[50 TO 400]"
    raw = dict(L.search_bool(q, k=10_000))
    for i, sc in L.search_decay(q, "warc_ts", **kw):
        assert sc <= raw[i] + 1e-12


# --- function_score: field_value_factor + random_score ----------------------


def test_fvf_parity_and_semantics(searchers):
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        fvf_factor_values,
        search_field_value_factor,
    )

    s, L = searchers
    for modifier in ("none", "log1p", "sqrt"):
        d = [
            (r.doc_id, r.score)
            for r in search_field_value_factor(
                s, Q, "doc_len", factor=0.1, modifier=modifier, k=12
            ).collect()
        ]
        loc = L.search_field_value_factor(
            Q, "doc_len", factor=0.1, modifier=modifier, k=12
        )
        assert d == loc and d, modifier
    # brute force: plain exhaustive × modifier(factor·dl)
    plain = L.search(sorted(set(Q)), mode="OR", k=L.n_docs, algo="exhaustive")
    docs = np.array([x for x, _ in plain], np.int64)
    present, vals = L._dv_lookup("doc_len", docs)
    assert present.all()
    fac = fvf_factor_values(vals.astype(np.float64), 0.1, "log1p")
    expected = sorted(
        zip(docs.tolist(), (np.array([sc for _, sc in plain]) * fac).tolist()),
        key=lambda t: (-t[1], t[0]),
    )[:12]
    got = L.search_field_value_factor(Q, "doc_len", factor=0.1, k=12)
    assert got == expected


def test_fvf_rejects_bad_shapes(searchers):
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        search_field_value_factor,
    )

    s, L = searchers
    with pytest.raises(DocValueError):
        search_field_value_factor(s, Q, "warc_ts")  # timestamp field
    with pytest.raises(DocValueError):
        L.search_field_value_factor(Q, "warc_ts")
    with pytest.raises(DocValueError):
        search_field_value_factor(s, Q, "doc_len", modifier="cube")
    with pytest.raises(DocValueError):
        L.search_field_value_factor(Q, "doc_len", modifier="cube")


def test_random_score_parity_and_determinism(searchers):
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        random_score_values,
        search_random_score,
    )

    s, L = searchers
    d7 = [
        (r.doc_id, r.score)
        for r in search_random_score(s, Q, seed=7, k=15).collect()
    ]
    loc7 = L.search_random_score(Q, seed=7, k=15)
    assert d7 == loc7 and d7
    # same seed twice = identical; different seed = different ranking
    assert L.search_random_score(Q, seed=7, k=15) == loc7
    loc8 = L.search_random_score(Q, seed=8, k=15)
    assert [x for x, _ in loc8] != [x for x, _ in loc7]
    # factor in [0, 1): scores never exceed the plain exhaustive score
    plain = dict(L.search(sorted(set(Q)), mode="OR", k=L.n_docs, algo="exhaustive"))
    for doc, sc in loc7:
        assert 0.0 <= sc <= plain[doc]
    # the pinned hash itself is stable
    v = random_score_values(np.array([0, 1, 2**40], np.int64), 7)
    assert np.all((0.0 <= v) & (v < 1.0))
    assert random_score_values(np.array([0, 1, 2**40], np.int64), 7).tolist() == v.tolist()
