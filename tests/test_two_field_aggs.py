"""weighted_avg + matrix_stats aggregations (two-field metrics,
operators/docvalues.py + LocalSearcher twins)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.docvalues import (
    DocValueError,
    search_matrix_stats,
    search_weighted_avg,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

Q = ["the", "term0020"]


@pytest.fixture(scope="module")
def two_field_index(spark, tmp_path_factory):
    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        build_index,
    )
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    out = str(tmp_path_factory.mktemp("twofield") / "idx")
    h = F.crc32(F.col("url"))
    pages = (
        spark.createDataFrame(gen_pages_pdf(np.arange(200)))
        .withColumn(
            "stars",
            F.when(h % 4 == 0, F.lit(None)).otherwise(h % 50).cast("long"),
        )
        .withColumn(
            "views",
            F.when(h % 5 == 0, F.lit(None)).otherwise(h % 900 + 1).cast("long"),
        )
    )
    build_index(spark, pages, out, docs_per_part=32, seg_group=2, n_term_buckets=8)
    return out


def _expected(L, q, f1, f2):
    ids = np.sort(L.matched_ids(q, "OR"))
    p1, v1 = L._dv_lookup(f1, ids)
    p2, v2 = L._dv_lookup(f2, ids)
    a = np.zeros(len(ids))
    b = np.zeros(len(ids))
    a[p1] = v1.astype(float)
    b[p2] = v2.astype(float)
    m = p1 & p2
    return a[m], b[m]


def test_weighted_avg_parity_and_missing_skip(spark, two_field_index):
    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    row = search_weighted_avg(s, Q, "stars", "views").collect()[0]
    loc = L.search_weighted_avg(Q, "stars", "views")
    assert (row.n, row.weight_sum, row.wavg) == loc
    v, w = _expected(L, Q, "stars", "views")
    assert row.n == v.size and v.size < len(L.matched_ids(Q, "OR"))
    assert row.weight_sum == float(w.sum())
    assert row.wavg == pytest.approx(float((v * w).sum()) / float(w.sum()), rel=1e-12)


def test_matrix_stats_parity_and_math(spark, two_field_index):
    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    row = search_matrix_stats(s, Q, "stars", "views").collect()[0]
    loc = L.search_matrix_stats(Q, "stars", "views")
    assert tuple(row) == loc
    x, y = _expected(L, Q, "stars", "views")
    assert row.n == x.size
    assert row.mean_x == pytest.approx(x.mean(), rel=1e-12)
    assert row.var_y == pytest.approx(y.var(), rel=1e-9)
    cov = (x * y).mean() - x.mean() * y.mean()
    assert row.cov == pytest.approx(cov, rel=1e-9)
    assert row.corr == pytest.approx(
        cov / math.sqrt(x.var() * y.var()), rel=1e-9
    )
    assert -1.0 <= row.corr <= 1.0


def test_two_field_rejects_bad_fields(spark, two_field_index):
    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    with pytest.raises(DocValueError):
        search_weighted_avg(s, Q, "stars", "warc_ts")
    with pytest.raises(DocValueError):
        L.search_weighted_avg(Q, "stars", "warc_ts")
    with pytest.raises(DocValueError):
        search_matrix_stats(s, Q, "warc_ts", "views")
    with pytest.raises(DocValueError):
        L.search_matrix_stats(Q, "nope", "views")


def test_multi_terms_parity_and_semantics(spark, two_field_index):
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        search_multi_terms,
    )

    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    dist = [
        tuple(r)
        for r in search_multi_terms(s, Q, ["lang", "stars"], size=8).collect()
    ]
    loc = [
        (a, int(b), int(c)) for a, b, c in L.search_multi_terms(Q, ["lang", "stars"], size=8)
    ]
    assert [(a, int(b), int(c)) for a, b, c in dist] == loc and dist
    # counts descend; ties break by keys ascending
    counts = [c for *_k, c in dist]
    assert counts == sorted(counts, reverse=True)
    # docs with NULL stars are excluded: total bucketed docs < matches
    total = sum(counts_all for *_x, counts_all in search_multi_terms(
        s, Q, ["lang", "stars"], size=10_000).collect())
    assert total < len(L.matched_ids(Q, "OR"))
    with pytest.raises(DocValueError):
        search_multi_terms(s, Q, ["stars"])
    with pytest.raises(DocValueError):
        L.search_multi_terms(Q, ["stars"])


def test_top_metrics_parity(spark, two_field_index):
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        search_top_metrics,
    )

    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    dist = [
        tuple(r)
        for r in search_top_metrics(
            s, Q, "views", ["stars", "doc_len"], size=4
        ).collect()
    ]
    loc = [
        (d, int(v), None if st is None else int(st), int(dl))
        for d, v, st, dl in L.search_top_metrics(
            Q, "views", ["stars", "doc_len"], size=4
        )
    ]
    norm = [
        (d, int(v), None if st is None else int(st), int(dl))
        for d, v, st, dl in dist
    ]
    assert norm == loc and len(norm) == 4
    views = [v for _d, v, _s, _l in norm]
    assert views == sorted(views, reverse=True)


def test_terms_set_parity_and_semantics(spark, two_field_index):
    """terms_set: per-doc required count from the stars field (clamped
    >= 1); docs missing stars never match; survivors score as the
    disjunctive sum."""
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        DocValueError,
        search_terms_set,
    )

    s, L = IndexSearcher(spark, two_field_index), LocalSearcher(two_field_index)
    terms = ["the", "of", "term0042"]
    # small requirement field: stars % 4 isn't storable — use stars
    # directly with tiny values via a threshold query instead: build a
    # parity check against brute force over the exhaustive union
    dist = [
        (r.doc_id, r.score)
        for r in search_terms_set(s, terms, "stars", k=300).collect()
    ]
    loc = L.search_terms_set(terms, "stars", k=300)
    assert dist == loc
    # brute force: nmatch >= max(stars, 1), missing stars excluded
    full = L.search(sorted(set(terms)), "OR", k=L.n_docs, algo="exhaustive")
    docs = np.array([d for d, _ in full], np.int64)
    order = np.argsort(docs)
    docs_sorted = docs[order]
    present, stars = L._dv_lookup("stars", docs_sorted)
    nmatch = np.zeros(len(docs_sorted), np.int64)
    for t in set(terms):
        ids = {d for d, _ in L.search([t], "OR", k=L.n_docs, algo="exhaustive")}
        nmatch += np.isin(docs_sorted, sorted(ids))
    need = np.maximum(stars.astype(float), 1.0)
    keep = present.copy()
    keep[present] &= nmatch[present] >= need
    expected_ids = set(docs_sorted[keep].tolist())
    assert {d for d, _ in dist} == expected_ids
    # scores equal the plain OR scores for the survivors
    plain = dict(full)
    for d, sc in dist:
        assert sc == plain[d]
    with pytest.raises(DocValueError):
        search_terms_set(s, terms, "warc_ts").collect()
    with pytest.raises(DocValueError):
        L.search_terms_set(terms, "warc_ts")
