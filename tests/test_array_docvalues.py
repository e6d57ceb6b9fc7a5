"""Multi-valued (array) doc-value fields — the ES keyword-array shape
(tags/categories).  Supported: terms/composite aggs, cardinality,
significant_terms, missing, _exists_.  Single-value-semantics ops
(sorts, ranges, numeric aggs, collapse, decay) reject arrays loudly."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.docvalues import DocValueError
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


@pytest.fixture(scope="module")
def tag_index(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(150))
    out = str(tmp_path_factory.mktemp("tags") / "idx")
    h = F.crc32(F.col("url"))
    pages = spark.createDataFrame(pdf).withColumn(
        "tags",
        F.when(h % 5 == 0, F.array().cast("array<string>"))
        .when(h % 5 == 1, F.lit(None).cast("array<string>"))
        .otherwise(
            F.array(
                F.concat(F.lit("t"), (h % 4).cast("string")),
                F.concat(F.lit("t"), (h % 7).cast("string")),
                # duplicate within one doc: terms agg must count it once
                F.concat(F.lit("t"), (h % 4).cast("string")),
            )
        ),
    )
    build_index(spark, pages, out, docs_per_part=16, seg_group=2, n_term_buckets=8)
    return out


@pytest.fixture(scope="module")
def searchers(spark, tag_index):
    return IndexSearcher(spark, tag_index), LocalSearcher(tag_index)


def test_terms_agg_counts_docs_once_per_distinct_value(searchers):
    s, L = searchers
    d = [(r.value, r.doc_count) for r in s.search_value_terms(["the"], "tags", size=50).collect()]
    loc = L.search_value_terms(["the"], "tags", size=50)
    assert d == loc and d
    # brute force: per-doc distinct tags of matched docs
    ids = np.sort(L.matched_ids(["the"]))
    present, vals = L._dv_lookup("tags", ids, allow_array=True)
    from collections import Counter

    want = Counter()
    for arr in vals:
        for t in set(arr.tolist()):
            want[t] += 1
    assert dict(d) == dict(want)
    # after-key paging works on the exploded values
    p1 = L.search_value_terms(["the"], "tags", size=2)
    p2 = L.search_value_terms(["the"], "tags", size=2, after=p1[-1][0])
    assert [v for v, _c in p1 + p2] == sorted(dict(d))[:4]


def test_cardinality_sig_terms_missing_exists(searchers):
    s, L = searchers
    assert s.search_cardinality(["the"], "tags").collect()[0][0] == L.search_cardinality(["the"], "tags") > 0
    sg = [tuple(r) for r in s.significant_terms(["the"], "tags", size=5).collect()]
    assert sg == L.significant_terms(["the"], "tags", size=5)
    md = s.search_missing(["the"], "tags").collect()[0][0]
    ml = L.search_missing(["the"], "tags")
    assert md == ml and md > 0  # null AND empty-array docs both missing
    e = sorted(r.doc_id for r in s.matched_ids("the AND _exists_:tags", "BOOL").collect())
    el = sorted(L.matched_ids("the AND _exists_:tags", "BOOL").tolist())
    assert e == el
    assert md + len(e) == len(L.matched_ids(["the"]))
    # exists-filtered BOOL query scores survive unchanged (filter context)
    b = L.search_bool("the AND _exists_:tags", k=20)
    base = dict(L.search(["the"], mode="OR", k=10_000))
    assert all(sc == base[i] for i, sc in b)


def test_scalar_ops_reject_arrays(searchers):
    s, L = searchers
    with pytest.raises(DocValueError, match="multi-valued"):
        s.search_sorted(["the"], "tags", k=3).collect()
    with pytest.raises(DocValueError, match="multi-valued"):
        L.search_sorted(["the"], "tags", k=3)
    with pytest.raises(DocValueError, match="multi-valued"):
        s.search_field_stats(["the"], "tags").collect()
    with pytest.raises(DocValueError, match="multi-valued"):
        L.search_value_histogram(["the"], "tags", 10)
    with pytest.raises(DocValueError, match="multi-valued"):
        s.search_range(["the"], "tags", lo="a", k=3).collect()
    with pytest.raises(DocValueError, match="multi-valued"):
        s.search_decay(["the"], "tags", origin=0, scale=1.0, k=3).collect()
    # bounded range atom in the query language rejects too, both paths
    with pytest.raises(Exception, match="multi-valued"):
        s.search_bool("the AND tags:[a TO z]", k=3).collect()
    with pytest.raises(Exception, match="multi-valued"):
        L.search_bool("the AND tags:[a TO z]", k=3)
