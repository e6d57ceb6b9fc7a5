"""ES pipeline aggregations over histogram parents: derivative,
moving average, serial_diff, bucket_selector, bucket_sort, and the
sibling max/min/avg/sum_bucket family (docvalues.histogram_pipeline /
bucket_stat + the LocalSearcher twins).

Reference analog: seqr dashboards aggregate the ES export by date
field and post-process bucket series client-side
(hail_scripts/v02/utils/elasticsearch_client.py:106-177); ES exposes
these as pipeline aggregations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.docvalues import (
    DocValueError,
    bucket_stat,
    histogram_pipeline,
)
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

Q = ["term0020", "term0025"]


@pytest.fixture(scope="module")
def searchers(spark, small_index):
    out, _m = small_index
    return IndexSearcher(spark, out), LocalSearcher(out)


def _ts(v):
    return pd.Timestamp(v).to_pydatetime()


def _base(searchers):
    s, _L = searchers
    return [
        (r.bucket, r.doc_count)
        for r in histogram_pipeline(s, Q, "warc_ts", "hour").collect()
    ]


def test_plain_pipeline_matches_histogram(searchers):
    s, _L = searchers
    plain = [
        (r.bucket, r.doc_count)
        for r in s.search_value_histogram(Q, "warc_ts", "hour").collect()
    ]
    assert _base(searchers) == plain and len(plain) >= 3


def test_derivative_and_cumulative_parity(searchers):
    s, L = searchers
    dist = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "warc_ts", "hour", cumulative=True, derivative=True
        ).collect()
    ]
    loc = [
        (_ts(b), n, cum, d)
        for b, n, cum, d in L.histogram_pipeline(
            Q, "warc_ts", "hour", cumulative=True, derivative=True
        )
    ]
    assert dist == loc
    # derivative: NULL first bucket, then exact diffs; cum: running total
    counts = [n for _b, n, _c, _d in dist]
    assert dist[0][3] is None
    for i in range(1, len(dist)):
        assert dist[i][3] == float(counts[i] - counts[i - 1])
    assert [c for _b, _n, c, _d in dist] == list(np.cumsum(counts))


def test_moving_avg_and_serial_diff_parity(searchers):
    s, L = searchers
    dist = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "warc_ts", "hour", moving_avg=3, serial_diff=2
        ).collect()
    ]
    loc = [
        (_ts(b), n, m, sd)
        for b, n, m, sd in L.histogram_pipeline(
            Q, "warc_ts", "hour", moving_avg=3, serial_diff=2
        )
    ]
    assert dist == loc
    counts = [n for _b, n, _m, _s in dist]
    for i, (_b, _n, m, sd) in enumerate(dist):
        lo = max(0, i - 2)
        assert m == pytest.approx(sum(counts[lo : i + 1]) / (i + 1 - lo))
        if i < 2:
            assert sd is None
        else:
            assert sd == float(counts[i] - counts[i - 2])


def test_bucket_selector_after_derivative(searchers):
    """min_doc_count prunes buckets AFTER the pipeline metrics: the
    survivors keep the derivative they had against their true (possibly
    pruned) neighbour."""
    s, L = searchers
    full = [
        tuple(r)
        for r in histogram_pipeline(s, Q, "warc_ts", "hour", derivative=True).collect()
    ]
    cut = min(n for _b, n, _d in full) + 1
    sel = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "warc_ts", "hour", derivative=True, min_doc_count=cut
        ).collect()
    ]
    assert sel == [r for r in full if r[1] >= cut] and len(sel) < len(full)
    loc = [
        (_ts(b), n, d)
        for b, n, d in L.histogram_pipeline(
            Q, "warc_ts", "hour", derivative=True, min_doc_count=cut
        )
    ]
    assert sel == loc


def test_bucket_sort_and_size(searchers):
    s, L = searchers
    dist = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "warc_ts", "hour", sort_by=("doc_count", "desc"), size=3
        ).collect()
    ]
    loc = [
        (_ts(b), n)
        for b, n in L.histogram_pipeline(
            Q, "warc_ts", "hour", sort_by=("doc_count", "desc"), size=3
        )
    ]
    assert dist == loc and len(dist) == 3
    counts = [n for _b, n in dist]
    assert counts == sorted(counts, reverse=True)
    # ties broken by bucket ascending
    for (b1, n1), (b2, n2) in zip(dist, dist[1:]):
        if n1 == n2:
            assert b1 < b2


def test_numeric_histogram_pipeline(searchers):
    s, L = searchers
    dist = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "doc_len", 100, derivative=True
        ).collect()
    ]
    loc = L.histogram_pipeline(Q, "doc_len", 100, derivative=True)
    assert dist == [tuple(r) for r in loc] and dist


def test_bucket_stat_parity_and_semantics(searchers):
    s, L = searchers
    hist = dict(
        (r.bucket, r.doc_count)
        for r in s.search_value_histogram(Q, "warc_ts", "hour").collect()
    )
    for stat in ("max", "min"):
        dist = [tuple(r) for r in bucket_stat(s, Q, "warc_ts", "hour", stat).collect()]
        loc = [(_ts(b), v) for b, v in L.bucket_stat(Q, "warc_ts", "hour", stat)]
        assert dist == loc
        ext = max(hist.values()) if stat == "max" else min(hist.values())
        assert dist == sorted(
            [(b, float(n)) for b, n in hist.items() if n == ext]
        )
    for stat, expect in (
        ("sum", float(sum(hist.values()))),
        ("avg", sum(hist.values()) / len(hist)),
    ):
        dist = [tuple(r) for r in bucket_stat(s, Q, "warc_ts", "hour", stat).collect()]
        loc = L.bucket_stat(Q, "warc_ts", "hour", stat)
        assert len(dist) == 1 and dist[0][0] is None
        assert dist[0][1] == pytest.approx(expect)
        assert loc[0][0] is None and loc[0][1] == pytest.approx(expect)


def test_pipeline_rejects_bad_args(searchers):
    s, L = searchers
    with pytest.raises(DocValueError):
        histogram_pipeline(s, Q, "warc_ts", "hour", moving_avg=0).collect()
    with pytest.raises(DocValueError):
        histogram_pipeline(s, Q, "warc_ts", "hour", sort_by=("nope", "asc"))
    with pytest.raises(DocValueError):
        histogram_pipeline(s, Q, "warc_ts", "hour", sort_by=("bucket", "down"))
    with pytest.raises(DocValueError):
        L.histogram_pipeline(Q, "warc_ts", "hour", serial_diff=-1)
    with pytest.raises(DocValueError):
        bucket_stat(s, Q, "warc_ts", "hour", "median")
    with pytest.raises(DocValueError):
        L.bucket_stat(Q, "warc_ts", "hour", "median")


def test_dense_buckets_fill_gaps(searchers):
    """dense=True (ES min_doc_count: 0): the bucket spine is gap-free
    from min to max, zero-count buckets included, so derivatives diff
    ADJACENT calendar steps."""
    s, L = searchers
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        histogram_pipeline,
    )

    sparse = [
        tuple(r)
        for r in histogram_pipeline(s, Q, "warc_ts", "hour").collect()
    ]
    dense = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "warc_ts", "hour", dense=True, derivative=True
        ).collect()
    ]
    loc = [
        (_ts(b), n, d)
        for b, n, d in L.histogram_pipeline(
            Q, "warc_ts", "hour", dense=True, derivative=True
        )
    ]
    assert dense == loc
    # spine is hourly-contiguous and covers [min, max]
    bks = [b for b, _n, _d in dense]
    assert bks[0] == sparse[0][0] and bks[-1] == sparse[-1][0]
    for b1, b2 in zip(bks, bks[1:]):
        assert (b2 - b1).total_seconds() == 3600
    assert len(dense) >= len(sparse)
    # zero-filled buckets exist iff the sparse series had gaps
    zeros = [b for b, n, _d in dense if n == 0]
    assert (len(dense) > len(sparse)) == bool(zeros)
    # counts agree with the sparse series on present buckets
    sp = dict((b, n) for b, n, *_ in sparse)
    for b, n, _d in dense:
        assert n == sp.get(b, 0)


def test_dense_numeric_buckets(searchers):
    s, L = searchers
    from hail_elasticsearch_pipelines_spark.operators.docvalues import (
        histogram_pipeline,
    )

    dist = [
        tuple(r)
        for r in histogram_pipeline(
            s, Q, "doc_len", 100, dense=True, cumulative=True
        ).collect()
    ]
    loc = L.histogram_pipeline(Q, "doc_len", 100, dense=True, cumulative=True)
    assert dist == [tuple(r) for r in loc] and dist
    bks = [b for b, *_ in dist]
    assert bks == list(range(bks[0], bks[-1] + 1, 100))
