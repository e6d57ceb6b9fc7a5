"""Federated multi-index search (operators/federate.py): ES
query_then_fetch / dfs_query_then_fetch across index generations.

Reference analog: the loaders write datestamped indices and seqr
queries across them (hail_scripts/v02/utils/elasticsearch_client.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.federate import (
    local_search_indices,
    search_indices,
)

Q = ["the", "term0042", "term0020"]


@pytest.fixture(scope="module")
def split_indexes(spark, tmp_path_factory):
    """One full index over 240 docs + the same corpus split into two
    half-indexes (url parity)."""
    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        build_index,
    )
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    root = tmp_path_factory.mktemp("fed")
    pdf = gen_pages_pdf(np.arange(240))
    dirs = {}
    full = str(root / "full")
    build_index(
        spark, spark.createDataFrame(pdf), full,
        docs_per_part=37, seg_group=2, n_term_buckets=8,
    )
    dirs["full"] = full
    parity = pdf["url"].rank(method="dense").astype(int) % 2
    for i in (0, 1):
        out = str(root / f"half{i}")
        build_index(
            spark, spark.createDataFrame(pdf[parity == i]), out,
            docs_per_part=37, seg_group=2, n_term_buckets=8,
        )
        dirs[f"half{i}"] = out
    return dirs


def _urls(index_dir):
    import glob

    import pyarrow.dataset as ds

    from hail_elasticsearch_pipelines_spark.layout import (
        load_manifest,
        table_path,
    )

    m = load_manifest(index_dir)
    tbl = ds.dataset(
        table_path(index_dir, "doclens", m), format="parquet"
    ).to_table(columns=["doc_id", "url"])
    return dict(zip(tbl["doc_id"].to_pylist(), tbl["url"].to_pylist()))


@pytest.mark.parametrize("mode", ["OR", "AND"])
def test_dfs_mode_equals_single_merged_index(spark, split_indexes, mode):
    """dfs_query_then_fetch across the two halves must score every doc
    EXACTLY as the single full index does (combined stats == merged
    stats): same urls, bit-identical scores."""
    halves = [split_indexes["half0"], split_indexes["half1"]]
    full = IndexSearcher(spark, split_indexes["full"])
    expected = [
        (r["doc_id"], r["score"])
        for r in full.search(Q, mode, k=15, algo="exhaustive").collect()
    ]
    full_urls = _urls(split_indexes["full"])
    exp_by_url = [(full_urls[d], s) for d, s in expected]

    got = [
        (r["index_id"], r["doc_id"], r["score"])
        for r in search_indices(spark, halves, Q, mode=mode, k=15).collect()
    ]
    half_urls = [_urls(h) for h in halves]
    got_by_url = [(half_urls[i][d], s) for i, d, s in got]
    assert sorted(got_by_url) == sorted(exp_by_url) and got_by_url
    # local twin bit-identical to the distributed path
    loc = local_search_indices(halves, Q, mode=mode, k=15)
    assert [(i, d, s) for i, d, s in loc] == got


def test_query_then_fetch_uses_local_stats(spark, split_indexes):
    """dfs=False scores with per-index statistics: results still merge
    deterministically, and both engines agree — but scores are NOT the
    merged-index scores (the documented ES relevance skew)."""
    halves = [split_indexes["half0"], split_indexes["half1"]]
    got = [
        tuple(r)
        for r in search_indices(
            spark, halves, Q, mode="OR", k=15, dfs=False
        ).collect()
    ]
    loc = local_search_indices(halves, Q, mode="OR", k=15, dfs=False)
    assert got == loc and got
    dfs_scores = dict(
        ((i, d), s)
        for i, d, s in local_search_indices(halves, Q, mode="OR", k=15)
    )
    qtf_scores = {(i, d): s for i, d, s in got}
    common = set(dfs_scores) & set(qtf_scores)
    assert common and any(
        dfs_scores[key] != qtf_scores[key] for key in common
    )


def test_single_index_degenerates(spark, split_indexes):
    """Federating ONE index must equal searching it directly."""
    full = split_indexes["full"]
    s = IndexSearcher(spark, full)
    direct = [
        (0, r["doc_id"], r["score"])
        for r in s.search(Q, "OR", k=10, algo="exhaustive").collect()
    ]
    fed = [
        tuple(r) for r in search_indices(spark, [full], Q, k=10).collect()
    ]
    assert fed == direct
    assert local_search_indices([full], Q, k=10) == direct


def test_bad_args(spark, split_indexes):
    with pytest.raises(ValueError):
        search_indices(spark, [], Q)
    with pytest.raises(ValueError):
        local_search_indices([], Q)
    with pytest.raises(ValueError):
        search_indices(spark, [split_indexes["full"]], Q, mode="BOOL")
