"""Hybrid retrieval: RRF fusion of BM25 + vector rankings, and the ES
pinned query (operators/hybrid.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.hybrid import (
    hybrid_rrf_search,
    rrf_fuse,
    search_pinned,
)

Q = ["the", "term0042"]


def test_rrf_fuse_math():
    fused = rrf_fuse([[1, 2, 3], [3, 4]], k=10, rank_constant=60)
    s = dict(fused)
    assert s[3] == pytest.approx(1 / 63 + 1 / 61)
    assert s[1] == pytest.approx(1 / 61)
    assert s[4] == pytest.approx(1 / 62)
    # doc in both lists outranks single-list docs here
    assert fused[0][0] == 3
    # ties break by id: two docs with identical single ranks
    tie = rrf_fuse([[5], [9]], k=10)
    assert [d for d, _ in tie] == [5, 9]
    with pytest.raises(ValueError):
        rrf_fuse([[1]], rank_constant=0)


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index[0])


@pytest.fixture(scope="module")
def emb(spark, searcher):
    """Embeddings keyed by the index's doc ids: doc 0's vector is the
    query direction; ids 0..29 get progressively farther vectors."""
    rng = np.random.default_rng(5)
    n = searcher.n_docs
    base = rng.standard_normal(8)
    rows = []
    for i in range(n):
        noise = rng.standard_normal(8) * (0.1 + 0.05 * i)
        rows.append((i, [float(x) for x in (base + noise)]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base,
    )


def test_hybrid_rrf_parity_with_manual_fusion(spark, searcher, emb):
    from hail_elasticsearch_pipelines_spark.operators.similarity import (
        cosine_topk,
    )

    emb_df, base = emb
    qv = [float(x) for x in base]
    got = [
        (r.doc_id, r.score)
        for r in hybrid_rrf_search(
            searcher, Q, emb_df, qv, k=10, window=25
        ).collect()
    ]
    bm = [int(r["doc_id"]) for r in searcher.search(Q, "OR", k=25).collect()]
    vs = [int(r["id"]) for r in cosine_topk(emb_df, qv, k=25).collect()]
    assert got == rrf_fuse([bm, vs], k=10)
    # docs found by BOTH legs dominate the fused head
    both = set(bm) & set(vs)
    if both:
        assert got[0][0] in both or got[0][1] > 1 / 61


def test_pinned_query_semantics(spark, searcher):
    organic = [int(r["doc_id"]) for r in searcher.search(Q, "OR", k=12).collect()]
    pins = [organic[3], 999999, organic[0], organic[3]]  # dup + nonexistent
    got = [
        (r.doc_id, r.rank, r.pinned)
        for r in search_pinned(searcher, pins, Q, k=10).collect()
    ]
    # live pins first, in order, dups dropped, dead id skipped
    assert got[0] == (organic[3], 1, True)
    assert got[1] == (organic[0], 2, True)
    # organic continues without the pinned docs
    rest = [d for d, _r, p in got if not p]
    assert rest == [d for d in organic if d not in (organic[3], organic[0])][: len(rest)]
    assert [r for _d, r, _p in got] == list(range(1, len(got) + 1))
    assert len(got) == 10
    with pytest.raises(ValueError):
        search_pinned(searcher, [], Q)


def test_live_doc_ids_respects_tombstones(spark, small_index, tmp_path):
    import shutil

    from hail_elasticsearch_pipelines_spark.plans.maintenance import (
        delete_by_query,
    )

    work = str(tmp_path / "idx")
    shutil.copytree(small_index[0], work)
    s = IndexSearcher(spark, work)
    victims = [int(r["doc_id"]) for r in s.search(["term0042"], "OR", k=3).collect()]
    assert s.live_doc_ids(victims + [10**9]) == set(victims)
    delete_by_query(spark, work, ["term0042"], mode="OR")
    s2 = IndexSearcher(spark, work)
    assert s2.live_doc_ids(victims) == set()


def test_mget_request_order_and_found(spark, small_index, tmp_path):
    import shutil

    from hail_elasticsearch_pipelines_spark.plans.maintenance import (
        delete_by_query,
    )

    work = str(tmp_path / "idx_mget")
    shutil.copytree(small_index[0], work)
    s = IndexSearcher(spark, work)
    victims = [int(r["doc_id"]) for r in s.search(["term0042"], "OR", k=2).collect()]
    ids = [5, victims[0], 10**9, 0]
    got = s.mget(ids).collect()
    assert [r["doc_id"] for r in got] == ids  # request order, dups deduped
    assert [r["found"] for r in got] == [True, True, False, True]
    assert got[2]["url"] is None and got[0]["url"] is not None
    # tombstoned docs report found=false with NULL fields
    delete_by_query(spark, work, ["term0042"], mode="OR")
    s2 = IndexSearcher(spark, work)
    got2 = s2.mget(ids).collect()
    assert [r["found"] for r in got2] == [5 not in victims, False, False, True]
    assert got2[1]["url"] is None
    with pytest.raises(ValueError):
        s.mget([])
