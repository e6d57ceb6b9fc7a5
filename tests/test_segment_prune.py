"""Cross-segment pruning (r3 verdict item 6): per-segment score bounds
let rare-term queries skip whole segments before reading their posting
blobs (LocalSearcher) or launching their scoring tasks (IndexSearcher
two-phase probe), bit-identically to exhaustive scoring.

Lucene/ES analog: per-segment max scores drive ES's top-level WAND —
the reference gets this from ES for free
(hail_scripts/shared/elasticsearch_client_v7.py:84-99)."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

QUERIES = [
    (["the", "term0042"], "OR"),
    (["term0042", "term0117"], "OR"),
    (["the", "of"], "OR"),
    (["the", "of"], "AND"),
    (["the", "term0042"], "AND"),
]


@pytest.fixture(scope="module")
def many_segments(spark, tmp_path_factory):
    """Small parts + seg_group=1 → ~38 segments, so cross-segment
    pruning has room to act."""
    out = str(tmp_path_factory.mktemp("segs") / "idx")
    build_index(
        spark,
        spark.createDataFrame(gen_pages_pdf(np.arange(600))),
        out,
        docs_per_part=16,
        seg_group=1,
        n_term_buckets=8,
    )
    return out


def test_local_cross_segment_prune_bit_identical(many_segments):
    ls = LocalSearcher(many_segments)
    for terms, mode in QUERIES:
        expected = ls.search(terms, mode, 10, algo="exhaustive")
        got = ls.search(terms, mode, 10, algo="auto")
        assert got == expected, (terms, mode)


def test_local_cross_segment_prune_skips_segments(many_segments):
    """Rare-OR-stopword: the rare term's segments set a high floor; the
    stopword-only segments' bounds fall below it and are skipped
    without reading their blobs."""
    expected = LocalSearcher(many_segments).search(
        ["the", "term0042"], "OR", 10, algo="exhaustive"
    )
    ls = LocalSearcher(many_segments)  # fresh: empty caches
    got = ls.search(["the", "term0042"], "OR", 10, algo="auto")
    assert got == expected
    assert ls.last_segments_skipped > 0
    # decode evidence: the skipped segments' rows were never read, so
    # fewer segments appear in the decoded-postings/block caches than
    # exist in the index
    touched = {seg for (_t, seg) in ls._cache} | {
        seg for (_t, seg) in getattr(ls, "_pos_cache", {})
    }
    n_total_segments = ls.manifest["metrics"]["n_segments"]
    assert len(touched) <= n_total_segments - ls.last_segments_skipped


def test_distributed_two_phase_prune_bit_identical(spark, many_segments):
    s = IndexSearcher(spark, many_segments)
    for terms, mode in QUERIES:
        expected = [
            (r["doc_id"], r["score"])
            for r in s.search(terms, mode, 10, algo="exhaustive").collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in s.search(
                terms, mode, 10, algo="auto", segment_prune=True
            ).collect()
        ]
        assert got == expected, (terms, mode)


def test_distributed_two_phase_prune_skips_tasks(spark, many_segments):
    """Task-count evidence: with segment_prune=True the second-phase
    scoring job receives only surviving segments."""
    s = IndexSearcher(spark, many_segments)
    res = s.search(
        ["the", "term0042"], "OR", 10, algo="auto", segment_prune=True
    )
    got = [(r["doc_id"], r["score"]) for r in res.collect()]
    assert s.last_segments_skipped > 0
    expected = [
        (r["doc_id"], r["score"])
        for r in s.search(["the", "term0042"], "OR", 10).collect()
    ]
    assert got == expected


def test_local_bool_required_conjunct_segment_prune(spark, many_segments):
    """Boolean queries with required conjuncts get the same
    cross-segment treatment: segments missing a required term are
    dropped from metadata, the rest process bound-desc with a floor —
    bit-identical to the distributed bool path."""
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    s = IndexSearcher(spark, many_segments)
    ls = LocalSearcher(many_segments)
    for q in ["term0042 AND the", "the AND (term0042 OR term0117)"]:
        expected = [
            (r["doc_id"], r["score"]) for r in s.search_bool(q, k=10).collect()
        ]
        assert ls.search_bool(q, k=10) == expected, q
    ls2 = LocalSearcher(many_segments)
    ls2.search_bool("term0042 AND the", k=5)
    assert ls2.last_segments_skipped >= 0  # counter exists on bool path


def test_prune_handles_fewer_than_k_results(many_segments, spark):
    """k larger than the total match count: floor never forms; nothing
    may be skipped and results stay exhaustive-identical."""
    ls = LocalSearcher(many_segments)
    terms = ["term0042"]
    expected = ls.search(terms, "OR", 5000, algo="exhaustive")
    assert ls.search(terms, "OR", 5000, algo="auto") == expected
    s = IndexSearcher(spark, many_segments)
    got = [
        (r["doc_id"], r["score"])
        for r in s.search(
            terms, "OR", 5000, algo="auto", segment_prune=True
        ).collect()
    ]
    assert got == expected


def test_auto_gate_on_manifest_segment_count(spark, many_segments, tmp_path):
    """segment_prune=None auto-gates on the manifest's segment count:
    below SEGPRUNE_AUTO_MIN_SEGMENTS the probe machinery must not run
    (last_segments_skipped stays 0); at or above it, auto must attempt
    pruning and stay bit-identical to exhaustive."""
    s = IndexSearcher(spark, many_segments)  # ~38 segments < threshold
    assert s.manifest["metrics"]["n_segments"] < s.SEGPRUNE_AUTO_MIN_SEGMENTS
    s.search(["term0042", "the"], "OR", 10).collect()
    assert s.last_segments_skipped == 0

    out = str(tmp_path / "idx_many")
    build_index(
        spark,
        spark.createDataFrame(gen_pages_pdf(np.arange(600))),
        out,
        docs_per_part=4,
        seg_group=1,
        n_term_buckets=8,
    )
    s2 = IndexSearcher(spark, out)
    assert s2.manifest["metrics"]["n_segments"] >= s2.SEGPRUNE_AUTO_MIN_SEGMENTS
    terms = ["term0042", "the"]
    exp = [
        (r["doc_id"], r["score"])
        for r in s2.search(terms, "OR", 10, algo="exhaustive").collect()
    ]
    got = [(r["doc_id"], r["score"]) for r in s2.search(terms, "OR", 10).collect()]
    assert got == exp
    # term0042 is rare and segment-localized at 4 docs/segment — the
    # df-sized probe must establish a floor that skips stopword-only
    # segments
    assert s2.last_segments_skipped > 0
