"""delete_by_query (ES `_delete_by_query`): query-resolved tombstones
through the standard MVCC delete machinery.

Reference analog: ES document lifecycle driven through the client
(hail_scripts/shared/elasticsearch_client.py create/route/forcemerge);
the delete-then-merge semantics are Lucene's."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.plans.maintenance import (
    compact_index,
    delete_by_query,
)


@pytest.fixture()
def fresh_index(spark, tmp_path):
    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(200))
    out = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), out,
        docs_per_part=16, seg_group=2, n_term_buckets=8,
    )
    return out, pdf


def test_delete_by_term_query(spark, fresh_index):
    out, _pdf = fresh_index
    pre = LocalSearcher(out)
    victims = set(pre.matched_ids(["term0042"]).tolist())
    assert victims
    pre_hits = pre.search(["the"], mode="OR", k=500)
    m = delete_by_query(spark, out, ["term0042"], mode="OR")
    assert m["extensions"][-1]["docs_tombstoned"] == len(victims)
    # pinned searcher (older epoch) still serves the docs — MVCC
    assert pre.search(["the"], mode="OR", k=500) == pre_hits
    # fresh searchers see them gone, both engines
    s, L = IndexSearcher(spark, out), LocalSearcher(out)
    for ids in (
        {r.doc_id for r in s.matched_ids(["term0042"], "OR").collect()},
        set(L.matched_ids(["term0042"]).tolist()),
        {i for i, _sc in L.search(["the"], mode="OR", k=500)},
        {r.doc_id for r in s.search(["the"], "OR", 500).collect()},
    ):
        assert not ids & victims
    # counts and globals dropped
    assert L.search_count(["term0042"]) == 0
    assert m["globals"]["n_docs"] == pre.n_docs - len(victims)
    # idempotent: nothing live matches anymore
    m2 = delete_by_query(spark, out, ["term0042"], mode="OR")
    assert m2["extensions"][-1]["mode"] != "delete_by_query" or \
        m2["extensions"][-1]["docs_tombstoned"] == len(victims)  # unchanged


def test_delete_by_bool_range_query(spark, fresh_index):
    out, _pdf = fresh_index
    pre = LocalSearcher(out)
    victims = set(pre.matched_ids("the AND doc_len:[200 TO *]", "BOOL").tolist())
    assert victims
    delete_by_query(spark, out, "the AND doc_len:[200 TO *]")
    L = LocalSearcher(out)
    assert not set(L.matched_ids(None).tolist()) & victims
    # doc-value aggregations exclude the dead docs too
    st = L.search_field_stats("the", "doc_len", mode="BOOL")
    assert st["n_hits"] == 0 or st["max_v"] < 200 or not (
        set(L.matched_ids("the", "BOOL").tolist()) & victims
    )


def test_delete_none_raises(spark, fresh_index):
    out, _pdf = fresh_index
    with pytest.raises(ValueError, match="explicit rebuild"):
        delete_by_query(spark, out, None)


def test_compact_after_delete_equals_fresh_rebuild(spark, fresh_index, tmp_path):
    """After compaction strips the tombstoned postings, every surviving
    url scores bit-identically to an index built from only the
    surviving pages (df/avgdl/n_docs all converge to the rebuild's)."""
    from hail_elasticsearch_pipelines_spark import layout
    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index

    out, pdf = fresh_index
    pre = LocalSearcher(out)
    victims = set(pre.matched_ids(["term0042"]).tolist())
    delete_by_query(spark, out, ["term0042"], mode="OR")
    compact_index(spark, out, factor=1)
    L = LocalSearcher(out)
    # rebuild from the surviving pages only
    m = layout.load_manifest(out)
    dl = spark.read.parquet(layout.table_path(out, "doclens", m))
    live_urls = {r["url"] for r in dl.select("url", "doc_id").collect()
                 if r["doc_id"] not in victims}
    surv = pdf[pdf["url"].isin(live_urls)]
    out2 = str(tmp_path / "rebuilt")
    build_index(
        spark, spark.createDataFrame(surv), out2,
        docs_per_part=16, seg_group=2, n_term_buckets=8,
    )
    R = LocalSearcher(out2)
    assert L.n_docs == R.n_docs and L.avgdl == R.avgdl
    # per-url score parity (doc ids differ; urls are the stable key)
    def by_url(searcher, index_dir):
        mm = layout.load_manifest(index_dir)
        dd = spark.read.parquet(layout.table_path(index_dir, "doclens", mm))
        id2url = {r["doc_id"]: r["url"] for r in dd.select("doc_id", "url").collect()}
        return {
            id2url[d]: sc
            for d, sc in searcher.search(["the", "of"], mode="OR", k=10_000)
        }
    a, b = by_url(L, out), by_url(R, out2)
    assert a == b and a


def test_crash_after_dbq_publish_repairs_epoch_and_globals(
    spark, fresh_index, monkeypatch, tmp_path
):
    """ADVICE r5 (medium): delete_by_query crashing between the
    tombstone publish and the manifest save leaves e1- sidecars the
    manifest never recorded and globals never subtracted.  The intent
    marker must route the next maintenance op through repair, which
    advances deletes_epoch AND recomputes globals — then compaction
    strips the docs and everything equals a fresh rebuild of the
    survivors."""
    from hail_elasticsearch_pipelines_spark import layout
    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
    from hail_elasticsearch_pipelines_spark.plans import maintenance as mt

    out, pdf = fresh_index
    pre = LocalSearcher(out)
    victims = set(pre.matched_ids(["term0042"]).tolist())
    assert victims

    def crash(*a, **k):
        raise RuntimeError("simulated crash pre-manifest-save")

    monkeypatch.setattr(mt, "_save_manifest", crash)
    with pytest.raises(RuntimeError, match="pre-manifest"):
        mt.delete_by_query(spark, out, ["term0042"], mode="OR")
    monkeypatch.undo()

    # crash state: sidecars on disk at e1, manifest still at epoch 0,
    # globals unsubtracted, intent marker present
    stale = layout.load_manifest(out)
    assert int(stale.get("deletes_epoch", 0)) == 0
    assert stale["globals"]["n_docs"] == pre.n_docs
    assert mt._intent_markers(out)

    # next maintenance op repairs first, then compacts
    m = mt.compact_index(spark, out, factor=1)
    assert not mt._intent_markers(out)
    assert m["globals"]["n_docs"] == pre.n_docs - len(victims)

    # the deleted docs are really gone and scores match a fresh rebuild
    L = LocalSearcher(out)
    assert not L.matched_ids(["term0042"]).size
    live_urls = {
        r["url"]
        for r in spark.read.parquet(layout.table_path(out, "doclens"))
        .select("url")
        .collect()
    }
    surv = pdf[pdf["url"].isin(live_urls)]
    out2 = str(tmp_path / "rebuilt_after_crash")
    build_index(
        spark, spark.createDataFrame(surv), out2,
        docs_per_part=16, seg_group=2, n_term_buckets=8,
    )
    R = LocalSearcher(out2)
    assert L.n_docs == R.n_docs and L.avgdl == R.avgdl
    assert sorted(sc for _d, sc in L.search(["the"], mode="OR", k=10_000)) == \
        sorted(sc for _d, sc in R.search(["the"], mode="OR", k=10_000))


def test_update_by_query(spark, fresh_index):
    """ES _update_by_query (set-field script): facet retag driven by a
    query; scores unchanged, facet filters see the new value."""
    from hail_elasticsearch_pipelines_spark.plans.maintenance import (
        update_by_query,
    )

    out, _pdf = fresh_index
    pre = LocalSearcher(out)
    victims = set(pre.matched_ids("the AND doc_len:[250 TO *]", "BOOL").tolist())
    assert victims
    before = pre.search(["the"], mode="OR", k=500)
    m = update_by_query(
        spark, out, "the AND doc_len:[250 TO *]", "lang", "xx"
    )
    assert m["generation"] >= 1 or m  # manifest returned
    L = LocalSearcher(out)
    got = set(L.matched_ids("lang:xx AND the", "BOOL").tolist())
    assert got == victims
    # pure filter retag: BM25 scores unchanged
    assert L.search(["the"], mode="OR", k=500) == before
    with pytest.raises(ValueError, match="update_facet_field"):
        update_by_query(spark, out, None, "lang", "xx")


def test_index_and_segment_stats(spark, fresh_index):
    """_stats/_cat analogs: manifest facts + per-segment metadata scan;
    tombstones appear per segment after a delete."""
    out, _pdf = fresh_index
    s = IndexSearcher(spark, out)
    st = s.index_stats()
    assert st["n_docs"] == s.n_docs and st["avgdl"] == s.avgdl
    assert st["metrics"]["n_tombstones"] == 0
    seg = {r.segment: r for r in s.segment_stats().collect()}
    assert sum(r.n_terms for r in seg.values()) == s._postings.count()
    assert all(r.tombstones == 0 for r in seg.values())
    delete_by_query(spark, out, ["term0042"], mode="OR")
    s2 = IndexSearcher(spark, out)
    seg2 = {r.segment: r for r in s2.segment_stats().collect()}
    assert sum(r.tombstones for r in seg2.values()) == \
        s2.index_stats()["metrics"]["n_tombstones"] > 0
    # pinned old searcher still reports its epoch's (empty) tombstones
    assert all(r.tombstones == 0 for r in s.segment_stats().collect())


def test_expire_documents(spark, fresh_index):
    """ILM delete-phase analog: docs with warc_ts older than the cutoff
    vanish; the rest keep serving."""
    from hail_elasticsearch_pipelines_spark.plans.maintenance import (
        expire_documents,
    )

    out, _pdf = fresh_index
    pre = LocalSearcher(out)
    cutoff = "2025-01-15 00:00:00"
    old_ids = set(
        pre.matched_ids(f"the AND warc_ts:[* TO 2025-01-15T00:00:00}}", "BOOL").tolist()
    ) | set(
        pre.matched_ids("warc_ts:[* TO 2025-01-15T00:00:00} AND _exists_:warc_ts", "BOOL").tolist()
    )
    import numpy as np

    ids, vals = pre._docvalues("warc_ts")
    import pandas as pd

    expect = set(ids[vals < np.datetime64(pd.Timestamp(cutoff))].tolist())
    m = expire_documents(spark, out, "warc_ts", cutoff)
    assert m["extensions"][-1]["docs_tombstoned"] == len(expect) > 0
    L = LocalSearcher(out)
    assert not set(L.matched_ids(None).tolist()) & expect
    assert L.n_docs == pre.n_docs - len(expect)


def test_validate_query_and_analyze(spark, small_index):
    from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher

    s = IndexSearcher(spark, small_index[0])
    ok = s.validate_query("the AND (term0042 OR term0099) AND NOT of")
    assert ok["valid"] and ok["error"] is None and "term0042" in ok["explanation"]
    bad = s.validate_query("the AND lang:en AND nosuchfield:x")
    assert not bad["valid"] and "nosuchfield" in bad["error"]
    assert s.validate_query("the AND lang:en")["valid"]
    neg = s.validate_query("the AND (")
    assert not neg["valid"]
    toks = s.analyze("The quick-Brown FOX!")
    assert toks == [
        {"token": "the", "position": 0},
        {"token": "quick", "position": 1},
        {"token": "brown", "position": 2},
        {"token": "fox", "position": 3},
    ]
