"""Document update/delete: upsert_index tombstones re-crawled urls,
queries never return tombstoned docs, and compact_index physically
drops tombstoned postings restoring exact statistics (bit-identical to
a fresh build of the live corpus).

Reference analog: ES write ops update/upsert
(hail_scripts/shared/elasticsearch_utils.py:11-17,
hail_scripts/v02/utils/elasticsearch_client.py:106-113) + forcemerge."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.functions.extract import py_extract_text
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.oracle import OracleIndex
from hail_elasticsearch_pipelines_spark.plans.maintenance import (
    compact_index,
    extend_index,
    upsert_index,
)
from hail_elasticsearch_pipelines_spark.sources.corpus import (
    BASE_TS,
    _build_html,
    _doc_tokens,
    gen_pages_pdf,
)

RECRAWLED = np.arange(10, 30)
NEW = np.arange(120, 140)


def _recrawl_pdf(indices) -> pd.DataFrame:
    """Fresh crawl rows for existing urls: variant-1 content, newer ts."""
    rows = []
    for i in indices:
        i = int(i)
        url = f"https://site{i % 97}.example/cat{i % 11}/page-{i:08d}"
        toks = _doc_tokens(i, 1)
        html = _build_html(i, toks, "en")
        rows.append(
            (url, BASE_TS + dt.timedelta(days=365), html, py_extract_text(html), "en")
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _dedup(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("warc_ts").drop_duplicates("url", keep="last")
    return pdf.sort_values("url").reset_index(drop=True)


def _text(row) -> str:
    return row["text"] if row["text"] is not None else py_extract_text(row["html"])


@pytest.fixture(scope="module")
def upserted(spark, tmp_path_factory):
    """Index over docs 0..119, then UPSERTed with re-crawls of 10..29
    plus brand-new docs 120..139."""
    out = str(tmp_path_factory.mktemp("ups") / "idx")
    base = gen_pages_pdf(np.arange(120))
    batch = pd.concat(
        [_recrawl_pdf(RECRAWLED), gen_pages_pdf(NEW)], ignore_index=True
    )
    build_index(
        spark,
        spark.createDataFrame(base),
        out,
        docs_per_part=37,
        seg_group=2,
        n_term_buckets=8,
    )
    manifest = upsert_index(spark, out, spark.createDataFrame(batch))
    return out, manifest, base, batch


def _live_docs(base, batch, id_base):
    """Engine-id → live text after the upsert: base urls keep their
    url-order ids unless re-crawled (tombstoned); every batch url gets a
    fresh id id_base + url-rank."""
    base_pdf, batch_pdf = _dedup(base), _dedup(batch)
    batch_urls = set(batch_pdf["url"])
    docs, dead = {}, []
    for i, row in base_pdf.iterrows():
        if row["url"] in batch_urls:
            dead.append(i)
        else:
            docs[i] = _text(row)
    for j, row in batch_pdf.iterrows():
        docs[id_base + j] = _text(row)
    return docs, dead


def test_upsert_manifest_and_globals(upserted):
    out, manifest, base, batch = upserted
    ext = manifest["extensions"][0]
    assert ext["mode"] == "upsert"
    base_pdf, batch_pdf = _dedup(base), _dedup(batch)
    n_recrawled = len(set(base_pdf["url"]) & set(batch_pdf["url"]))
    assert ext["docs_tombstoned"] == n_recrawled == len(RECRAWLED)
    assert ext["docs_added"] == len(batch_pdf)
    docs, dead = _live_docs(base, batch, ext["id_base"])
    assert manifest["globals"]["n_docs"] == len(docs)
    # exact total_tokens: sum of live docs' token counts
    from hail_elasticsearch_pipelines_spark.functions.tokenize import py_tokenize

    assert manifest["globals"]["total_tokens"] == sum(
        len(py_tokenize(t)) for t in docs.values()
    )
    assert manifest["metrics"]["n_tombstones"] == n_recrawled


def test_upsert_old_docs_not_retrievable(spark, upserted):
    """Match SETS equal the live corpus for every query shape (scores may
    use stale df until compaction — the documented Lucene semantics)."""
    out, manifest, base, batch = upserted
    docs, dead = _live_docs(base, batch, manifest["extensions"][0]["id_base"])
    oracle = OracleIndex(docs)
    s = IndexSearcher(spark, out)
    ls = LocalSearcher(out)
    k = len(docs) + len(dead)
    for terms, mode, algo in [
        (["the"], "OR", "exhaustive"),
        (["the"], "OR", "bmw"),
        (["the", "of"], "AND", "exhaustive"),
    ]:
        expected_ids = sorted(d for d, _ in oracle.topk(terms, mode, k))
        got = sorted(r["doc_id"] for r in s.search(terms, mode, k, algo=algo).collect())
        assert got == expected_ids, (terms, mode, algo)
        got_local = sorted(d for d, _ in ls.search(terms, mode, k, algo=algo))
        assert got_local == expected_ids, (terms, mode, algo, "local")
    # boolean + phrase paths honor tombstones too
    got = sorted(r["doc_id"] for r in s.search_bool("the AND of", k=k).collect())
    assert got == sorted(d for d, _ in oracle.bool_topk("the AND of", k=k))
    got = sorted(r["doc_id"] for r in s.search_phrase(["the", "of"], k=k).collect())
    assert got == sorted(d for d, _ in oracle.phrase_topk(["the", "of"], k=k))


def test_upsert_new_content_searchable(spark, upserted):
    """The re-crawled content (variant-1 tokens) is what scores: tf of a
    probe term in a replaced doc matches the NEW text."""
    out, manifest, base, batch = upserted
    docs, _ = _live_docs(base, batch, manifest["extensions"][0]["id_base"])
    oracle = OracleIndex(docs)
    s = IndexSearcher(spark, out)
    # pick a term from a replaced doc's new text
    batch_pdf = _dedup(batch)
    probe_doc = manifest["extensions"][0]["id_base"]
    probe_terms = [
        t for t in oracle.doc_tokens[probe_doc] if not t.startswith("__")
    ][:1]
    got = {r["doc_id"] for r in s.search(probe_terms, "OR", len(docs)).collect()}
    assert probe_doc in got


def test_compact_drops_tombstones_exact_scores(spark, upserted):
    """After compaction, df/cf are exact again: results are rank- AND
    score-identical to the pure-Python oracle over the live corpus."""
    out, manifest, base, batch = upserted
    docs, dead = _live_docs(base, batch, manifest["extensions"][0]["id_base"])
    before_rows = manifest["metrics"]["posting_rows"]
    m2 = compact_index(spark, out, factor=2)
    assert m2["metrics"]["n_tombstones"] == 0
    assert m2["compactions"][-1]["tombstones_dropped"] == len(dead)
    import os

    from hail_elasticsearch_pipelines_spark.layout import table_path

    # the RESOLVED deletes pointer is empty (the old generation's dir
    # stays on disk for grace-period readers until the next op's GC)
    assert not os.path.exists(table_path(out, "deletes"))
    oracle = OracleIndex(docs)
    s = IndexSearcher(spark, out)
    s.reload_manifest()
    ls = LocalSearcher(out)
    for terms, mode in [(["the"], "OR"), (["term0042"], "OR"), (["the", "of"], "AND")]:
        expected = oracle.topk(terms, mode, 20)
        got = [
            (r["doc_id"], r["score"])
            for r in s.search(terms, mode, 20, algo="exhaustive").collect()
        ]
        assert got == expected, (terms, mode)
        if mode == "OR":
            got_bmw = [
                (r["doc_id"], r["score"])
                for r in s.search(terms, mode, 20, algo="bmw").collect()
            ]
            assert got_bmw == expected, (terms, mode, "bmw")
        assert ls.search(terms, mode, 20) == expected, (terms, mode, "local")
    # phrase scores exact too (df of the pseudo-term is live-only)
    expected = oracle.phrase_topk(["the", "of"], k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in s.search_phrase(["the", "of"], k=10).collect()
    ]
    assert got == expected
    # doclens no longer holds tombstoned rows
    from hail_elasticsearch_pipelines_spark.layout import table_path

    doclens = spark.read.parquet(table_path(out, "doclens"))
    assert doclens.count() == len(docs)
    assert m2["metrics"]["posting_rows"] <= before_rows


def test_create_after_upsert_skips_live_urls(spark, upserted):
    out, manifest, base, batch = upserted
    before = manifest["globals"]["n_docs"]
    m2 = extend_index(
        spark, out, IndexSearcher(spark, out).spark.createDataFrame(_dedup(batch)),
        mode="create",
    )
    assert m2["globals"]["n_docs"] == before  # every url already live


def test_incremental_termdict_matches_full_rebuild(spark, tmp_path):
    """extend_index's O(batch) termdict update produces the same table a
    full postings re-scan would."""
    from hail_elasticsearch_pipelines_spark.plans.pipeline import _write_termdict

    out = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(gen_pages_pdf(np.arange(100))),
        out,
        docs_per_part=37,
        seg_group=2,
        n_term_buckets=8,
    )
    extend_index(spark, out, spark.createDataFrame(gen_pages_pdf(np.arange(100, 160))))

    from hail_elasticsearch_pipelines_spark.layout import table_path

    def snapshot(path):
        return sorted(
            (r["term_bucket"], r["term"], r["df"], r["cf"], r["n_rows"])
            for r in spark.read.parquet(path).collect()
        )

    incremental = snapshot(table_path(out, "termdict"))
    rebuilt = str(tmp_path / "td_rebuild")
    _write_termdict(  # full rebuild from postings
        spark, out, postings_path=table_path(out, "postings"), dest_path=rebuilt
    )
    assert incremental == snapshot(rebuilt)


def test_upsert_publishes_tombstones_after_data(spark, tmp_path, monkeypatch):
    """Crash-ordering: if the upsert dies before its final publish step,
    the OLD docs must still be alive (no tombstones visible) — worst
    case is old+new duplication until retry, never data loss."""
    import os

    from hail_elasticsearch_pipelines_spark.plans import maintenance as mt

    out = str(tmp_path / "idx")
    base = gen_pages_pdf(np.arange(60))
    build_index(
        spark,
        spark.createDataFrame(base),
        out,
        docs_per_part=37,
        seg_group=2,
        n_term_buckets=8,
    )

    boom = RuntimeError("simulated crash before tombstone publish")

    def crash(*a, **k):
        raise boom

    monkeypatch.setattr(mt, "_publish_tombstones", crash)
    batch = _recrawl_pdf(np.arange(5, 15))
    with pytest.raises(RuntimeError, match="simulated crash"):
        upsert_index(spark, out, spark.createDataFrame(batch))
    # no tombstones visible; all original docs still alive
    assert not os.path.isdir(os.path.join(out, "deletes"))
    live = spark.read.parquet(os.path.join(out, "doclens"))
    assert live.select("doc_id").distinct().count() >= 60
    # retry completes and publishes
    monkeypatch.undo()
    m = upsert_index(spark, out, spark.createDataFrame(batch))
    assert os.path.isdir(os.path.join(out, "deletes"))
    # the crashed attempt's replacements were already live (duplication,
    # not loss) — the retry tombstones BOTH stale copies of each url
    assert m["extensions"][-1]["docs_tombstoned"] == 20
    # exactly one live doc per url after the retry
    from hail_elasticsearch_pipelines_spark.operators.bm25 import load_deletes

    dead = {int(i) for ids in load_deletes(out).values() for i in ids}
    live_pdf = (
        spark.read.parquet(os.path.join(out, "doclens"))
        .select("doc_id", "url")
        .toPandas()
    )
    live_urls = live_pdf[~live_pdf["doc_id"].isin(dead)]["url"]
    assert not live_urls.duplicated().any()
    # --- sidecar layout + per-segment reads agree with the full load
    deletes = os.path.join(out, "deletes")
    entries = os.listdir(deletes)
    assert entries and all(e.startswith("segment=") for e in entries)
    assert int(m.get("deletes_epoch", 0)) >= 1
    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        load_deletes,
        read_segment_deletes,
    )

    s = IndexSearcher(spark, out)
    assert not hasattr(s, "_deletes")  # nothing global rides in closures
    assert s._has_deletes is True
    fn = s._segment_deletes_fn()
    full = load_deletes(out)
    assert full
    for seg, ids in full.items():
        np.testing.assert_array_equal(fn(seg), ids)
        np.testing.assert_array_equal(
            read_segment_deletes(s._deletes_dir, seg, s._deletes_epoch), ids
        )
    assert fn(10**6) is None  # untombstoned segment reads as None
