"""Resume-after-kill semantics (north rule: resumable from per-partition
checkpoints with lineage + metrics).

Reference analog: Luigi `complete()` marker skips + `can_reuse`
(batch_seqr_loader/seqr_loader/utils.py:81-94) and per-unit
skip-or-schedule (batch_workflow.py:318-406)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.plans.pipeline import IndexBuildPipeline, can_reuse


def _snapshot(spark, d):
    rows = spark.read.parquet(f"{d}/postings").collect()
    return sorted((r["term"], r["segment"], r["df"], bytes(r["blob"])) for r in rows)


def test_resume_after_partial_kill(spark, small_pages_df, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, small_pages_df, out, docs_per_part=37, seg_group=2,
                n_term_buckets=8, n_chunks=3)
    full = _snapshot(spark, out)

    # simulate a kill: one partial chunk lost, publish marker lost
    shutil.rmtree(os.path.join(out, "stages", "partials", "chunk=1"))
    os.remove(os.path.join(out, "_INDEX_PUBLISHED"))

    # record mtimes of stages that must NOT be recomputed
    docs_marker = os.path.join(out, "stages", "docs", "_FINGERPRINT")
    chunk0_marker = os.path.join(out, "stages", "partials", "chunk=0", "_FINGERPRINT")
    m_docs, m_chunk0 = os.path.getmtime(docs_marker), os.path.getmtime(chunk0_marker)

    build_index(spark, small_pages_df, out, docs_per_part=37, seg_group=2,
                n_term_buckets=8, n_chunks=3)
    assert _snapshot(spark, out) == full, "resumed index differs from original"
    assert os.path.getmtime(docs_marker) == m_docs, "docs stage was recomputed"
    assert os.path.getmtime(chunk0_marker) == m_chunk0, "complete chunk was recomputed"


def test_fingerprint_invalidates_on_param_change(spark, small_pages_df, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, small_pages_df, out, docs_per_part=37, seg_group=2, n_term_buckets=8)
    norm = os.path.join(out, "stages", "normalize")
    pipe_same = IndexBuildPipeline(spark, out, docs_per_part=37, seg_group=2, n_term_buckets=8)
    pipe_diff = IndexBuildPipeline(spark, out, docs_per_part=37, seg_group=2,
                                   n_term_buckets=8, lang_filter=["en"])
    from hail_elasticsearch_pipelines_spark.plans.pipeline import _fingerprint

    # meta_cols for this corpus resolve to ("lang",) at run()
    assert can_reuse(norm, _fingerprint(["normalize", pipe_same.params_fp, ["lang"]]))
    assert not can_reuse(norm, _fingerprint(["normalize", pipe_diff.params_fp, ["lang"]]))


def test_lineage_metrics_written(spark, small_pages_df, tmp_path, small_oracle):
    oracle, _ = small_oracle
    out = str(tmp_path / "idx")
    manifest = build_index(spark, small_pages_df, out, docs_per_part=37,
                           seg_group=2, n_term_buckets=8, n_chunks=2)
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    rows = lineage.collect()
    assert {r["stage"] for r in rows} == {"partial_index"}
    assert sum(r["docs_indexed"] for r in rows) == oracle.n_docs
    assert sum(r["postings_emitted"] for r in rows) == manifest["metrics"]["postings_emitted"]
    assert all(r["bytes_compressed"] > 0 for r in rows)
    # per-partition lineage: one row per doc-range part
    assert len({r["partition_id"] for r in rows}) == len(rows)


def test_fused_normalize_build_identical(spark, small_pages_df, tmp_path):
    """checkpoint_normalize=False (fused normalize+docs, the reference's
    opt-in --make-checkpoints analog) writes the corpus once and yields
    a byte-identical index."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, small_pages_df, a, docs_per_part=37, seg_group=2, n_term_buckets=8)
    build_index(spark, small_pages_df, b, docs_per_part=37, seg_group=2,
                n_term_buckets=8, checkpoint_normalize=False)
    assert _snapshot(spark, a) == _snapshot(spark, b)
    assert os.path.exists(os.path.join(a, "stages", "normalize"))
    assert not os.path.exists(os.path.join(b, "stages", "normalize"))
    # fused builds still resume: docs marker + chunk markers exist
    assert os.path.exists(os.path.join(b, "stages", "docs", "_FINGERPRINT"))
